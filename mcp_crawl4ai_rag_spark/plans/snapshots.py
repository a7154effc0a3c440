"""Versioned snapshot tables + crawl checkpoints.

Production target is Apache Iceberg (snapshot isolation, MERGE INTO,
partition-level rewrites). The Iceberg runtime jar isn't available in this
sandbox, so this module implements the same *semantics* on plain parquet:

- every commit writes a new immutable version directory ``v{n}`` and then
  atomically renames a manifest JSON into place (POSIX rename = the atomic
  pointer swap Iceberg does in its catalog);
- readers always see a complete snapshot (read the manifest, read that
  version) — crash mid-write leaves the previous version current;
- time travel / resume = read any retained version;
- optimistic concurrency: commit carries the expected parent version and
  fails on mismatch (Iceberg's snapshot-conditional commit, replacing the
  reference's advisory locks, operations.py:63,130).

The checkpoint manifest additionally pins the bloom/cuckoo filter state
file and per-round metrics so a crawl resumes bit-for-bit (north rule).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    pass


@dataclass
class SnapshotInfo:
    version: int
    paths: list
    extra: dict


class SnapshotTable:
    """A named, versioned parquet table rooted at ``base/name``."""

    def __init__(self, base: str, name: str):
        self.dir = os.path.join(base, name)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "MANIFEST.json")

    def current(self) -> SnapshotInfo | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            m = json.load(f)
        return SnapshotInfo(m["version"], m["paths"], m.get("extra", {}))

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.dir, f"m{version}.json")) as f:
            return json.load(f)

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        partitions: list | None = None,
    ) -> DataFrame:
        """Read a snapshot (latest, or time travel to ``version``).

        ``partitions`` (partitioned snapshots only) restricts the scan to
        those partition values — true partition pruning: unlisted partition
        directories are never touched.
        """
        if version is None:
            info = self.current()
            if info is None:
                raise FileNotFoundError(f"no snapshot in {self.dir}")
            m = self._manifest(info.version)
        else:
            m = self._manifest(version)
        if m.get("part_col"):
            return self._read_partitioned(spark, m, partitions)
        reader = spark.read
        # explicit schema: lets empty snapshots (no data files) read back
        if m.get("schema"):
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        return reader.parquet(*m["paths"])

    def _read_partitioned(
        self, spark: SparkSession, m: dict, partitions: list | None
    ) -> DataFrame:
        """Union of per-partition scans, each re-tagged with its partition
        value (data files are written via partitionBy, so they do not carry
        the partition column). The manifest's partition→path map IS the
        pruning index — Iceberg's manifest-level partition pruning on plain
        parquet."""
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(m["schema"]))
        part_col = m["part_col"]
        cols = [f.name for f in schema]
        wanted = (
            {str(v) for v in partitions} if partitions is not None else None
        )
        # group selected partition dirs by their version dir: one scan per
        # version dir (basePath partition discovery re-derives the partition
        # column from the bucket=K dir names) instead of an N-way union —
        # after seed/compaction this is a single scan
        groups: dict = {}
        for val, path in sorted(m["partitions"].items()):
            if wanted is not None and val not in wanted:
                continue
            groups.setdefault(os.path.dirname(path), []).append(path)
        pieces = []
        for base, paths in sorted(groups.items()):
            pieces.append(
                spark.read.schema(schema)
                .option("basePath", base)
                .parquet(*paths)
                .select(*cols)
            )
        if not pieces:
            return spark.createDataFrame([], schema)
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def commit(
        self,
        df: DataFrame,
        expected_version: int | None = None,
        partition_by: list[str] | None = None,
        extra: dict | None = None,
        mode: str = "overwrite",
        parent_version: int | None = None,
    ) -> SnapshotInfo:
        """Write df as the next version; atomic manifest swap.

        - ``mode='overwrite'``: new snapshot = just the new data dir.
        - ``mode='append'``: Iceberg-style fast append — write ONLY the new
          rows; the new manifest lists previous data dirs + the new one (no
          rewrite of existing data).
        - ``expected_version`` enables optimistic concurrency (None = don't
          care).
        - ``parent_version`` (append mode): extend THAT version's file list
          instead of the current manifest's. A committer holding pinned
          versions (the crawl engine after a resume) passes its pin so
          orphan versions from a torn round — committed but never
          checkpointed — drop out of the lineage instead of being silently
          resurrected by the next append. Version numbers stay monotonic
          (always current+1).
        - ``partition_by`` materializes partition pruning for readers.
        """
        cur = self.current()
        cur_v = cur.version if cur else 0
        if expected_version is not None and cur_v != expected_version:
            raise CommitConflict(
                f"{self.dir}: expected v{expected_version}, found v{cur_v}"
            )
        new_v = cur_v + 1
        path = os.path.join(self.dir, f"d{new_v}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        if mode == "append" and cur is not None:
            parent_m = self._manifest(
                parent_version if parent_version is not None else cur.version
            )
            paths = list(parent_m["paths"]) + [path]
            folded = parent_m.get("folded", 1)
        else:
            paths = [path]
            folded = 1
        manifest = {
            "version": new_v,
            "paths": paths,
            "folded": folded,
            "schema": df.schema.json(),
            "committed_at": time.time(),
            "extra": extra or {},
        }
        mpath = os.path.join(self.dir, f"m{new_v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self.manifest_path + f".tmp.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap
        return SnapshotInfo(new_v, paths, extra or {})

    def compact_tail(
        self,
        spark: SparkSession,
        min_tail: int = 2,
        max_base: int = 8,
        target_files: int = 1,
        parent_version: int | None = None,
    ) -> SnapshotInfo | None:
        """Bin-pack trailing fast-append files — Iceberg's
        ``rewrite_data_files`` (bin-pack strategy) on plain parquet.

        A fast-append lineage adds one small data dir per commit, so every
        reader opens O(commits) files; on the crawl's append-only tables
        (fetched, documents, link edges, metrics) that is one file per
        round, read back each round by the seen-side union — the file-count
        drift measured in BENCH/BASELINE.md's 200k-page run. This folds
        ONLY the dirs appended since the last fold (the tail) into
        ``target_files`` coalesced files: amortized O(tail rows), never a
        full-table rewrite. The manifest's ``folded`` counter marks how
        many leading paths are fold outputs; appends carry it forward.

        Geometric escalation (LSM-style): when the folded prefix itself
        reaches ``max_base`` dirs, the whole lineage is folded once —
        total rewrite work stays O(N · log N / min_tail) over the table's
        life and the live file count stays bounded at
        ``max_base + compact-interval`` dirs regardless of round count.

        Content-preserving (same row multiset ⇒ resume/time-travel
        semantics hold); returns None (no new version) when the tail is
        shorter than ``min_tail``. ``parent_version`` pins the lineage to
        fold, like ``commit`` — orphan commits from a torn round stay out.
        ``target_files`` sizes the fold output; at cluster scale derive it
        from tail bytes / target file size rather than the default 1.
        """
        from pyspark.sql.types import StructType

        cur = self.current()
        if cur is None:
            return None
        cur_v = cur.version
        m = self._manifest(parent_version if parent_version is not None else cur_v)
        if m.get("part_col"):
            # A partitioned (commit_partitioned) lineage stores the partition
            # column only in directory names; reading its subdirs without
            # basePath would null the column and a flat rewrite would drop
            # the partition map — refuse instead of silently corrupting.
            raise ValueError(
                f"{self.dir}: compact_tail does not support partitioned "
                f"manifests (part_col={m['part_col']!r}); partitioned tables "
                "are rewritten whole by commit_partitioned"
            )
        paths = list(m["paths"])
        folded = m.get("folded", 1)
        full = folded >= max_base
        tail = paths[folded:]
        if (not full and len(tail) < min_tail) or len(paths) <= 1:
            return None
        read_paths = paths if full else tail
        schema = StructType.fromJson(json.loads(m["schema"]))
        df = spark.read.schema(schema).parquet(*read_paths).coalesce(target_files)
        new_v = cur_v + 1
        path = os.path.join(self.dir, f"d{new_v}")
        df.write.mode("overwrite").parquet(path)
        new_paths = [path] if full else paths[:folded] + [path]
        manifest = {
            "version": new_v,
            "paths": new_paths,
            "folded": 1 if full else folded + 1,
            "schema": m["schema"],
            "committed_at": time.time(),
            "extra": {
                "compacted": "full" if full else "tail",
                "folded_dirs": len(read_paths),
            },
        }
        mpath = os.path.join(self.dir, f"m{new_v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self.manifest_path + f".tmp.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap
        return SnapshotInfo(new_v, new_paths, manifest["extra"])

    def commit_rows(
        self,
        rows: list,
        schema,
        expected_version: int | None = None,
        extra: dict | None = None,
        mode: str = "overwrite",
        parent_version: int | None = None,
    ) -> SnapshotInfo:
        """Driver-rows fast path: commit a small driver-local row list
        (per-round metrics, lineage rows) as the next version WITHOUT a
        Spark job — pyarrow writes the parquet file directly, then the same
        atomic manifest swap as commit(). Readback is unchanged: the
        manifest carries the equivalent Spark schema and spark.read.parquet
        sees identical types (int→INT32, long→INT64, ...).

        Use only for O(driver-memory) side tables — a crawl round's metric
        rows are O(hosts + constants) by construction; data tables keep the
        distributed writers. Cuts one full Spark job (~0.3-0.5 s of driver
        scheduling latency) per round per table at any scale, since these
        rows never live on executors in the first place.

        schema: a pyspark StructType, or a simple DDL string
        ("round int, scope string, key string, value long").
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        _DDL = {
            "int": IntegerType(),
            "integer": IntegerType(),
            "long": LongType(),
            "bigint": LongType(),
            "string": StringType(),
            "double": DoubleType(),
            "float": FloatType(),
            "boolean": BooleanType(),
        }
        _PA = {
            "integer": pa.int32(),
            "long": pa.int64(),
            "string": pa.string(),
            "double": pa.float64(),
            "float": pa.float32(),
            "boolean": pa.bool_(),
        }
        if isinstance(schema, str):
            fields = []
            for part in schema.split(","):
                name, typ = part.strip().rsplit(" ", 1)
                if typ.lower() not in _DDL:
                    raise ValueError(f"commit_rows: unsupported DDL type {typ!r}")
                fields.append(StructField(name.strip(), _DDL[typ.lower()]))
            struct = StructType(fields)
        else:
            struct = schema
        try:
            pa_fields = [
                pa.field(f.name, _PA[f.dataType.typeName()]) for f in struct.fields
            ]
        except KeyError as e:  # nested/complex types stay on the Spark path
            raise ValueError(f"commit_rows: unsupported type {e}") from None
        pa_schema = pa.schema(pa_fields)
        cols = list(zip(*rows)) if rows else [[] for _ in pa_fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, pa_fields)],
            schema=pa_schema,
        )

        cur = self.current()
        cur_v = cur.version if cur else 0
        if expected_version is not None and cur_v != expected_version:
            raise CommitConflict(
                f"{self.dir}: expected v{expected_version}, found v{cur_v}"
            )
        new_v = cur_v + 1
        path = os.path.join(self.dir, f"d{new_v}")
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))
        if mode == "append" and cur is not None:
            parent_m = self._manifest(
                parent_version if parent_version is not None else cur.version
            )
            paths = list(parent_m["paths"]) + [path]
            folded = parent_m.get("folded", 1)
        else:
            paths = [path]
            folded = 1
        manifest = {
            "version": new_v,
            "paths": paths,
            "folded": folded,
            "schema": struct.json(),
            "committed_at": time.time(),
            "extra": extra or {},
        }
        mpath = os.path.join(self.dir, f"m{new_v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self.manifest_path + f".tmp.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap
        return SnapshotInfo(new_v, paths, extra or {})

    def commit_partitioned(
        self,
        df: DataFrame,
        part_col: str,
        changed: list | None = None,
        expected_version: int | None = None,
        extra: dict | None = None,
    ) -> SnapshotInfo:
        """Partition-level MERGE commit (the Iceberg replace-partitions op).

        ``df`` must contain ONLY the rows of the ``changed`` partitions
        (``changed=None`` = full rewrite, e.g. the initial commit). The new
        manifest maps every partition value to a data directory: unchanged
        partitions keep their previous directories (zero I/O), changed ones
        point into the new version directory. A changed partition with no
        surviving rows disappears from the map. Per-commit write cost is
        O(changed rows), never O(table).
        """
        cur = self.current()
        cur_v = cur.version if cur else 0
        if expected_version is not None and cur_v != expected_version:
            raise CommitConflict(
                f"{self.dir}: expected v{expected_version}, found v{cur_v}"
            )
        new_v = cur_v + 1
        path = os.path.join(self.dir, f"d{new_v}")
        df.write.mode("overwrite").partitionBy(part_col).parquet(path)
        written = {
            entry.split("=", 1)[1]: os.path.join(path, entry)
            for entry in os.listdir(path)
            if entry.startswith(f"{part_col}=")
        }
        old_parts: dict = {}
        if cur is not None and changed is not None:
            old_m = self._manifest(cur.version)
            if old_m.get("part_col") == part_col:
                changed_strs = {str(v) for v in changed}
                old_parts = {
                    k: v
                    for k, v in old_m["partitions"].items()
                    if k not in changed_strs
                }
        partitions = {**old_parts, **written}
        manifest = {
            "version": new_v,
            "paths": sorted(partitions.values()),
            "part_col": part_col,
            "partitions": partitions,
            "schema": df.schema.json(),
            "committed_at": time.time(),
            # per-partition lineage: which partitions this commit rewrote
            # (the partitions map itself records each partition's data dir,
            # i.e. the version that last produced it)
            "extra": {
                **(extra or {}),
                "changed": sorted(str(v) for v in changed)
                if changed is not None
                else "all",
            },
        }
        mpath = os.path.join(self.dir, f"m{new_v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self.manifest_path + f".tmp.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic pointer swap
        return SnapshotInfo(new_v, manifest["paths"], extra or {})

    def expire_snapshots(self, keep: int = 3) -> None:
        """Drop data dirs not referenced by the last ``keep`` manifests.

        Partitioned manifests reference *subdirectories* of version dirs
        (``d{v}/bucket=K``); a version dir survives while any live path
        points into it."""
        cur = self.current()
        if cur is None:
            return
        live: set[str] = set()
        for v in range(max(1, cur.version - keep + 1), cur.version + 1):
            mp = os.path.join(self.dir, f"m{v}.json")
            if os.path.exists(mp):
                live.update(self._manifest(v)["paths"])
        for entry in os.listdir(self.dir):
            full = os.path.join(self.dir, entry)
            if not (entry.startswith("d") and entry[1:].isdigit()):
                continue
            if full in live:
                continue
            if any(p.startswith(full + os.sep) for p in live):
                # version dir partially live: GC just its dead partition
                # subdirs (a bucket superseded by a later rewrite)
                for sub in os.listdir(full):
                    subfull = os.path.join(full, sub)
                    if "=" in sub and os.path.isdir(subfull) and subfull not in live:
                        shutil.rmtree(subfull, ignore_errors=True)
                continue
            shutil.rmtree(full, ignore_errors=True)


class CrawlCheckpoint:
    """Atomic crawl-state pointer: round id, per-table snapshot versions,
    seen-filter state file, sequence counters, cumulative metrics."""

    def __init__(self, base: str):
        self.dir = base
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "CHECKPOINT.json")

    def load(self) -> dict | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)

    def save(self, state: dict) -> None:
        tmp = self.path + f".tmp.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, self.path)

    def save_filter(self, round_id: int, blob: bytes, kind: str = "seen_filter") -> str:
        p = os.path.join(self.dir, f"{kind}_r{round_id}.bin")
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p)
        return p

    def prune_filters(self, current_round: int, keep: int = 2) -> None:
        """Drop filter state files older than ``current_round - keep + 1``.

        The checkpoint pointer pins the current round's file; older ones are
        unreachable once ``save()`` swaps the pointer, and at bloom_bits/8
        bytes each they would otherwise accumulate O(rounds) disk.
        """
        import re

        pat = re.compile(r"^[a-z_]+_r(\d+)\.bin$")
        for entry in os.listdir(self.dir):
            m = pat.match(entry)
            if m and int(m.group(1)) <= current_round - keep:
                try:
                    os.remove(os.path.join(self.dir, entry))
                except OSError:
                    pass


def snapshot_diff(
    spark: SparkSession,
    table: SnapshotTable,
    v_old: int,
    v_new: int,
) -> DataFrame:
    """Time-travel diff between two committed versions of a snapshot
    table: full-row set difference tagged ``change ∈ {added, removed}``
    (multiset semantics via exceptAll, so duplicate-row cardinality
    changes surface too). The audit view the north rule's per-partition
    lineage implies — "what did round N's commit change" — without any
    engine bookkeeping beyond the versioned manifests that already exist.

    One shuffle per direction on the full row (uniform — hash of all
    columns); at scale restrict to a partition slice first via
    ``table.read(spark, version, partitions=[...])``.
    """
    old, new = table.read(spark, v_old), table.read(spark, v_new)
    added = new.exceptAll(old).withColumn("change", F.lit("added"))
    removed = old.exceptAll(new).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)
