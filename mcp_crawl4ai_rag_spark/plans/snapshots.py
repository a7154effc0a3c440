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

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a snapshot (latest, or time travel to ``version``)."""
        if version is None:
            info = self.current()
            if info is None:
                raise FileNotFoundError(f"no snapshot in {self.dir}")
            m = self._manifest(info.version)
        else:
            m = self._manifest(version)
        reader = spark.read
        # explicit schema: lets empty snapshots (no data files) read back
        if m.get("schema"):
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        return reader.parquet(*m["paths"])

    def commit(
        self,
        df: DataFrame,
        expected_version: int | None = None,
        partition_by: list[str] | None = None,
        extra: dict | None = None,
        mode: str = "overwrite",
    ) -> SnapshotInfo:
        """Write df as the next version; atomic manifest swap.

        - ``mode='overwrite'``: new snapshot = just the new data dir.
        - ``mode='append'``: Iceberg-style fast append — write ONLY the new
          rows; the new manifest lists previous data dirs + the new one (no
          rewrite of existing data).
        - ``expected_version`` enables optimistic concurrency (None = don't
          care).
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
            paths = list(cur.paths) + [path]
        else:
            paths = [path]
        manifest = {
            "version": new_v,
            "paths": paths,
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

    def expire_snapshots(self, keep: int = 3) -> None:
        """Drop data dirs not referenced by the last ``keep`` manifests."""
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
            if entry.startswith("d") and entry[1:].isdigit() and full not in live:
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

    def save_filter(self, round_id: int, blob: bytes) -> str:
        p = os.path.join(self.dir, f"seen_filter_r{round_id}.bin")
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p)
        return p
