"""The BFS-round crawl engine — frontier scheduler + fetch + link pipeline.

One ``round()`` is one Spark job chain re-expressing the reference's
asyncio worker-pool loop (src/crawler/core.py:224-449; SURVEY.md §3.1):

  pop (budgeted window rank, W1)
  → fetch join (J5; sandbox stand-in for the HTTP fetch S10 — pushdown
    filter on the corpus scan + broadcast join back)
  → span cleaning (P6) + render
  → error split (P4: dead / retry / fetched)
  → link explode (P5) → canonicalize (P1) → malformed filter (P2)
  → robots filter (J6, generalizing the scope filter P3)
  → bloom-prefiltered anti-join dedup (J3 / S2)
  → snapshot commits: documents fast-append, frontier rewrite (stand-in
    for Iceberg MERGE), hosts charge, metrics append, checkpoint.

Determinism contract (matched bit-for-bit by oracle/simulator.py):
frontier order is (priority DESC, discovered_seq ASC); new URLs get
discovered_seq by first occurrence in (pop_rank, link_pos) order.

Scale notes (10^10 frontier / 1000 executors):
- the pop shuffles pending rows by host once; hot hosts are budget-bounded
  so the global top-k after the window is tiny (TakeOrderedAndProject);
- the fetch stage repartitions the popped batch by (host, salt) —
  ``salt = xxhash64(url) % salt_buckets`` — so one hot host spreads over
  many tasks while politeness accounting stays at host granularity
  (tokens are charged from per-host counts, not per-task);
- the seen-set anti-join shuffles only bloom-HIT candidates; at a 1%
  bloom FP rate, 99% of genuinely-new URLs skip the shuffle;
- the pending frontier is merge-on-read (Iceberg v2 shape): a host-bucket-
  partitioned base + an append-only add/del delta; per-round commits are
  O(batch) equality-deletes + appends, the base is rewritten only by the
  amortized compaction every ``compact_every`` rounds;
  documents/metrics/fetched use true fast-appends (new files only);
- everything driver-side is O(batch) or O(bitmap), never O(frontier).

In production the fetch join becomes a ``mapInPandas`` partition fetcher
with per-partition browser/session reuse (apple_stealth_crawler.py:16-21);
the surrounding plan is unchanged.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.markdown import clean_spans, render_spans_text
from mcp_crawl4ai_rag_spark.functions.urls import (
    canonicalize_url,
    is_malformed,
    is_permanent_error,
)
from mcp_crawl4ai_rag_spark.operators.dedup import (
    BloomFilter,
    ShardedCuckoo,
    build_bloom,
    build_bloom_with_count,
    maintain_sharded_cuckoo,
    new_urls,
)
from mcp_crawl4ai_rag_spark.operators.ranking import with_global_rank
from mcp_crawl4ai_rag_spark.operators.politeness import (
    budgeted_pop,
    charge_hosts,
    init_hosts,
    refill_hosts,
    build_robots_rules,
    compile_robots_predicate,
    robots_allowed,
    with_host_and_path,
)
from mcp_crawl4ai_rag_spark.plans.snapshots import CrawlCheckpoint, SnapshotTable

FETCH_RESULT_FIELDS = (
    "status_code int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "out_links array<string>, fetch_session string, fetch_error string"
)


def fetch_with_partition_sessions(
    batch: DataFrame, fetcher_factory, max_retries: int = 2
) -> DataFrame:
    """S10 production fetch operator: a ``mapInPandas`` partition fetcher
    with per-partition session reuse — the Spark shape of the reference's
    ``crawl_pages_batch`` worker pool with one browser context per worker
    (apple_stealth_crawler.py:16-21, 266-320).

    ``fetcher_factory()`` is invoked lazily ONCE per non-empty partition and
    must return a session with ``fetch_batch(urls) -> list[tuple]`` and
    ``close()``. Each result tuple is ``(status_code, spans, out_links)``
    or ``(status_code, spans, out_links, error_class)`` with spans = list
    of {kind, text, media_ref, offset} dicts. ``error_class`` mirrors the
    reference's in-worker retry taxonomy (apple_stealth_crawler.py:286-311):

    - ``None``/``''`` — success; emitted as-is.
    - ``'transient'`` — a per-page failure (timeout, temporary error): the
      SAME session retries the url, up to ``max_retries`` in-partition
      attempts (the reference's "临时错误: 归还实例, 直接重试" branch).
    - ``'session'`` — the session itself is broken ('connection closed',
      'pipe closed', 'browsercontext.new_page'): the session is closed and
      a FRESH ``fetcher_factory()`` instance retries (the reference's
      recreate-instance branch). Subsequent rows use the new session.

    Rows still failing after ``max_retries`` are emitted with their final
    (status_code, error_class) and whatever spans/links came back — the
    engine's P4/attempt routing then treats them like any failed fetch
    (empty content → re-queued with attempts+1 until ``max_attempts``).

    The session's ``id`` tags every output row (``fetch_session``) so tests
    can assert per-partition reuse AND recreation-on-session-error; the
    engine drops fetch_session/fetch_error after the fetch stage.

    The input should already be repartitioned by (host, salt) — politeness
    stays at host granularity while hot hosts spread across tasks.
    """
    from pyspark.sql.types import StructType

    result_fields = StructType.fromDDL(FETCH_RESULT_FIELDS).fields
    out_schema = StructType(list(batch.schema.fields) + list(result_fields))

    def run(batches):
        import pandas as pd  # noqa: F401  (worker-side)

        session = None

        def fetch_with_retries(urls):
            """Returns (results, session) — one normalized 4-tuple per url,
            retrying transient rows on the live session and session-class
            rows on a recreated one."""
            nonlocal session
            if session is None:
                session = fetcher_factory()
            results = [None] * len(urls)
            todo = list(range(len(urls)))
            for attempt in range(max_retries + 1):
                res = session.fetch_batch([urls[i] for i in todo])
                failed = []
                session_broken = False
                sid = getattr(session, "id", "")
                for i, r in zip(todo, res):
                    err = r[3] if len(r) > 3 else None
                    results[i] = (r[0], r[1], r[2], err or "", sid)
                    if err == "session":
                        # a broken session must not survive into later rows/
                        # batches even when this row's retry budget is spent
                        # (with max_retries=0 the dead session would
                        # otherwise serve — and fail — every remaining row)
                        session_broken = True
                    if err and attempt < max_retries:
                        failed.append(i)
                if session_broken:
                    # reference: permanent (session) error → destroy the
                    # instance, recreate, retry on the fresh one
                    if hasattr(session, "close"):
                        session.close()
                    session = fetcher_factory()
                if not failed:
                    break
                todo = failed
            return results

        try:
            for b in batches:
                if len(b) == 0:
                    continue
                res = fetch_with_retries(list(b["url"]))
                b = b.copy()
                b["status_code"] = [r[0] for r in res]
                b["spans"] = [r[1] for r in res]
                b["out_links"] = [r[2] for r in res]
                # per-row: a mid-batch session recreation tags each row with
                # the session that actually served it
                b["fetch_session"] = [r[4] for r in res]
                b["fetch_error"] = [r[3] for r in res]
                yield b
        finally:
            if session is not None and hasattr(session, "close"):
                session.close()

    return batch.mapInPandas(run, out_schema)


FRONTIER_COLS = ["url", "url_hash", "host", "depth", "priority", "seq", "state", "attempts"]
# the pending table additionally carries its partition column: bucket =
# pmod(xxhash64(host), host_buckets). Bucketing by host (not url) keeps a
# host's rows in one partition so host-scoped maintenance (recrawl, purge)
# prunes to 1/N of the table; hot hosts stay safe because the pop itself
# salt-spreads them (budgeted_pop).
FRONTIER_COLS_PENDING = FRONTIER_COLS + ["bucket"]

# Equality-delete key for the merge-on-read pending frontier. priority is
# part of the key so a reprioritized row (same url/seq/attempts, new
# priority) is not killed by its own delete; seq is never reused, so a dead
# URL re-discovered later (attempts restart at 0) cannot collide either.
# SHARED between the batch engine and streaming/continuous — one definition
# so the two views cannot drift.
PENDING_DELETE_KEY = ["url", "seq", "attempts", "priority"]


def merge_on_read_pending(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge-on-read view of the pending frontier: base ∪ delta-adds, minus
    equality deletes on PENDING_DELETE_KEY. The delete set is bounded by
    compact_every × batch rows → broadcast anti-join, no shuffle of the
    base. Used by CrawlEngine._read_pending and the streaming ingest's
    _pending_view — identical semantics by construction."""
    adds = delta.where(F.col("op") == "add").drop("op")
    dels = delta.where(F.col("op") == "del").select(*PENDING_DELETE_KEY)
    return base.unionByName(adds).join(
        F.broadcast(dels), PENDING_DELETE_KEY, "left_anti"
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        robots: DataFrame,
        hosts: DataFrame,
        workdir: str,
        batch_size: int = 20,
        max_attempts: int | None = 3,
        use_bloom: bool = True,
        use_cuckoo: bool = False,
        bloom_bits: int = 1 << 20,
        salt_buckets: int = 8,
        fetch_partitions: int | None = None,
        snapshot_keep: int = 8,
        host_buckets: int = 16,
        compact_every: int = 8,
        fetcher=None,
        rank_window_threshold: int = 10_000,
        probe_broadcast_threshold: int = 1_000_000,
        track_link_graph: bool = False,
    ):
        self.spark = spark
        self.corpus = corpus
        self.robots = robots
        # static rules table: aggregate + regex-translate once, cache —
        # every round's robots join reads this instead of re-shuffling.
        # Small tables additionally compile ONCE to a literal codegen
        # predicate (no per-round join, no interpreted rule fold); a
        # too-large table leaves _robots_pred None and every round takes
        # the join+fold path with no re-probing.
        self._robots_rules = build_robots_rules(robots).cache()
        self._robots_pred = compile_robots_predicate(self._robots_rules)
        self.batch_size = batch_size
        self.max_attempts = max_attempts
        self.use_bloom = use_bloom
        self.use_cuckoo = use_cuckoo
        self.bloom_bits = bloom_bits
        self.salt_buckets = salt_buckets
        self.fetch_partitions = fetch_partitions
        self.snapshot_keep = snapshot_keep
        self.host_buckets = host_buckets
        self.compact_every = compact_every
        # S10 seam: None → sandbox corpus broadcast join; a factory →
        # fetch_with_partition_sessions (the production HTTP/browser shape)
        self.fetcher = fetcher
        # batches at or below this use the bounded window for link-seq
        # assignment; above it, the two-stage distributed rank
        self.rank_window_threshold = rank_window_threshold
        # seen sets at or below this (upper-bounded by seq_counter, the
        # total URLs ever admitted) use the plain anti-join for URL-seen
        # dedup (one job wave; Spark may auto-broadcast the small seen
        # side); above it, the probe-broadcast shape that never shuffles
        # or driver-broadcasts the frontier (new_urls docstring). Same
        # size-aware-dispatch design as rank_window_threshold; both paths
        # are output-identical (tests/test_crawl_e2e.py pins bit-for-bit
        # equality with the threshold forced to 0).
        self.probe_broadcast_threshold = probe_broadcast_threshold

        # Frontier layout (the Iceberg v2 merge-on-read design at 10^10
        # scale): `pending` = host-bucket-partitioned BASE (rewritten only
        # at compaction) + flat append-only DELTA of 'add'/'del' rows;
        # `fetched` is append-only. A 'del' is an equality delete on
        # (url, seq, attempts): seq is assigned once per insertion and never
        # reused (a re-discovered dead URL gets a fresh seq) and attempts is
        # monotone within a lineage (a retry re-appends at attempts+1), so a
        # delete record can never collide with a later live row version.
        # Per-round write cost is O(batch); compaction every
        # ``compact_every`` rounds folds the delta into the base
        # (amortized O(pending / compact_every) per round, and bounds the
        # read-side anti-join to compact_every × batch delete rows).
        self.pending_tbl = SnapshotTable(workdir, "frontier_pending")
        self.pending_delta_tbl = SnapshotTable(workdir, "frontier_pending_delta")
        self.fetched_tbl = SnapshotTable(workdir, "frontier_fetched")
        self.documents_tbl = SnapshotTable(workdir, "documents")
        self.hosts_tbl = SnapshotTable(workdir, "hosts")
        self.metrics_tbl = SnapshotTable(workdir, "metrics")
        # opt-in accumulated (src, dst) edge list of fetched pages — the
        # input to the PageRank -> reprioritize() adaptive-scheduling
        # policy (run(reprioritize_every=k)); costs one distinct + append
        # per round, so off by default
        self.track_link_graph = track_link_graph
        self.edges_tbl = SnapshotTable(workdir, "link_edges")
        self.checkpoint = CrawlCheckpoint(workdir)
        self._hosts_init = hosts

        self.round_id = 0
        self.seq_counter = 0
        self.versions: dict[str, int] = {}
        self._pool: ThreadPoolExecutor | None = None
        self.seen_bloom = BloomFilter(bloom_bits) if use_bloom else None
        self.seen_cuckoo = ShardedCuckoo() if use_cuckoo else None
        # opt-in phase timing: when True, round() adds a "phases" dict
        # (driver-side wall seconds per materialization point) to its
        # metrics — the profiling hook behind scripts/crawl_bench.py
        self.profile_rounds = False
        # Reusable unresolved Column trees for the round's fixed
        # expressions. Column objects are immutable, name-resolved
        # per-plan, and safe to share across rounds; building them once
        # removes ~hundreds of py4j round-trips of driver-side plan
        # construction per round (measured ~1.5 s/round of the profile's
        # untimed 'other' at bench scale).
        empty_spans = F.expr(
            "CAST(array() AS array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>)"
        )
        x_status = F.coalesce(F.col("status_code"), F.lit(404))
        x_clean = clean_spans(F.coalesce(F.col("spans"), empty_spans))
        x_text = render_spans_text(F.col("clean_spans"))
        x_dead = is_permanent_error(F.col("status"), F.col("text"))
        x_empty = ~F.col("is_dead_err") & (
            F.length(F.regexp_replace(F.col("text"), r"\s", "")) == 0
        )
        x_outcome = (
            F.when(F.col("is_dead_err"), F.lit("dead"))
            .when(
                F.col("is_empty")
                & (
                    F.lit(max_attempts is not None)
                    & (F.col("attempts") + 1 >= F.lit(max_attempts or 0))
                ),
                F.lit("dead"),
            )
            .when(F.col("is_empty"), F.lit("retry"))
            .otherwise(F.lit("fetched"))
        )
        self._rx = {
            "salt": F.pmod(F.xxhash64("url"), F.lit(salt_buckets)),
            "status": x_status,
            "clean_spans": x_clean,
            "text": x_text,
            "is_dead_err": x_dead,
            "is_empty": x_empty,
            "outcome": x_outcome,
            "canon_url": canonicalize_url(F.col("href")),
            "url_ok": ~is_malformed(F.col("url")),
            "seq_in_round": (F.col("pop_rank") - 1).cast("int"),
            "links_agg": F.sum(
                F.when(
                    F.col("outcome") == "fetched",
                    F.size(
                        F.array_distinct(F.coalesce(F.col("out_links"), F.array()))
                    ),
                ).otherwise(F.lit(0))
            ).alias("links"),
        }

    # -- state I/O ----------------------------------------------------------

    def _read(self, tbl: SnapshotTable, name: str) -> DataFrame:
        return tbl.read(self.spark, self.versions.get(name))

    def _commit(self, tbl: SnapshotTable, name: str, df: DataFrame, **kw) -> None:
        # appends extend the engine's PINNED version, not the manifest's
        # current — orphan versions from a torn (crashed) round stay out of
        # the lineage after resume instead of being resurrected
        if kw.get("mode") == "append":
            kw.setdefault("parent_version", self.versions.get(name))
        info = tbl.commit(df, **kw)
        self.versions[name] = info.version

    def _commit_pool(self) -> "ThreadPoolExecutor":
        """Shared executor for overlapping independent table commits within
        a round (lazily created, lives with the engine — rounds are
        sequential by contract, so at most one round's commits are ever in
        flight)."""
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="crawl-commit"
            )
        return self._pool

    def _commit_rows(
        self, tbl: SnapshotTable, name: str, rows: list, schema: str, **kw
    ) -> None:
        """Driver-rows commit (no Spark job) — metrics/lineage side tables
        whose rows are O(hosts) and already live on the driver."""
        if kw.get("mode") == "append":
            kw.setdefault("parent_version", self.versions.get(name))
        info = tbl.commit_rows(rows, schema, **kw)
        self.versions[name] = info.version

    def _bucket(self, host_col: str = "host"):
        return F.pmod(F.xxhash64(host_col), F.lit(self.host_buckets)).cast("int")

    def _commit_pending_base(self, df: DataFrame) -> None:
        """Full rewrite of the pending BASE, partitioned by host bucket
        (seed + compaction only — never per round)."""
        info = self.pending_tbl.commit_partitioned(df, "bucket", changed=None)
        self.versions["frontier_pending"] = info.version

    def _read_pending(self) -> DataFrame:
        """Merge-on-read view of the pending frontier (see
        merge_on_read_pending for the key semantics)."""
        base = self._read(self.pending_tbl, "frontier_pending")
        delta = self._read(self.pending_delta_tbl, "frontier_pending_delta")
        return merge_on_read_pending(base, delta)

    def _compact_pending(self) -> None:
        """Fold the delta into a fresh partitioned base (Iceberg rewrite/
        compaction). Amortized: runs every ``compact_every`` rounds, so the
        per-round cost stays O(pending / compact_every) + O(batch)."""
        current = self._read_pending()
        self._commit_pending_base(current.select(*FRONTIER_COLS_PENDING))
        self._commit(
            self.pending_delta_tbl,
            "frontier_pending_delta",
            self.spark.createDataFrame([], self._delta_schema()),
        )

    @staticmethod
    def _delta_schema() -> str:
        return (
            "url string, url_hash long, host string, depth int, priority int, "
            "seq long, state string, attempts int, bucket int, op string"
        )

    def _save_checkpoint(self) -> None:
        state = {
            "round_id": self.round_id,
            "seq_counter": self.seq_counter,
            "versions": self.versions,
            "batch_size": self.batch_size,
            "bloom_bits": self.bloom_bits,
            "max_attempts": self.max_attempts,
        }
        if self.seen_bloom is not None:
            state["bloom_path"] = self.checkpoint.save_filter(
                self.round_id, self.seen_bloom.to_bytes()
            )
        if self.seen_cuckoo is not None:
            state["cuckoo_path"] = self.checkpoint.save_filter(
                self.round_id, self.seen_cuckoo.to_bytes(), kind="cuckoo_filter"
            )
        self.checkpoint.save(state)
        # bounded disk: old per-round filter files are unreachable once the
        # checkpoint pointer moves — drop all but a small trailing window
        self.checkpoint.prune_filters(self.round_id, keep=2)

    @classmethod
    def resume(
        cls, spark: SparkSession, corpus: DataFrame, robots: DataFrame, workdir: str, **kw
    ) -> "CrawlEngine":
        """Rebuild an engine bit-for-bit from the last checkpoint: table
        reads are pinned to the checkpointed snapshot versions, the bloom
        bitmap reloads from its state file, counters restore (north rule
        resume-mid-crawl)."""
        ck = CrawlCheckpoint(workdir).load()
        if ck is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        hosts_placeholder = spark.createDataFrame(
            [], "host string, capacity double, refill_rate double"
        )
        # retry semantics are part of the checkpointed contract — a resume
        # must not silently change them unless the caller overrides
        kw.setdefault("max_attempts", ck.get("max_attempts", 3))
        eng = cls(
            spark,
            corpus,
            robots,
            hosts_placeholder,
            workdir,
            batch_size=ck["batch_size"],
            bloom_bits=ck["bloom_bits"],
            **kw,
        )
        eng.round_id = ck["round_id"]
        eng.seq_counter = ck["seq_counter"]
        eng.versions = dict(ck["versions"])
        if eng.use_bloom:
            blob = None
            p = ck.get("bloom_path")
            if p and os.path.exists(p):
                with open(p, "rb") as f:
                    blob = f.read()
            if blob is not None and len(blob) * 8 == ck["bloom_bits"]:
                eng.seen_bloom = BloomFilter.from_bytes(blob)
            else:
                # missing/corrupt filter state must NOT silently degrade to
                # an empty bloom (new_urls treats misses as definitely-new →
                # re-fetch of already-seen URLs). Rebuild exactly from the
                # checkpointed seen set: pending ∪ fetched. The rebuilt bloom
                # is a subset of the incremental one (no stale dead entries)
                # — still a sound prefilter for the exact anti-join.
                seen_hashes = (
                    eng._read_pending()
                    .select("url_hash")
                    .unionByName(
                        eng._read(eng.fetched_tbl, "frontier_fetched").select("url_hash")
                    )
                )
                eng.seen_bloom = build_bloom(
                    seen_hashes, "url_hash", ck["bloom_bits"], eng.seen_bloom.num_hashes
                )
        if eng.use_cuckoo:
            p = ck.get("cuckoo_path")
            if p and os.path.exists(p):
                with open(p, "rb") as f:
                    eng.seen_cuckoo = ShardedCuckoo.from_bytes(f.read())
            else:
                # same no-silent-degrade rule as the bloom: rebuild the
                # deletable filter from the exact seen set (distributed)
                seen_hashes = (
                    eng._read_pending()
                    .select("url_hash")
                    .unionByName(
                        eng._read(eng.fetched_tbl, "frontier_fetched").select("url_hash")
                    )
                )
                eng.seen_cuckoo = maintain_sharded_cuckoo(
                    spark, eng.seen_cuckoo, seen_hashes
                )
        return eng

    # -- seeding ------------------------------------------------------------

    def seed(self, seeds: list[tuple[str, int]]) -> int:
        """Seed the frontier from a driver-side list (S1: insert-if-not-
        exists semantics, operations.py:32-41)."""
        df = self.spark.createDataFrame(
            [(u, p, i) for i, (u, p) in enumerate(seeds)],
            "raw_url string, priority int, seed_idx long",
        )
        return self.seed_df(df, n_rows_hint=len(seeds))

    def seed_df(
        self,
        seeds_df: DataFrame,
        order_cols: list | None = None,
        n_rows_hint: int | None = None,
    ) -> int:
        """Seed the frontier from a DataFrame — the scale path for sitemap /
        url-list sources (sources/seeds.py): canonicalize → malformed →
        robots → first-occurrence dedup → seq assignment in ``order_cols``
        order (two-stage distributed rank, no single-task window, so a
        10^7-URL sitemap index seeds without a driver round-trip).

        seeds_df needs (raw_url, priority) plus the ``order_cols``
        (default ["seed_idx"]) defining seed order.

        ``n_rows_hint`` — an upper bound on the seed count when the caller
        knows it (the driver-list ``seed()`` path always does). Bounds at
        or below ``rank_window_threshold`` take the bounded single-window
        rank — the same size-aware dispatch as ``round()``'s link-seq
        assignment, identical total order, and several fewer jobs (no
        range-boundary sampling / local-index / counts passes) on
        driver-page-sized seed lists. No hint (or a large one) keeps the
        two-stage distributed rank so a 10^7-URL sitemap index never
        funnels through one task.
        """
        order_cols = order_cols or ["seed_idx"]
        cand = (
            seeds_df.withColumn("url", canonicalize_url(F.col("raw_url")))
            .where(~is_malformed(F.col("url")))
            .transform(with_host_and_path)
        )
        w = Window.partitionBy("url").orderBy(*order_cols)
        cand = cand.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
        cand = robots_allowed(
            cand, prebuilt_rules=self._robots_rules,
            compiled=self._robots_pred, try_compile=False,
        )
        if n_rows_hint is not None and n_rows_hint <= self.rank_window_threshold:
            ranked = cand.withColumn(
                "__seed_rank",
                F.row_number().over(Window.orderBy(*order_cols)) - 1,
            )
            pinned = None
        else:
            ranked, pinned = with_global_rank(
                cand, order_cols, rank_col="__seed_rank"
            )
        rows = (
            ranked.withColumn("seq", F.col("__seed_rank").cast("long"))
            .select(
                "url",
                F.xxhash64("url").alias("url_hash"),
                "host",
                F.lit(0).alias("depth"),
                "priority",
                "seq",
                F.lit("pending").alias("state"),
                F.lit(0).alias("attempts"),
            )
            .withColumn("bucket", self._bucket())
        )
        rows = rows.cache()
        # materialize BEFORE fanning out: the two-stage rank's pinned
        # intermediate must be fully cached once so concurrent consumers
        # can't re-sample range boundaries into divergent seq orders.
        # When the bloom is on, the materializing job doubles as its seed
        # build (same fused shape as round(); one job instead of two).
        if self.seen_bloom is not None:
            _bf, n = build_bloom_with_count(
                rows, "url_hash", self.seen_bloom.num_bits, self.seen_bloom.num_hashes
            )
            self.seen_bloom = self.seen_bloom.merge(_bf)
        else:
            n = rows.count()
        pool = self._commit_pool()
        futures = [
            pool.submit(self._commit_pending_base, rows),
            pool.submit(
                self._commit, self.hosts_tbl, "hosts", init_hosts(self._hosts_init)
            ),
            pool.submit(
                self._commit,
                self.documents_tbl,
                "documents",
                self.spark.createDataFrame(
                    [],
                    "url string, host string, depth int, fetch_round int, "
                    "seq_in_round int, status int, content string, "
                    "spans array<struct<kind:string,text:string,"
                    "media_ref:string,offset:int>>",
                ),
            ),
        ]
        # empty flat-schema snapshots: driver fast path, no Spark job
        self._commit_rows(
            self.pending_delta_tbl, "frontier_pending_delta", [], self._delta_schema()
        )
        self._commit_rows(
            self.fetched_tbl,
            "frontier_fetched",
            [],
            "url string, url_hash long, host string, depth int, priority int, "
            "seq long, state string, attempts int",
        )
        self._commit_rows(
            self.metrics_tbl,
            "metrics",
            [],
            "round int, scope string, key string, value long",
        )
        self.seq_counter = n
        # bloom already folded in by the fused materialize above
        if self.seen_cuckoo is not None:
            self.seen_cuckoo = maintain_sharded_cuckoo(
                self.spark, self.seen_cuckoo, rows.select("url_hash")
            )
        for fut in futures:
            fut.result()
        if pinned is not None:
            pinned.unpersist()
        rows.unpersist()
        self._save_checkpoint()
        return n

    def reprioritize(
        self, priorities: DataFrame, url_col: str = "url", priority_col: str = "priority"
    ) -> int:
        """Update pending-frontier priorities mid-crawl in O(matched) rows —
        the adaptive-scheduling hook: feed it operators/graph.pagerank
        scores over the crawled link graph to shift from BFS order to
        importance-first ordering without touching the base table.

        Each matched row whose priority actually changes gets an equality
        'del' of its current version plus an 'add' at the new priority in
        the merge-on-read delta (priority is part of the delete key, so the
        new version survives the anti-join). Pop order (priority DESC, seq
        ASC) picks the change up on the next round; seq/attempts/state are
        untouched, so retry semantics and the determinism contract for
        everything except the intended reordering are preserved. The delta
        commit + checkpoint make it resume-safe like any round."""
        pr = priorities.select(
            F.col(url_col).alias("url"),
            F.col(priority_col).cast("int").alias("__new_priority"),
        )
        matched = (
            self._read_pending()
            .join(pr, "url")
            .where(F.col("priority") != F.col("__new_priority"))
            .cache()
        )
        n = matched.count()
        if n:
            dels = matched.select(*FRONTIER_COLS_PENDING).withColumn(
                "op", F.lit("del")
            )
            adds = (
                matched.withColumn("priority", F.col("__new_priority"))
                .select(*FRONTIER_COLS_PENDING)
                .withColumn("op", F.lit("add"))
            )
            self._commit(
                self.pending_delta_tbl,
                "frontier_pending_delta",
                dels.unionByName(adds),
                mode="append",
                extra={"round": self.round_id, "reprioritized": n},
            )
            self._save_checkpoint()
        matched.unpersist()
        return n

    def purge_host(self, host: str) -> int:
        """Drop every PENDING url of one host in O(bucket) I/O — the
        partition-pruned maintenance path the host-bucket layout exists
        for (a host taken out of scope, gone dead, or newly disallowed).

        The host's bucket is computed driver-side with a pure-Python
        XXH64 (functions/xxh.py, parity-pinned against the JVM's
        xxhash64 — no 1-row Spark job); only that one partition directory
        is scanned (SnapshotTable.read(partitions=[bucket]) manifest
        pruning) and only delta 'del' rows are written, O(matched).
        Fetched/documents history is untouched.
        Note: purged PENDING urls leave the seen set (the same delete
        semantics as dead URLs); to keep a purged host out permanently,
        also add a disallow rule to the robots table — admission filters
        on robots BEFORE dedup. Resume-safe like any delta commit."""
        from mcp_crawl4ai_rag_spark.functions.xxh import host_bucket

        bucket = host_bucket(host, self.host_buckets)
        base = self.pending_tbl.read(
            self.spark, self.versions.get("frontier_pending"), partitions=[bucket]
        )
        delta = self._read(self.pending_delta_tbl, "frontier_pending_delta")
        adds = delta.where((F.col("op") == "add") & (F.col("host") == host)).drop("op")
        dels_existing = delta.where(F.col("op") == "del").select(
            "url", "seq", "attempts", "priority"
        )
        live = (
            base.where(F.col("host") == host)
            .unionByName(adds)
            .join(
                F.broadcast(dels_existing),
                ["url", "seq", "attempts", "priority"],
                "left_anti",
            )
            .cache()
        )
        n = live.count()
        if n:
            self._commit(
                self.pending_delta_tbl,
                "frontier_pending_delta",
                live.select(*FRONTIER_COLS_PENDING).withColumn("op", F.lit("del")),
                mode="append",
                extra={"round": self.round_id, "purged_host": host, "dels": n},
            )
            self._save_checkpoint()
        live.unpersist()
        return n

    # -- one BFS round --------------------------------------------------------
    # (seen-filter maintenance is fused into each path's materializing job:
    # the bloom delta rides the count job — build_bloom_with_count — and the
    # opt-in cuckoo runs its per-shard update pass at the old maintenance
    # point. Both stay fully distributed: per-partition bitmaps OR-merged on
    # the driver / per-shard updates in executor tasks; deletes first, so
    # dead URLs leave the seen set before link insertion.)

    def round(self) -> dict:
        """Run one crawl round; returns the round's metrics dict
        (popped == 0 ⇒ frontier drained)."""
        import time as _time

        _t0 = _time.perf_counter()
        _ph: dict[str, float] = {}
        self.round_id += 1
        pending = self._read_pending()
        hosts = self._read(self.hosts_tbl, "hosts")
        if self.round_id > 1:
            hosts = refill_hosts(hosts)

        popped = budgeted_pop(pending, hosts, self.batch_size).cache()
        n_popped = popped.count()
        _ph["pop"] = _time.perf_counter() - _t0
        if n_popped == 0:
            popped.unpersist()
            self.round_id -= 1
            return {"round": self.round_id + 1, "popped": 0}

        # Size reduce-side parallelism to THIS round's data instead of the
        # session constant: round work is bounded by the popped batch's
        # link fan-out plus the live frontier (seq_counter), so tiny
        # rounds otherwise schedule ~shuffle.partitions near-empty reduce
        # tasks per exchange (measured 17.0 s -> ~12 s per 3-round crawl
        # at batch_size=10). The clamp is data-derived and capped at the
        # session value, so at cluster scale (large frontier / big
        # batches) it returns the session setting unchanged.
        _sess_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        _est_rows = max(self.seq_counter, n_popped * 256, 4096)
        _round_parts = min(_sess_parts, max(1, -(-_est_rows // 4096)))
        if _round_parts < _sess_parts:
            self.spark.conf.set("spark.sql.shuffle.partitions", str(_round_parts))
        try:
            # fetch stage. Default (sandbox): corpus restricted to the popped
            # batch via broadcast semi join (an IN-list of thousands of literals
            # would bloat the plan; the broadcast side is bounded by batch_size),
            # then the matched pages broadcast back onto the batch. Production:
            # the injected partition fetcher with per-partition session reuse.
            # Either way the salted repartition spreads hot hosts across tasks
            # (J5 skew note) first.
            nparts = self.fetch_partitions or self.spark.sparkContext.defaultParallelism
            fetch_input = popped.repartition(nparts, F.col("host"), self._rx["salt"])
            if self.fetcher is not None:
                joined = fetch_with_partition_sessions(fetch_input, self.fetcher).drop(
                    "fetch_session", "fetch_error"
                )
            else:
                pages = self.corpus.join(
                    F.broadcast(popped.select("url")), "url", "left_semi"
                ).select("url", "status_code", "spans", "out_links")
                joined = fetch_input.join(F.broadcast(pages), "url", "left")
            # prebuilt trees (__init__ _rx): is_empty is whitespace-equivalent
            # to the oracle's str.strip() — F.trim only strips ASCII spaces
            enriched = (
                joined
                .withColumn("status", self._rx["status"])
                .withColumn("clean_spans", self._rx["clean_spans"])
                .withColumn("text", self._rx["text"])
                .withColumn("is_dead_err", self._rx["is_dead_err"])
                .withColumn("is_empty", self._rx["is_empty"])
                .withColumn("outcome", self._rx["outcome"])
                .cache()
            )

            # Independent table commits overlap with the round's main-thread
            # work (link pipeline, stats): each commit is a separate Spark job
            # whose ~0.3-0.5 s of scheduling latency would otherwise serialize.
            # Safe because every commit targets a distinct table (per-table
            # version sequences — and thus all committed state — are identical
            # to the serial schedule), all reads in this round pin versions
            # captured before the corresponding submit, and the checkpoint is
            # only written after every future is joined. Concurrent first
            # actions may compute a cached `enriched` partition twice (Spark's
            # cache doesn't block cross-job) — bounded by batch_size, never by
            # frontier size.
            pool = self._commit_pool()
            futures: list = []

            # one stats pass: per-(host, outcome) counts + per-page-deduped
            # link totals (links_seen = Σ distinct hrefs of fetched pages —
            # identical to counting the exploded first-occurrence rows,
            # without a 2nd job). Submitted to the pool so its ~0.2-0.3 s
            # job overlaps the main-thread link pipeline like the commits
            # do (same bounded double-compute caveat on the enriched cache);
            # the result is only consumed after the link materialization.
            _stats_agg = (
                enriched.groupBy("host", "outcome")
                .agg(F.count("*").alias("n"), self._rx["links_agg"])
            )
            fut_stats = pool.submit(_stats_agg.collect)

            # documents fast-append (S4 content sink)
            docs = enriched.where(F.col("outcome") == "fetched").select(
                "url",
                "host",
                "depth",
                F.lit(self.round_id).alias("fetch_round"),
                self._rx["seq_in_round"].alias("seq_in_round"),
                "status",
                F.col("text").alias("content"),
                F.col("clean_spans").alias("spans"),
            )
            futures.append(
                pool.submit(self._commit, self.documents_tbl, "documents", docs, mode="append")
            )

            if self.track_link_graph:
                edges = (
                    enriched.where(F.col("outcome") == "fetched")
                    .select(
                        F.col("url").alias("src"),
                        F.explode_outer("out_links").alias("href"),
                    )
                    .where(F.col("href").isNotNull())
                    .withColumn("dst", self._rx["canon_url"])
                    .where(~is_malformed(F.col("dst")))
                    .select("src", "dst")
                    .distinct()
                )
                futures.append(
                    pool.submit(
                        self._commit, self.edges_tbl, "link_edges", edges,
                        mode="append",
                    )
                )

            # link pipeline (P5→P1→P2→J6→J3)
            links = (
                enriched.where(F.col("outcome") == "fetched")
                .select(
                    "pop_rank",
                    "depth",
                    F.posexplode_outer("out_links").alias("link_pos", "href"),
                )
                .where(F.col("href").isNotNull())
            )
            # Per-page link dedup (SO1) is algebraically FUSED into the global
            # first-discovery aggregate below: keeping min link_pos per
            # (pop_rank, href) then taking min(struct(pop_rank, link_pos))
            # per url is identical to taking the min over the un-deduped rows
            # (duplicates only add larger (pop_rank, link_pos) tuples, which
            # can never win the min; same-page duplicates share depth). An
            # explicit row_number window here would shuffle the whole exploded
            # link set once more per round for no semantic effect — at 10^10
            # scale that is the round's largest intermediate.
            canon = links.withColumn("url", self._rx["canon_url"]).where(
                self._rx["url_ok"]
            )
            first = canon.groupBy("url").agg(
                F.min(F.struct("pop_rank", "link_pos", "depth")).alias("f")
            )
            cand = first.select(
                "url",
                F.col("f.pop_rank").alias("pop_rank"),
                F.col("f.link_pos").alias("link_pos"),
                (F.col("f.depth") + 1).alias("depth"),
            ).transform(with_host_and_path)
            # cached: bounded by batch x out-degree, and read twice below (the
            # seen-probe broadcast build + the final anti-join)
            cand = robots_allowed(
                cand, prebuilt_rules=self._robots_rules,
                compiled=self._robots_pred, try_compile=False,
            ).cache()

            # seen set: pending' ∪ fetched ∪ this round's fetches — this round's
            # deaths have already left the set (simulator order: deletes happen
            # before link insertion); popped non-dead rows stay seen
            dead = enriched.where(F.col("outcome") == "dead").select("url", "url_hash")
            untouched_pending = pending.join(
                F.broadcast(popped.select("url")), "url", "left_anti"
            )
            retries = (
                enriched.where(F.col("outcome") == "retry")
                .withColumn("attempts", F.col("attempts") + 1)
                .select(*FRONTIER_COLS_PENDING)
            )
            fetched_now = (
                enriched.where(F.col("outcome") == "fetched")
                .withColumn("state", F.lit("fetched"))
                .select(*FRONTIER_COLS)
            )
            pending_base = untouched_pending.select(*FRONTIER_COLS_PENDING).unionByName(
                retries
            )
            seen_urls = (
                pending_base.select("url")
                .unionByName(fetched_now.select("url"))
                .unionByName(
                    self._read(self.fetched_tbl, "frontier_fetched").select("url")
                )
            )
            # seen_urls has pinned the PRE-append fetched version above, so the
            # append can proceed concurrently with the link pipeline
            futures.append(
                pool.submit(
                    self._commit, self.fetched_tbl, "frontier_fetched",
                    fetched_now, mode="append",
                )
            )

            # round candidates are bounded; once the frontier outgrows the
            # threshold, the seen-scan probe shape (no frontier shuffle or
            # driver broadcast) is the only safe plan. The approximate
            # prefilter follows the same dispatch: it pays only in that
            # probe regime (shrinks the broadcast probe set before the full
            # seen scan) — against a small anti-joinable seen set its two
            # Python/Arrow probe passes are pure added stages (new_urls
            # docstring measurements; ~0.85 s/round at bench batch sizes).
            # Output is exact on both paths, so dispatch never changes it.
            _probe = self.seq_counter > self.probe_broadcast_threshold
            fresh = new_urls(
                cand,
                seen_urls,
                bloom=self.seen_bloom if _probe else None,
                cuckoo=self.seen_cuckoo if _probe else None,
                spark=self.spark,
                probe_broadcast=_probe,
            )
            # discovery-order seq assignment. Size-aware dispatch: a round's new
            # links are bounded by batch_size × out_degree, so small batches use
            # the bounded single-window rank (one fewer job — the window input
            # is driver-page-sized); large batches use the two-stage distributed
            # rank so 10^7 links never funnel through one task. Both produce the
            # identical total order (pop_rank, link_pos).
            if self.batch_size <= self.rank_window_threshold:
                ranked = fresh.withColumn(
                    "__rank",
                    F.row_number().over(Window.orderBy("pop_rank", "link_pos")) - 1,
                )
                pinned = None
            else:
                ranked, pinned = with_global_rank(
                    fresh, ["pop_rank", "link_pos"], rank_col="__rank"
                )
            new_rows = (
                ranked.select(
                    "url",
                    F.xxhash64("url").alias("url_hash"),
                    "host",
                    F.col("depth").cast("int").alias("depth"),
                    F.lit(0).alias("priority"),
                    (F.col("__rank") + F.lit(self.seq_counter)).cast("long").alias("seq"),
                    F.lit("pending").alias("state"),
                    F.lit(0).alias("attempts"),
                )
                .withColumn("bucket", self._bucket())
                .cache()
            )
            _t = _time.perf_counter()
            if self.seen_bloom is not None:
                # fused materialize: the same job that counts (and populates
                # the new_rows cache) builds this round's bloom delta —
                # one job-scheduling round-trip instead of two. OR-merge is
                # order-free, so merging here (instead of at the filter-
                # maintenance point below) yields the identical bitmap.
                _bf_delta, n_new = build_bloom_with_count(
                    new_rows,
                    "url_hash",
                    self.seen_bloom.num_bits,
                    self.seen_bloom.num_hashes,
                )
                self.seen_bloom = self.seen_bloom.merge(_bf_delta)
            else:
                n_new = new_rows.count()
            _ph["links"] = _time.perf_counter() - _t

            # merge-on-read delta commit, O(batch): every popped row version gets
            # an equality 'del' on (url, attempts); retries re-append at
            # attempts+1 and brand-new links append fresh. The base is untouched
            # — no O(pending) rewrite in the round path. fetched stays a fast
            # append of this round's rows.
            dels = popped.select(*FRONTIER_COLS_PENDING).withColumn("op", F.lit("del"))
            adds = (
                retries.unionByName(new_rows.select(*FRONTIER_COLS_PENDING))
            ).withColumn("op", F.lit("add"))
            fut_delta = pool.submit(
                self._commit,
                self.pending_delta_tbl,
                "frontier_pending_delta",
                dels.unionByName(adds),
                mode="append",
                # per-commit lineage (north rule): which round produced this
                # delta and its op cardinalities — time travel + audit
                extra={"round": self.round_id, "dels": n_popped, "adds": n_new},
            )
            futures.append(fut_delta)
            self.seq_counter += n_new
            if self.compact_every and self.round_id % self.compact_every == 0:
                _t = _time.perf_counter()
                fut_delta.result()  # compaction folds the delta it just wrote
                self._compact_pending()
                _ph["compact"] = _time.perf_counter() - _t

            _t = _time.perf_counter()
            stats = fut_stats.result()
            _ph["stats"] = _time.perf_counter() - _t
            outcome_counts: dict[str, int] = {}
            host_popped: dict[str, int] = {}
            n_links_seen = 0
            for r in stats:
                outcome_counts[r["outcome"]] = outcome_counts.get(r["outcome"], 0) + r["n"]
                host_popped[r["host"]] = host_popped.get(r["host"], 0) + r["n"]
                n_links_seen += r["links"]

            # politeness charge + per-host lineage metrics
            popped_counts = self.spark.createDataFrame(
                list(host_popped.items()), "host string, popped long"
            )
            futures.append(
                pool.submit(
                    self._commit, self.hosts_tbl, "hosts",
                    charge_hosts(hosts, popped_counts),
                )
            )

            m = {
                "round": self.round_id,
                "popped": n_popped,
                "fetched": outcome_counts.get("fetched", 0),
                "dead": outcome_counts.get("dead", 0),
                "retried": outcome_counts.get("retry", 0),
                "links_seen": int(n_links_seen),
                "links_inserted": n_new,
            }
            metric_rows = [
                (self.round_id, "round", k, int(v)) for k, v in m.items() if k != "round"
            ] + [
                (self.round_id, f"host:{h}", "popped", int(n))
                for h, n in sorted(host_popped.items())
            ]
            _t = _time.perf_counter()
            self._commit_rows(
                self.metrics_tbl,
                "metrics",
                metric_rows,
                "round int, scope string, key string, value long",
                mode="append",
            )
            _ph["metrics"] = _time.perf_counter() - _t

            _t = _time.perf_counter()
            # bloom delta already folded in by the fused materialize above;
            # only the (opt-in) cuckoo still needs its per-shard update pass
            if self.seen_cuckoo is not None:
                self.seen_cuckoo = maintain_sharded_cuckoo(
                    self.spark,
                    self.seen_cuckoo,
                    new_rows.select("url_hash"),
                    dead.select("url_hash"),
                )
            _ph["filters"] = _time.perf_counter() - _t
            # barrier: every commit must be durable (a raised CommitConflict or
            # write error surfaces here) before the checkpoint pointer advances
            _t = _time.perf_counter()
            for fut in futures:
                fut.result()
            _ph["commits_join"] = _time.perf_counter() - _t
            if self.compact_every and self.round_id % self.compact_every == 0:
                # bin-pack the append-only tables' per-round files (Iceberg
                # rewrite_data_files, SnapshotTable.compact_tail): each table
                # gains one small file per round, and fetched is re-read every
                # round by the seen-side union — unfolded, reader file counts
                # grow O(rounds) (the late-round drift measured in
                # BENCH/BASELINE.md's 200k-page run). Tail-only fold ⇒
                # amortized O(batch) per round; runs after the commit barrier
                # so this round's appends are durable, before the checkpoint
                # so the folded versions are the pinned ones.
                _t = _time.perf_counter()
                fold = [
                    (self.fetched_tbl, "frontier_fetched"),
                    (self.documents_tbl, "documents"),
                    (self.metrics_tbl, "metrics"),
                ]
                if self.track_link_graph:
                    fold.append((self.edges_tbl, "link_edges"))
                for tbl, name in fold:
                    info = tbl.compact_tail(
                        self.spark, parent_version=self.versions.get(name)
                    )
                    if info is not None:
                        self.versions[name] = info.version
                _ph["compact_tail"] = _time.perf_counter() - _t
            _t = _time.perf_counter()
            self._save_checkpoint()
            _ph["ckpt"] = _time.perf_counter() - _t
            # long crawls would otherwise accumulate O(rounds) pending-table
            # rewrites; keep a bounded time-travel window (checkpoint pins the
            # current version, which is always retained)
            if self.snapshot_keep:
                _t = _time.perf_counter()
                self.pending_tbl.expire_snapshots(keep=self.snapshot_keep)
                self.pending_delta_tbl.expire_snapshots(keep=self.snapshot_keep)
                self.hosts_tbl.expire_snapshots(keep=self.snapshot_keep)
                # append-only tables: before compact_tail existed, expiry was a
                # no-op here (every dir stayed referenced by the current
                # manifest); now it GCs the folded-away per-round files
                self.fetched_tbl.expire_snapshots(keep=self.snapshot_keep)
                self.documents_tbl.expire_snapshots(keep=self.snapshot_keep)
                self.metrics_tbl.expire_snapshots(keep=self.snapshot_keep)
                if self.track_link_graph:
                    self.edges_tbl.expire_snapshots(keep=self.snapshot_keep)
                _ph["expire"] = _time.perf_counter() - _t
            popped.unpersist()
            enriched.unpersist()
            new_rows.unpersist()
            cand.unpersist()
            if pinned is not None:
                pinned.unpersist()
            if self.profile_rounds:
                _ph["total"] = _time.perf_counter() - _t0
                _ph["other"] = _ph["total"] - sum(
                    v for k, v in _ph.items() if k != "total"
                )
                m["phases"] = {k: round(v, 3) for k, v in _ph.items()}
            return m
        finally:
            if _round_parts < _sess_parts:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(_sess_parts)
                )

    def run(
        self,
        max_rounds: int = 1000,
        reprioritize_every: int | None = None,
        pagerank_iter: int = 8,
        priority_scale: int = 1000,
    ) -> list[dict]:
        """Run rounds to frontier drain (or ``max_rounds``).

        ``reprioritize_every=k`` turns on the adaptive-scheduling policy
        the north rule's priority max-heap implies: every k completed
        rounds, PageRank over the accumulated link graph (requires
        ``track_link_graph=True``) is folded into pending priorities via
        ``reprioritize`` — the crawl shifts from BFS order to
        importance-first mid-flight. Ranks are quantized to
        ``int(rank * priority_scale)`` so the priority column stays an
        int and ties keep the deterministic (priority DESC, seq ASC)
        contract; the whole step is a normal delta commit + checkpoint,
        so it is resume-safe and deterministic (pinned by
        tests/test_crawl_e2e.py::test_reprioritize_every_policy).
        """
        if reprioritize_every and not self.track_link_graph:
            raise ValueError("reprioritize_every requires track_link_graph=True")
        out = []
        for _ in range(max_rounds):
            m = self.round()
            if m["popped"] == 0:
                break
            out.append(m)
            if reprioritize_every and len(out) % reprioritize_every == 0:
                m["reprioritized"] = self.reprioritize_by_pagerank(
                    n_iter=pagerank_iter, priority_scale=priority_scale
                )
        return out

    def link_graph(self) -> DataFrame:
        """Accumulated distinct (src, dst) edges of fetched pages
        (``track_link_graph=True``); input to operators/graph.pagerank."""
        return self._read(self.edges_tbl, "link_edges").dropDuplicates(
            ["src", "dst"]
        )

    def reprioritize_by_pagerank(
        self, n_iter: int = 8, priority_scale: int = 1000
    ) -> int:
        """One policy step: PageRank the link graph, quantize, fold into
        pending priorities. Returns rows reprioritized (0 when the graph
        is still empty)."""
        from mcp_crawl4ai_rag_spark.operators.graph import pagerank

        try:
            edges = self.link_graph()
        except FileNotFoundError:
            return 0
        ranks = pagerank(edges, src="src", dst="dst", n_iter=n_iter)
        pr = ranks.select(
            F.col("id").alias("url"),
            F.round(F.col("rank") * priority_scale).cast("int").alias("priority"),
        )
        return self.reprioritize(pr)

    # -- result accessors ------------------------------------------------------

    def documents(self) -> DataFrame:
        return self._read(self.documents_tbl, "documents")

    def frontier(self) -> DataFrame:
        """Logical frontier view: pending ∪ fetched (dead rows are gone).
        The pending table's physical partition column is dropped — the
        logical schema is FRONTIER_COLS for both halves."""
        return (
            self._read_pending()
            .select(*FRONTIER_COLS)
            .unionByName(self._read(self.fetched_tbl, "frontier_fetched"))
        )

    def metrics(self) -> DataFrame:
        return self._read(self.metrics_tbl, "metrics")

    def crawl_order(self) -> DataFrame:
        """(url, fetch_round, seq_in_round) for every *fetched* page —
        compared against the oracle simulator's ordering."""
        return self.documents().select("url", "fetch_round", "seq_in_round")
