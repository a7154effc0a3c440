"""Adaptive frontier reprioritization (CrawlEngine.reprioritize).

Covers: priority updates flow through the merge-on-read delta (del old
row-version + add at new priority, priority in the delete key), pop order
follows the new priorities on the next round, PageRank scores plug in as
the priority source, and a resumed engine sees the reprioritized
frontier bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _engine(spark, tmp_path, web, batch_size=3):
    hosts = spark.createDataFrame(
        [(h, 100.0, 100.0) for h in {u.split("/")[2] for u in web.corpus}],
        "host string, capacity double, refill_rate double",
    )
    eng = CrawlEngine(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        hosts,
        str(tmp_path / "crawl"),
        batch_size=batch_size,
        max_attempts=3,
    )
    eng.seed(web.seeds)
    return eng


def test_reprioritize_changes_pop_order_and_survives_resume(spark, tmp_path):
    web = generate_web(seed=11, n_hosts=2, n_pages=30)
    eng = _engine(spark, tmp_path, web, batch_size=3)
    eng.run(max_rounds=2)

    pending = eng.frontier().where(F.col("state") == "pending").select("url", "priority", "seq").collect()
    assert len(pending) > 3, "need a non-trivial frontier for the test"
    # invert the order: lowest-seq rows get LOW priority, a specific
    # late-seq url gets a huge one
    by_seq = sorted(pending, key=lambda r: (-r["priority"], r["seq"]))
    # pick a target that fetches cleanly (a 404 target would die and could
    # be legitimately re-discovered at default priority the same round —
    # correct engine semantics, but not what this test probes)
    target = next(
        r["url"]
        for r in reversed(by_seq)
        if web.corpus.get(r["url"], {}).get("status_code") == 200
        and web.corpus[r["url"]]["spans"]
    )
    pri = spark.createDataFrame([(target, 10_000)], "url string, priority int")
    n = eng.reprioritize(pri)
    assert n == 1
    # idempotent: same priorities again → nothing to change
    assert eng.reprioritize(pri) == 0

    # the reprioritized url is now first in pop order
    view = eng.frontier().where(F.col("state") == "pending")
    first = view.orderBy(F.desc("priority"), F.asc("seq")).first()
    assert first["url"] == target and first["priority"] == 10_000
    # row count unchanged — del+add replaced the version, not duplicated it
    assert view.count() == len(pending)

    # next round actually pops it first: the attempts=0 version is consumed
    # (fetched/dead remove it; an empty-content retry re-queues attempts+1)
    eng.round()
    leftover = (
        eng.frontier()
        .where(
            (F.col("state") == "pending")
            & (F.col("url") == target)
            & (F.col("attempts") == 0)
        )
        .count()
    )
    assert leftover == 0

    # resume from checkpoint reproduces the reprioritized frontier exactly
    eng2 = CrawlEngine.resume(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        str(tmp_path / "crawl"),
    )
    a = {(r["url"], r["priority"], r["seq"]) for r in eng.frontier().where(F.col("state") == "pending").collect()}
    b = {(r["url"], r["priority"], r["seq"]) for r in eng2.frontier().where(F.col("state") == "pending").collect()}
    assert a == b


def test_reprioritize_from_pagerank(spark, tmp_path):
    from mcp_crawl4ai_rag_spark.operators.graph import pagerank

    web = generate_web(seed=23, n_hosts=2, n_pages=40)
    eng = _engine(spark, tmp_path, web, batch_size=5)
    eng.run(max_rounds=3)

    # link graph crawled so far: fetched pages -> raw outlinks
    fetched = eng.documents().select(F.col("url").alias("src"))
    edges = (
        web.corpus_df(spark)
        .select(F.col("url").alias("src"), F.explode("out_links").alias("dst"))
        .join(fetched, "src")
    )
    ranks = pagerank(edges, n_iter=5)
    pri = ranks.select("id", (F.col("rank") * 1000).cast("int").alias("priority"))
    n = eng.reprioritize(pri, url_col="id")
    # engine stays consistent: MOR view pops strictly by (priority DESC, seq)
    view = eng.frontier().where(F.col("state") == "pending").orderBy(F.desc("priority"), F.asc("seq"))
    rows = view.collect()
    assert rows == sorted(rows, key=lambda r: (-r["priority"], r["seq"]))
    # and the crawl continues without error after reprioritization
    eng.round()
    assert eng.metrics().count() > 0
