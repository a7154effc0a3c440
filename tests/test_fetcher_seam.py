"""S10 production fetch seam: mapInPandas partition fetcher with
per-partition session reuse — session accounting + e2e equality with the
default corpus-join fetch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.crawl import fetch_with_partition_sessions
from mcp_crawl4ai_rag_spark.sources.synthetic_web import (
    CorpusSessionFetcher,
    generate_web,
)

from tests.test_crawl_e2e import assert_equivalent, run_pair


def test_one_session_per_partition(spark):
    web = generate_web(seed=5, n_hosts=4, n_pages=60, n_seeds=2)
    urls = sorted(web.corpus)[:40]
    batch = spark.createDataFrame([(u,) for u in urls], ["url"]).repartition(4)
    fetched = fetch_with_partition_sessions(batch, CorpusSessionFetcher(web.corpus))
    rows = fetched.collect()
    assert len(rows) == 40
    # exactly one session per non-empty partition, reused for every row in it
    n_parts = batch.withColumn("p", F.spark_partition_id()).select("p").distinct().count()
    sessions = {r["fetch_session"] for r in rows}
    assert len(sessions) == n_parts
    # payloads match the corpus
    by_url = {r["url"]: r for r in rows}
    for u in urls:
        page = web.corpus[u]
        assert by_url[u]["status_code"] == page["status_code"]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in by_url[u]["spans"]
        ]
        want_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in page["spans"]
        ]
        assert got_spans == want_spans
        assert list(by_url[u]["out_links"]) == list(page["out_links"])


def test_unknown_urls_get_404(spark):
    web = generate_web(seed=5, n_hosts=3, n_pages=20, n_seeds=1)
    batch = spark.createDataFrame([("https://nowhere.example/x",)], ["url"])
    row = fetch_with_partition_sessions(
        batch, CorpusSessionFetcher(web.corpus)
    ).collect()[0]
    assert row["status_code"] == 404
    assert list(row["spans"]) == [] and list(row["out_links"]) == []


def test_crawl_with_injected_fetcher_matches_oracle(spark, tmp_path):
    """The full BFS crawl through the production fetch shape must equal the
    simulator (and therefore the default corpus-join path) bit-for-bit."""
    web = generate_web(seed=13, n_hosts=5, n_pages=90, n_seeds=2)
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark,
        tmp_path,
        web,
        batch_size=25,
        host_budgets=budgets,
        fetcher=CorpusSessionFetcher(web.corpus),
    )
    assert_equivalent(sim, eng)


def test_transient_errors_retry_in_partition(spark):
    """A 'transient' fetch failure retries on the SAME session and succeeds
    in-partition — the output is indistinguishable from a clean fetch
    (the engine never sees the hiccup), matching the reference's
    temporary-error branch (apple_stealth_crawler.py:304-308)."""
    from mcp_crawl4ai_rag_spark.sources.synthetic_web import (
        FlakyCorpusSessionFetcher,
    )

    web = generate_web(seed=5, n_hosts=3, n_pages=30, n_seeds=1)
    ok = sorted(u for u, p in web.corpus.items() if p["status_code"] == 200)
    flaky, clean = ok[0], ok[1]
    fetcher = FlakyCorpusSessionFetcher(web.corpus, {flaky: ("transient", 2)})
    batch = spark.createDataFrame([(flaky,), (clean,)], ["url"]).coalesce(1)
    rows = {r["url"]: r for r in
            fetch_with_partition_sessions(batch, fetcher, max_retries=2).collect()}
    assert rows[flaky]["fetch_error"] == ""  # recovered
    assert rows[flaky]["status_code"] == web.corpus[flaky]["status_code"]
    # same session served both (transient => no recreation)
    assert rows[flaky]["fetch_session"] == rows[clean]["fetch_session"]


def test_session_errors_recreate_the_session(spark):
    """A 'session' error closes the broken session and retries on a fresh
    factory instance (reference: recreate AsyncWebCrawler on
    connection-closed, apple_stealth_crawler.py:290-302). Rows served
    after recovery carry the NEW session id."""
    from mcp_crawl4ai_rag_spark.sources.synthetic_web import (
        FlakyCorpusSessionFetcher,
    )

    web = generate_web(seed=5, n_hosts=3, n_pages=30, n_seeds=1)
    ok = sorted(u for u, p in web.corpus.items() if p["status_code"] == 200)
    broken = ok[0]
    fetcher = FlakyCorpusSessionFetcher(web.corpus, {broken: ("session", 1)})
    batch = spark.createDataFrame([(broken,)], ["url"]).coalesce(1)
    row = fetch_with_partition_sessions(batch, fetcher, max_retries=2).collect()[0]
    assert row["fetch_error"] == "" and row["status_code"] == 200


def test_exhausted_retries_surface_the_error(spark):
    """More failures than max_retries: the row is emitted with its final
    error class and status 0 / no content — the engine's empty-content
    path then re-queues it with attempts+1 (the cross-round retry)."""
    from mcp_crawl4ai_rag_spark.sources.synthetic_web import (
        FlakyCorpusSessionFetcher,
    )

    web = generate_web(seed=5, n_hosts=3, n_pages=30, n_seeds=1)
    ok = sorted(u for u, p in web.corpus.items() if p["status_code"] == 200)
    doomed = ok[0]
    fetcher = FlakyCorpusSessionFetcher(web.corpus, {doomed: ("transient", 99)})
    batch = spark.createDataFrame([(doomed,)], ["url"]).coalesce(1)
    row = fetch_with_partition_sessions(batch, fetcher, max_retries=1).collect()[0]
    assert row["fetch_error"] == "transient"
    assert row["status_code"] == 0 and list(row["spans"]) == []


def test_crawl_with_flaky_fetcher_matches_oracle(spark, tmp_path):
    """e2e: the BFS crawl through a fetcher that injects transient AND
    session errors (all recovered in-partition within max_retries) must
    still equal the simulator bit-for-bit — failures that the seam
    absorbs are invisible to the determinism contract."""
    from mcp_crawl4ai_rag_spark.sources.synthetic_web import (
        FlakyCorpusSessionFetcher,
    )

    web = generate_web(seed=13, n_hosts=5, n_pages=90, n_seeds=2)
    ok = sorted(u for u, p in web.corpus.items() if p["status_code"] == 200)
    fail_plan = {ok[0]: ("transient", 1), ok[3]: ("session", 1),
                 ok[7]: ("transient", 2)}
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark,
        tmp_path,
        web,
        batch_size=25,
        host_budgets=budgets,
        fetcher=FlakyCorpusSessionFetcher(web.corpus, fail_plan),
    )
    assert_equivalent(sim, eng)
