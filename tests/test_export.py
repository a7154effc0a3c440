"""JSONL export/read round-trip for interleaved span documents.

The north-rule per-row invariant is span-sequence equality
(kind, text, media_ref, order) — asserted here across a full
export → read cycle on real crawled documents, plus shard determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mcp_crawl4ai_rag_spark.operators import export as X
from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="module")
def crawled_docs(spark, tmp_path_factory):
    web = generate_web(seed=5, n_hosts=2, n_pages=40)
    hosts = spark.createDataFrame(
        [(h, 100.0, 100.0) for h in {u.split("/")[2] for u in web.corpus}],
        "host string, capacity double, refill_rate double",
    )
    eng = CrawlEngine(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        hosts,
        str(tmp_path_factory.mktemp("crawl")),
        batch_size=8,
        max_attempts=2,
    )
    eng.seed(web.seeds)
    eng.run(max_rounds=6)
    return eng.documents().select(
        "url", "host", "depth", "fetch_round", "seq_in_round", "spans"
    )


def _span_seqs(df):
    rows = df.select("url", "spans").collect()
    return {
        r["url"]: [
            (s["kind"], s["text"], s["media_ref"], i)
            for i, s in enumerate(r["spans"] or [])
        ]
        for r in rows
    }


def test_export_roundtrip_span_equality(spark, crawled_docs, tmp_path):
    path = str(tmp_path / "export")
    X.export_jsonl(crawled_docs, path, n_shards=4)
    back = X.read_jsonl(spark, path)
    assert back.count() == crawled_docs.count()
    assert _span_seqs(back) == _span_seqs(crawled_docs)
    # scalar fields survive too
    a = {tuple(r) for r in crawled_docs.drop("spans").collect()}
    b = {tuple(r) for r in back.drop("spans").collect()}
    assert a == b


def test_export_shards_deterministic(spark, crawled_docs, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    X.export_jsonl(crawled_docs, p1, n_shards=4)
    X.export_jsonl(crawled_docs, p2, n_shards=4)
    for shard in range(4):
        s1 = {
            r["value"]
            for r in spark.read.text(f"{p1}/shard={shard}").collect()
        }
        s2 = {
            r["value"]
            for r in spark.read.text(f"{p2}/shard={shard}").collect()
        }
        assert s1 == s2
    # every document landed in exactly one shard
    total = sum(
        spark.read.text(f"{p1}/shard={s}").count() for s in range(4)
    )
    assert total == crawled_docs.count()


def test_media_manifest(spark, crawled_docs):
    man = X.media_manifest(crawled_docs).collect()
    refs = {r["media_ref"] for r in man}
    assert all(r is not None for r in refs)
    # counts agree with a direct explode
    direct = (
        crawled_docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .count()
    )
    assert sum(r["n_uses"] for r in man) == direct
