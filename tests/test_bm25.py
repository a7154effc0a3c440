"""BM25 ranking: exact differential vs a pure-Python implementation of the
same formula (Robertson-Sparck Jones idf, k1/b length normalization)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.search import bm25_rank


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


DOCS = [
    (1, "spark shuffle join broadcast join join"),
    (2, "hash join partition shuffle skew salt"),
    (3, "filter scan parquet pushdown column prune"),
    (4, "join"),
    (5, "unrelated words entirely here nothing matches"),
    (6, "broadcast broadcast broadcast tiny dim table join"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s, m = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            out[i] = (round(s, 6), m)
    return out


def test_bm25_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["id", "content"])
    terms = ["join", "broadcast", "missingterm"]
    got = {
        r["id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_rank(df, terms, k=10).collect()
    }
    want = _py_bm25(DOCS, terms)
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1]
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6)


def test_bm25_ordering_and_limit(spark):
    df = spark.createDataFrame(DOCS, ["id", "content"])
    top = bm25_rank(df, ["join"], k=2).collect()
    assert len(top) == 2
    # doc 1 has tf=3 (vs tf=1 elsewhere): saturation hasn't overcome the
    # raw-count advantage, so it outranks even the 1-token doc 4
    assert top[0]["id"] == 1
    assert top[1]["id"] == 4
    assert top[0]["score"] > top[1]["score"]


def test_bm25_case_insensitive(spark):
    df = spark.createDataFrame([(1, "JOIN Join join"), (2, "scan scan")], ["id", "content"])
    got = bm25_rank(df, ["JOIN"], k=5).collect()
    assert [r["id"] for r in got] == [1]


def test_rag_query_bm25_tier(spark):
    """rag_query(keyword_ranker='bm25') merges with BM25 relevance order
    in the keyword tier; ilike parity path is unchanged."""
    from mcp_crawl4ai_rag_spark.functions.embedding import make_hash_embed_udf
    from mcp_crawl4ai_rag_spark.operators.search import rag_query

    rows = [
        (i, f"https://d/{i}", t)
        for i, t in [
            (1, "spark shuffle join broadcast join join"),
            (2, "hash join partition shuffle skew salt"),
            (3, "filter scan parquet pushdown column prune"),
            (4, "join tuning guide"),
            (5, "unrelated words entirely here"),
        ]
    ]
    chunks = (
        spark.createDataFrame(rows, ["id", "url", "content"])
        .withColumn("embedding", make_hash_embed_udf(16)(F.col("content")))
        .cache()
    )
    bm = rag_query(chunks, "join broadcast", k=4, keyword_ranker="bm25", embed_dim=16)
    il = rag_query(chunks, "join broadcast", k=4, keyword_ranker="ilike", embed_dim=16)
    assert bm.count() > 0 and il.count() > 0
    assert set(bm.columns) == set(il.columns)
    # ilike's keyword tier needs the literal substring 'join broadcast'
    # — only doc 1 has it; bm25's term-level tier also credits docs that
    # match 'join' OR 'broadcast' individually (2, 4, 6-style docs)
    il_kw = {r["id"] for r in il.collect() if r["tier"] in (0, 2)}
    bm_kw = {r["id"] for r in bm.collect() if r["tier"] in (0, 2)}
    assert il_kw == {1}
    assert {2, 4} <= bm_kw
