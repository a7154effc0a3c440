"""Sequence packing: both branches (bounded window vs distributed
prefix-sum) against a Python cumsum oracle, on a multi-partition input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.packing import pack_offsets
from mcp_crawl4ai_rag_spark.operators.ranking import with_global_cumsum


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _mk(spark, n=500):
    rows = [(i, (i * 37) % 90 + 11) for i in range(n)]  # tokens in [11, 100]
    return rows, spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)


def _oracle(rows, seq_len):
    out, acc = {}, 0
    for i, t in sorted(rows):
        out[i] = (acc, acc // seq_len, acc % seq_len)
        acc += t
    return out


@pytest.mark.parametrize("threshold", [0, 1_000_000])
def test_pack_offsets_both_branches(spark, threshold):
    rows, df = _mk(spark)
    got = {
        r["doc_id"]: (r["token_offset"], r["seq_id"], r["offset_in_seq"])
        for r in pack_offsets(
            df, "n_tokens", ["doc_id"], seq_len=512,
            rank_window_threshold=threshold,
        ).collect()
    }
    assert got == _oracle(rows, 512)


def test_cumsum_exclusive_and_exact(spark):
    rows, df = _mk(spark, 300)
    summed, pinned = with_global_cumsum(df, "n_tokens", ["doc_id"])
    got = {r["doc_id"]: r["__cumsum"] for r in summed.collect()}
    pinned.unpersist()
    acc = 0
    for i, t in sorted(rows):
        assert got[i] == acc
        acc += t
