"""PII scrubbing: planted-example redaction, per-kind counts, idempotence,
clean-text no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.text import count_pii, scrub_pii


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


CASES = [
    (1, "contact bob.smith+spam@sub.example.co.uk for details",
        "contact <EMAIL> for details", (1, 0, 0)),
    (2, "server at 10.0.0.1 and 192.168.255.254 down",
        "server at <IP> and <IP> down", (0, 2, 0)),
    (3, "call +4915123456789 now", "call <PHONE> now", (0, 0, 1)),
    (4, "a@b.io then 8.8.8.8 then +12025550143",
        "<EMAIL> then <IP> then <PHONE>", (1, 1, 1)),
    (5, "version 1.2.3 stays, price +5 stays, at sign @ alone stays",
        "version 1.2.3 stays, price +5 stays, at sign @ alone stays",
        (0, 0, 0)),
    (6, "totally clean text", "totally clean text", (0, 0, 0)),
]


def test_scrub_and_counts(spark):
    df = spark.createDataFrame([(i, t) for i, t, _, _ in CASES], ["id", "text"])
    got = {
        r["id"]: (r["scrubbed"], (r["pii"]["emails"], r["pii"]["ipv4"], r["pii"]["phones"]))
        for r in df.select(
            "id",
            scrub_pii(F.col("text")).alias("scrubbed"),
            count_pii(F.col("text")).alias("pii"),
        ).collect()
    }
    for i, _, want_text, want_counts in CASES:
        assert got[i] == (want_text, want_counts), f"case {i}: {got[i]}"


def test_idempotent(spark):
    df = spark.createDataFrame([(i, t) for i, t, _, _ in CASES], ["id", "text"])
    once = df.select("id", scrub_pii(F.col("text")).alias("s"))
    twice = once.select("id", scrub_pii(F.col("s")).alias("s"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # and the scrubbed text reports zero PII
    z = twice.select(count_pii(F.col("s")).alias("p")).collect()
    assert all(r["p"]["emails"] == r["p"]["ipv4"] == r["p"]["phones"] == 0 for r in z)
