"""Unicode NFC normalization + control-char stripping: differential vs
unicodedata, idempotence, and NFC/NFD equivalence collapse."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.text import (
    make_unicode_normalize_udf,
    strip_control_chars,
)


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


TEXTS = [
    (1, "café latte"),          # e + combining acute -> é
    (2, "café latte"),            # precomposed é (already NFC)
    (3, "Ångström"),      # Å + ö from combining marks
    (4, "① plain ascii stays"),   # circled one: NFC-invariant
    (5, "ﬁne"),                        # ligature fi: NFC keeps, NFKC would split
]


def test_nfc_matches_unicodedata(spark):
    df = spark.createDataFrame(TEXTS, ["id", "text"])
    norm = make_unicode_normalize_udf("NFC")
    got = {r["id"]: r["n"] for r in df.select("id", norm(F.col("text")).alias("n")).collect()}
    for i, t in TEXTS:
        assert got[i] == unicodedata.normalize("NFC", t)
    # NFC collapses the decomposed/precomposed distinction
    assert got[1] == got[2]


def test_nfc_idempotent_and_nfkc_differs(spark):
    df = spark.createDataFrame(TEXTS, ["id", "text"])
    nfc = make_unicode_normalize_udf("NFC")
    once = df.select("id", nfc(F.col("text")).alias("n"))
    twice = once.select("id", nfc(F.col("n")).alias("n"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    nfkc = make_unicode_normalize_udf("NFKC")
    got = {r["id"]: r["n"] for r in df.select("id", nfkc(F.col("text")).alias("n")).collect()}
    assert got[5] == "fine"  # ligature decomposed by compatibility form


def test_strip_control_chars(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x07c\tkeep\nme\rok\x1fz")], ["id", "text"]
    )
    got = df.select(strip_control_chars(F.col("text")).alias("s")).first()["s"]
    assert got == "abc\tkeep\nme\rokz"
