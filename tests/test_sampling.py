"""Deterministic stratified sampling: exact differential vs a hashlib
oracle, rate monotonicity, salt independence, and plan shape (no
shuffle — the filter must stay a narrow op over the scan)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.sampling import (
    rate_threshold_hex,
    sample_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def spark():
    from mcp_crawl4ai_rag_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr", "zz"][i % 4]) for i in range(4000)]
    return spark.createDataFrame(rows, ["doc_id", "lang"]).cache()


def _oracle_keep(key: int, rate: float, salt: str = "") -> bool:
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()[:12]
    return h < rate_threshold_hex(rate)


RATES = {"en": 0.5, "de": 0.25, "fr": 0.0}


def test_exact_differential_vs_hashlib(docs):
    got = {
        r["doc_id"]
        for r in stratified_sample(
            docs, RATES, "lang", "doc_id", default_rate=0.1, salt="s1"
        ).collect()
    }
    want = set()
    for i in range(4000):
        lang = ["en", "de", "fr", "zz"][i % 4]
        if _oracle_keep(i, RATES.get(lang, 0.1), "s1"):
            want.add(i)
    assert got == want
    # rate sanity: each stratum has 1000 candidates
    langs = {i: ["en", "de", "fr", "zz"][i % 4] for i in range(4000)}
    per = {"en": 0, "de": 0, "fr": 0, "zz": 0}
    for i in got:
        per[langs[i]] += 1
    assert per["fr"] == 0
    assert 400 <= per["en"] <= 600
    assert 175 <= per["de"] <= 325
    assert 60 <= per["zz"] <= 140


def test_rate_monotonicity(docs):
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.2}, "lang", "doc_id").collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.6}, "lang", "doc_id").collect()
    }
    assert small <= big
    assert len(small) < len(big)


def test_salt_draws_independent_sample(docs):
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.5}, "lang", "doc_id", salt="a").collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.5}, "lang", "doc_id", salt="b").collect()
    }
    assert a != b
    # overlap ≈ rate^2 * 1000 = 250 of 1000 en docs; loose bounds
    assert 100 <= len(a & b) <= 400


def test_determinism_and_hash_col(docs):
    s1 = stratified_sample(docs, RATES, "lang", "doc_id", hash_col="h").collect()
    s2 = stratified_sample(docs, RATES, "lang", "doc_id", hash_col="h").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    for r in s1:
        assert r["h"] == hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12]


def test_threshold_edges():
    assert rate_threshold_hex(0.0) == "000000000000"
    assert rate_threshold_hex(1.0) == "g"
    with pytest.raises(ValueError):
        rate_threshold_hex(1.5)


def test_plan_is_narrow_filter(docs):
    plan = stratified_sample(docs, RATES, "lang", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure filter over the scan
