"""Legacy chunker branches + T4 dual-chunk differential harness."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions import chunking_legacy as L
from mcp_crawl4ai_rag_spark.functions.chunking import smart_chunk_text
from tests.test_chunking import synth_doc


def test_short_doc_single_chunk():
    out = L.legacy_chunk_text("ctx\n# Title\nbody")
    assert len(out) == 1
    p = json.loads(out[0])
    assert p["context"] == "ctx" and p["content"].startswith("# Title")
    assert L.legacy_chunk_text("") == []


def test_header_cascade_levels():
    # H1 cascade needs >= 2 H1 sections
    doc = "# A\n" + "x" * 2600 + "\n# B\n" + "y" * 200
    out = L.legacy_chunk_text(doc)
    assert len(out) == 2
    # one H1 only → falls through to H2 split
    doc2 = "# A\n" + "## S1\n" + "x" * 2600 + "\n## S2\n" + "y" * 300
    out2 = L.legacy_chunk_text(doc2)
    assert len(out2) >= 2
    # at the H2 level, everything before the first '## ' becomes context
    assert json.loads(out2[0])["context"] == "# A"


def test_greedy_merge_json_size_criterion():
    # many small sections merge until the JSON budget trips
    secs = [f"## S{i}\n" + "word " * 100 for i in range(10)]
    doc = "\n".join(secs)
    out = L.legacy_chunk_text(doc)
    for cj in out:
        assert len(cj) <= L.MAX_CHUNK_SIZE + 600  # last chunk may exceed
    # concatenation preserves every section header
    joined = "".join(json.loads(c)["content"] for c in out)
    for i in range(10):
        assert f"## S{i}" in joined


def test_newline_fallback():
    # no headers at all, long → newline split path
    rng = random.Random(5)
    doc = "\n".join(
        " ".join("w%d" % rng.randint(0, 50) for _ in range(12)) for _ in range(400)
    )
    assert len(doc) > L.TARGET_CHUNK_SIZE
    out = L.legacy_chunk_text(doc)
    assert len(out) == max(1, len(doc.strip()) // L.TARGET_CHUNK_SIZE)
    total = sum(len(json.loads(c)["content"]) for c in out)
    assert total >= 0.95 * len(doc.strip())


def test_spark_legacy_matches_oracle(spark):
    rng = random.Random(77)
    docs = [(f"u{i}", synth_doc(rng)) for i in range(40)]
    df = spark.createDataFrame(docs, ["url", "content"])
    got = (
        df.select("url", L.legacy_chunk_udf(F.col("content")).alias("chunks"))
        .orderBy("url")
        .collect()
    )
    want = {u: L.legacy_chunk_text(t) for u, t in docs}
    for r in got:
        assert list(r["chunks"]) == want[r["url"]], r["url"]


def test_dual_chunk_differential(spark):
    """T4: the differential harness — unchanged docs are skipped, docs
    where the two chunkers disagree are selected for re-chunking."""
    rng = random.Random(123)
    docs = [(f"u{i}", synth_doc(rng)) for i in range(30)]
    df = spark.createDataFrame(docs, ["url", "content"])
    targets = {
        r["url"]
        for r in L.differential_rechunk_targets(df).select("url").collect()
    }
    want = {
        u for u, t in docs if smart_chunk_text(t) != L.legacy_chunk_text(t)
    }
    assert targets == want
    assert want, "fixture should produce at least one differing doc"


def test_content_integrity_column(spark):
    rng = random.Random(9)
    docs = [(f"u{i}", synth_doc(rng)) for i in range(20)]
    df = spark.createDataFrame(docs, ["url", "content"])
    from mcp_crawl4ai_rag_spark.functions.chunking import smart_chunk_udf

    bad = (
        df.withColumn("chunks", smart_chunk_udf(F.col("content")))
        .where(F.size("chunks") > 0)
        .where(L.content_integrity_violation(F.col("content"), F.col("chunks")))
        .count()
    )
    # smart chunker loses only context + strip whitespace: a few violations
    # are possible for context-heavy docs, but most must pass
    assert bad <= len(docs) * 0.3
