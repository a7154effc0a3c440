"""ChunkStore (S7/S8 snapshot maintenance) + full RAG query pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.processor import ChunkStore
from mcp_crawl4ai_rag_spark.operators.search import rag_query


def docs(spark):
    rows = [
        ("https://a/1", 1, 0, "# Metal\n" + "metal shader rendering. " * 150),
        ("https://a/2", 1, 1, "# Swift\n" + "swift views layout. " * 150),
        ("https://a/3", 2, 0, "# Audio\naudio engine basics here."),
    ]
    return spark.createDataFrame(
        rows, "url string, fetch_round int, seq_in_round int, content string"
    )


def test_chunkstore_lifecycle(spark, tmp_path):
    store = ChunkStore(spark, str(tmp_path))
    n1 = store.process_round(docs(spark), embed_dim=16)
    assert n1 > 0
    assert store.read().count() == n1
    # idempotent: everything already processed (anti-join skips)
    assert store.process_round(docs(spark), embed_dim=16) == 0
    # S8: cascade delete one url
    before = store.read().where(F.col("url") == "https://a/1").count()
    assert before > 0
    store.delete_urls(spark.createDataFrame([("https://a/1",)], ["url"]))
    assert store.read().where(F.col("url") == "https://a/1").count() == 0
    assert store.read().count() == n1 - before
    # re-process restores it
    n2 = store.process_round(docs(spark), embed_dim=16)
    assert n2 == before
    # replace_urls: MERGE semantics
    repl = spark.createDataFrame(
        [("https://a/2", 0, "c", "new", "{}", [0.0] * 16)],
        "url string, chunk_index int, context string, content string, "
        "chunk_json string, embedding array<float>",
    )
    store.replace_urls(repl)
    a2 = store.read().where(F.col("url") == "https://a/2").collect()
    assert len(a2) == 1 and a2[0]["content"] == "new"


def test_rag_query_pipeline(spark, tmp_path):
    store = ChunkStore(spark, str(tmp_path))
    store.process_round(docs(spark), embed_dim=16)
    chunks = store.read().withColumn(
        "id", F.xxhash64(F.col("url"), F.col("chunk_index"))
    )
    res = rag_query(chunks, "metal shader", k=3, hybrid=True, embed_dim=16).collect()
    assert 0 < len(res) <= 3
    # keyword hits on 'metal' should surface tier-0/2 rows from url a/1
    assert any("metal" in r["content"] for r in res)
    # vector-only mode
    res_v = rag_query(chunks, "metal shader", k=3, hybrid=False, embed_dim=16).collect()
    assert len(res_v) == 3
    # rerank adds a deterministic score column
    res_r = rag_query(chunks, "metal shader", k=3, rerank=True, embed_dim=16).collect()
    assert all(r["rerank_score"] is not None for r in res_r)


def test_rag_query_2560_dim_blas_path(spark, tmp_path):
    """e2e hybrid RAG at the reference's production dimensionality (2560,
    src/embedding/config.py:24): the similarity kernel dispatches to the
    Arrow/BLAS matvec (dim >= BLAS_DIM_THRESHOLD) inside the FULL pipeline
    — vector top-2k + keyword tier + tiered merge — not just vector_topk
    in isolation. Cross-checks the BLAS scores against the exact Column
    fold on the same data."""
    from mcp_crawl4ai_rag_spark.functions.embedding import (
        cosine_sim,
        embed_query_py,
    )
    from mcp_crawl4ai_rag_spark.operators.search import BLAS_DIM_THRESHOLD

    store = ChunkStore(spark, str(tmp_path))
    store.process_round(docs(spark), embed_dim=2560)
    chunks = store.read().withColumn(
        "id", F.xxhash64(F.col("url"), F.col("chunk_index"))
    )
    assert 2560 >= BLAS_DIM_THRESHOLD
    res = rag_query(chunks, "metal shader", k=3, hybrid=True, embed_dim=2560)
    rows = res.collect()
    assert 0 < len(rows) <= 3
    assert any("metal" in r["content"] for r in rows)
    # BLAS matvec similarity == exact JVM fold similarity (rounded: the
    # fold sums sequentially, BLAS pairwise — equal to float tolerance)
    qvec = embed_query_py("metal shader", 2560)
    exact = {
        r["id"]: r["s"]
        for r in chunks.select(
            "id", cosine_sim(F.col("embedding"), qvec).alias("s")
        ).collect()
    }
    for r in rows:
        if r["tier"] == 1:  # pure vector tier: similarity is the raw cosine
            assert abs(r["similarity"] - exact[r["id"]]) < 1e-6
        elif r["tier"] == 0 and r["similarity"] < 1.0 - 1e-9:
            # boosted tier stores min(raw * 1.2, 1.0); reconstruction is
            # exact whenever the cap did not bite
            assert abs(r["similarity"] / 1.2 - exact[r["id"]]) < 1e-6
