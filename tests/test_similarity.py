"""ANN: brute-force exactness and IVF recall."""

from __future__ import annotations

from mcp_crawl4ai_rag_spark.functions.embedding import hash_embed_py
from mcp_crawl4ai_rag_spark.operators import similarity as SIM


def build(spark, n=300, dim=16):
    items = spark.createDataFrame(
        [(i, hash_embed_py(f"item {i}", dim)) for i in range(n)],
        "vec_id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(q, hash_embed_py(f"item {q * 31}", dim)) for q in range(5)],
        "query_id int, query_vec array<float>",
    )
    return items, queries


def py_topk(items, queries, k):
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    out = {}
    for qid, qv in queries:
        scored = sorted(
            ((cos(v, qv), -i) for i, v in items), key=lambda t: (-t[0], -t[1])
        )
        out[qid] = [int(-t[1]) for t in scored[:k]]
    return out


def test_brute_force_exact(spark):
    items, queries = build(spark)
    got = SIM.brute_force_topk(items, queries, k=5).collect()
    items_py = [(r["vec_id"], r["embedding"]) for r in items.collect()]
    queries_py = [(r["query_id"], r["query_vec"]) for r in queries.collect()]
    want = py_topk(items_py, queries_py, 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == want


def test_ivf_recall(spark):
    items, queries = build(spark, n=400)
    exact = SIM.brute_force_topk(items, queries, k=5).collect()
    approx = SIM.ivf_topk(items, queries, k=5, nlist=8, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_index_partition_pruned(spark, tmp_path):
    """Materialized IVF: cell-partitioned storage, queries read only nprobe
    cells (manifest-level pruning), results match brute force when probing
    every cell and keep recall when probing a fraction."""
    import json
    import os

    items, queries = build(spark, n=400, dim=16)
    idx = SIM.IVFIndex(str(tmp_path), "ivf").build(items, nlist=8)

    # manifest maps every cell to its own partition dir
    m = json.load(open(os.path.join(str(tmp_path), "ivf", "MANIFEST.json")))
    assert m["part_col"] == "cell" and len(m["partitions"]) >= 2

    qvec = [float(x) for x in queries.collect()[0]["query_vec"]]

    # probing ALL cells == exact brute force
    got_all = [
        r["vec_id"] for r in idx.query(spark, qvec, k=10, nprobe=8).collect()
    ]
    exact_ids = py_topk(
        [(r["vec_id"], r["embedding"]) for r in items.collect()],
        [(0, qvec)],
        10,
    )[0]
    assert got_all == exact_ids

    # pruned probe: the scan's file list only contains the probed cells
    from pyspark.sql import functions as F

    res = idx.query(spark, qvec, k=10, nprobe=2)
    probed = idx.table.read(
        spark,
        partitions=[r["cell"] for r in res.select("cell").distinct().collect()],
    )
    files = {
        os.path.dirname(r["f"]).rsplit("cell=", 1)[1]
        for r in probed.select(F.input_file_name().alias("f")).collect()
    }
    assert len(files) <= 2
    # recall@10 with nprobe=2/8 stays useful
    got_pruned = [r["vec_id"] for r in res.collect()]
    overlap = len(set(got_pruned) & set(exact_ids))
    assert overlap >= 5


def test_feature_hash_embed_properties(spark):
    """Hashing-trick featurizer: per-doc weights are unit-L2, buckets in
    range, deterministic, sparse (zero signed counts dropped), and the
    physical plan contains NO Python nodes (pure JVM Columns)."""
    import math

    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.embedding import feature_hash_embed

    docs = [
        (1, "alpha beta gamma alpha ALPHA  beta\tdelta"),
        (2, "one two three four five six seven eight nine ten"),
        (3, ""),            # no tokens: absent from output
        (4, "   \t\n  "),   # whitespace only: absent
        (5, "repeated repeated repeated repeated"),
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    out = feature_hash_embed(df, "text", "id", dim=16)
    rows = out.collect()
    ids = {r["id"] for r in rows}
    assert 3 not in ids and 4 not in ids
    assert {1, 2, 5} <= ids
    assert all(0 <= r["bucket"] < 16 for r in rows)
    # unit L2 norm per doc (6dp rounding tolerance)
    for i in (1, 2, 5):
        norm_sq = sum(r["weight"] ** 2 for r in rows if r["id"] == i)
        assert math.isclose(norm_sq, 1.0, abs_tol=1e-4), (i, norm_sq)
    # determinism
    again = sorted(map(tuple, feature_hash_embed(df, "text", "id", dim=16).collect()))
    assert again == sorted(map(tuple, rows))
    # case folding: 'ALPHA' counts toward 'alpha'
    one = [r for r in rows if r["id"] == 1]
    assert len(one) <= 4  # 4 distinct tokens -> at most 4 buckets
    # pure JVM: no Arrow/Python eval in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
