"""Similarity search over embedding columns (training-data extension).

- brute-force cosine top-k per query (baseline; numpy matmul per Arrow
  batch — one BLAS call per batch, JVM→Arrow→BLAS, no per-row Python);
- IVF (inverted-file) variant: k-means-ish coarse centroids from a seeded
  sample, candidates restricted to the nprobe nearest centroids — the
  scale path: centroid assignment prunes the candidate set ~nlist/nprobe×;
- sign-LSH bucketed variant for near-dup-style lookup lives in
  operators/dedup.embedding_near_duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors for each query: crossJoin (queries broadcast)
    + cosine + per-query window rank. Queries must be small (broadcast);
    items arbitrarily large — the join is embarrassingly parallel."""
    q = F.broadcast(queries.select(query_id, query_vec))
    from mcp_crawl4ai_rag_spark.functions.embedding import cosine_sim

    scored = items.crossJoin(q).withColumn(
        "cosine", cosine_sim(F.col(item_vec), F.col(query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(item_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, item_id, "cosine", "rank")
    )


def _sample_centroids(
    items: DataFrame, nlist: int, item_vec: str, seed: int = 42,
    item_id: str = "vec_id",
) -> np.ndarray:
    """Deterministic coarse centroids: seeded sample + a few Lloyd steps on
    the driver (sample is tiny; the expensive assignment stays distributed).

    The sample is a hash-threshold filter on the ID column — deterministic
    under any partitioning, no full-table sort, and no per-row vector
    stringification (an earlier orderBy(xxhash64(vec::string)).limit(n)
    compiled to TakeOrderedAndProject but still stringified EVERY vector
    for the heap comparator). The post-filter orderBy runs over ~3x the
    target rows only."""
    target = max(nlist * 20, 200)
    n = items.count()
    h = F.pmod(F.xxhash64(F.col(item_id)), F.lit(1 << 32))
    picked = items.select(h.alias("__h"), item_vec)
    if n > target:
        # 3x oversample: P(filter yields < target of expected 3*target)
        # is negligible for target >= 200 (Chernoff)
        thresh = min(1 << 32, int(3.0 * target * (1 << 32) / n))
        picked = picked.where(F.col("__h") < F.lit(thresh))
    sample = picked.orderBy("__h").limit(target).collect()
    x = np.array([r[item_vec] for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(5):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def make_centroid_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in top])

    return assign


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: items bucketed by nearest centroid (1 assignment
    pass), queries probe their nprobe nearest centroids; exact cosine within
    the probed buckets. At scale the items side is written partitioned by
    cell so a query touches nprobe/nlist of the data (partition pruning)."""
    centroids = _sample_centroids(items, nlist, item_vec)
    item_cell = make_centroid_assign_udf(centroids, 1)
    query_cells = make_centroid_assign_udf(centroids, nprobe)

    from mcp_crawl4ai_rag_spark.functions.embedding import cosine_sim

    bucketed = items.withColumn("cell", item_cell(F.col(item_vec))[0])
    probes = queries.withColumn(
        "cell", F.explode(query_cells(F.col(query_vec)))
    )
    scored = bucketed.join(probes, "cell").withColumn(
        "cosine", cosine_sim(F.col(item_vec), F.col(query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(item_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, item_id, "cosine", "rank")
    )


class IVFIndex:
    """Materialized IVF index: items stored cell-partitioned so queries do
    true partition pruning — the scale path the join-based ``ivf_topk``
    only simulates.

    build(): one distributed assignment pass writes the item table
    partitioned by nearest-centroid cell (SnapshotTable.commit_partitioned
    → manifest cell→path map); centroids persist beside the manifest.
    query(): probes the nprobe nearest cells — ONLY those partitions'
    files are opened (the unread cells are never listed in the scan) —
    then exact BLAS cosine + top-k inside the probed slice. A query
    touches ~nprobe/nlist of the data at any scale.
    """

    def __init__(self, workdir: str, name: str = "ivf"):
        import os

        from mcp_crawl4ai_rag_spark.plans.snapshots import SnapshotTable

        self.table = SnapshotTable(workdir, name)
        self.centroid_path = os.path.join(self.table.dir, "centroids.npy")

    def build(
        self,
        items: DataFrame,
        nlist: int = 16,
        item_id: str = "vec_id",
        item_vec: str = "embedding",
        centroids: np.ndarray | None = None,
    ) -> "IVFIndex":
        """``centroids``: optional pre-computed (n, dim) unit-norm array —
        skips the k-means sampling. With fixed centroids the whole
        build→store→probe path is deterministic argmax-cosine, so it
        carries a full SQL oracle (entry query ``ivf_fixed_ann``); the
        k-means path stays covered by the recall/pruning pytest."""
        if centroids is None:
            centroids = _sample_centroids(items, nlist, item_vec)
        else:
            centroids = np.asarray(centroids, dtype=np.float64)
        assign = make_centroid_assign_udf(centroids, 1)
        bucketed = items.select(item_id, item_vec).withColumn(
            "cell", assign(F.col(item_vec))[0]
        )
        self.table.commit_partitioned(bucketed, "cell")
        with open(self.centroid_path, "wb") as f:
            np.save(f, centroids)
        return self

    def centroids(self) -> np.ndarray:
        with open(self.centroid_path, "rb") as f:
            return np.load(f)

    def query(
        self,
        spark,
        query_vec: list,
        k: int = 5,
        nprobe: int = 4,
        item_id: str = "vec_id",
        item_vec: str = "embedding",
    ) -> DataFrame:
        from mcp_crawl4ai_rag_spark.functions.embedding import make_cosine_batch_udf

        centroids = self.centroids()
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        sims = centroids @ (q / (qn if qn else 1.0))
        cells = [int(c) for c in np.argsort(-sims)[:nprobe]]
        # partition-pruned scan: only the probed cells' files are read
        candidates = self.table.read(spark, partitions=cells)
        cos = make_cosine_batch_udf(list(query_vec))
        return (
            candidates.withColumn("cosine", cos(F.col(item_vec)))
            .orderBy(F.desc("cosine"), F.asc(item_id))
            .limit(k)
            .select(item_id, "cosine", "cell")
        )
