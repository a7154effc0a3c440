"""Scan-width guard for compute-heavy stages.

Parquet scans parallelize at row-group granularity: a table written as a
handful of row groups (the sf test tables arrive as 1-6) feeds every
downstream narrow stage — per-row hash kernels, regex scoring, shingle
explodes — to 1-6 tasks no matter how many cores the session has. The
guide's input-skew rule ("one huge unsplittable file → repartition
immediately after the read", spark_optimization_guide.md §2.5) applies:
re-spread the rows once, cheaply (the narrow source columns, not the
derived work), before the expensive stage.

``spread_for_compute`` is a NO-OP whenever the input already plans at
least ``target`` partitions — at cluster scale real inputs arrive as
thousands of splits, so this guard costs nothing there; it only fires on
under-split scans, where one extra exchange of the raw rows buys full-
width execution of everything downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compute_barrier(col: Column) -> Column:
    """Value-identity wrapper flagged non-deterministic.

    ``shuffle()`` of a one-element array returns that element — the value
    is unchanged for every input — but the non-deterministic flag stops
    Catalyst from (a) substituting the defining expression into every
    downstream filter conjunct (codegen splits conjuncts, so an expensive
    derived column would otherwise be re-evaluated once per conjunct) and
    (b) pushing those filters back below the exchange that spreads the
    rows. Use on expensive derived columns that feed multi-clause
    filters; the column is then computed exactly once per row."""
    return F.shuffle(F.array(col))[0]


# Floor for LIGHT per-row kernels (simhash, phash, the media chunker):
# below ~64 KiB of input per task, the spread exchange costs more than
# the parallelism saves (measured ~+0.2 s per query at sf0.1), while
# above it the win dominates (10-20x at sf1.0). Heavy kernels (minhash
# signatures, shingle/gram explodes, padded-dup scoring) pass no floor:
# their per-byte cost makes the exchange worthwhile even on sub-MB
# inputs (measured 2-4x wins at sf0.1).
LIGHT_KERNEL_BYTES_PER_TASK = 64 * 1024


def spread_for_compute(
    df: DataFrame,
    *key_cols: str,
    target: int | None = None,
    min_bytes_per_task: int = 0,
) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: session parallelism)
    partitions iff it currently plans fewer — hash-partitioned on
    ``key_cols`` when given (no sort-before-repartition pass), round-robin
    otherwise. Row content is unchanged; only placement moves.

    ``min_bytes_per_task``: skip the spread when the optimizer's size
    estimate divided by ``target`` falls below this — callers with light
    per-row kernels use ``LIGHT_KERNEL_BYTES_PER_TASK`` so tiny inputs
    keep their exchange-free plans."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes_per_task:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if est < min_bytes_per_task * target:
            return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
