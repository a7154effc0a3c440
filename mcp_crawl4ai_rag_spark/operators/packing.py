"""Sequence packing for LLM training (concat-and-chunk layout).

Training pipelines lay documents end-to-end in a deterministic order and
cut the token stream into fixed-length sequences; each document therefore
starts at a global token offset and lands in sequence
``floor(offset / seq_len)`` at position ``offset % seq_len`` (GPT-style
packing — documents may straddle sequence boundaries; the EOD token
bookkeeping is a tokenizer concern, not a layout one).

The only non-trivial part at 100 TB is the global prefix sum over token
counts, which must NOT be a single-partition window — it runs as the
two-stage distributed cumsum in operators/ranking.with_global_cumsum
(range partition + local cumsum + O(partitions) driver offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.ranking import with_global_cumsum


def pack_offsets(
    df: DataFrame,
    token_col: str,
    order_cols: list,
    seq_len: int,
    rank_window_threshold: int = 10_000,
) -> DataFrame:
    """Assign each document its packed position: global token offset,
    sequence id, and offset within the sequence.

    Deterministic for a given ``order_cols`` total order. Small frames
    (<= rank_window_threshold rows, known only if the caller says so via
    a cheap count) still use the distributed path — the threshold exists
    so tests can force either branch explicitly with 0 / a huge value.
    """
    if rank_window_threshold and df.limit(rank_window_threshold + 1).count() <= rank_window_threshold:
        from pyspark.sql import Window

        w = (
            Window.orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = df.withColumn(
            "token_offset",
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"),
        )
        pinned = None
    else:
        out, pinned = with_global_cumsum(df, token_col, order_cols, "token_offset")
    result = out.select(
        *[F.col(c) for c in df.columns],
        "token_offset",
        F.floor(F.col("token_offset") / seq_len).cast("long").alias("seq_id"),
        (F.col("token_offset") % seq_len).cast("long").alias("offset_in_seq"),
    )
    if pinned is not None:
        result = result.localCheckpoint(eager=True)
        pinned.unpersist()
    return result
