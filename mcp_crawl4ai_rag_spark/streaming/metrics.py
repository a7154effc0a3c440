"""Streaming crawl metrics: event-time windowed aggregation with
watermarked late-data handling.

The batch engine writes per-round metrics (A7) from synchronous BFS
rounds. In continuous mode, fetch completions arrive as a stream with
event-time skew (a slow host's results land minutes after fast ones), so
the rollup becomes the canonical watermark + window pattern:

- ``withWatermark(ts, late_threshold)`` bounds state: windows older than
  the watermark finalize, emit once (append mode), and their state is
  dropped — without it, per-window state grows forever at 10^10 scale;
- events later than the watermark are dropped by contract (the same rows
  in batch mode would land in an already-published round metric — a
  monotonicity guarantee downstream consumers rely on);
- aggregation is per (window, host, outcome): map-side partial aggregation
  applies, shuffle is on the (window, host) key — uniform unless one host
  dominates, which politeness already bounds upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_EVENT_SCHEMA = "host string, outcome string, ts timestamp"


def windowed_fetch_metrics(
    events: DataFrame,
    window: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Fetch-event stream → finalized per-window per-host outcome counts.

    Works on both streaming and batch frames (batch ignores the watermark
    — handy for differential tests against the streaming result).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", late_threshold)
    return (
        src.groupBy(F.window("ts", window), "host", "outcome")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "host",
            "outcome",
            "n",
        )
    )
