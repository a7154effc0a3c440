"""Continuous-mode ingestion via Structured Streaming.

The reference's crawler never terminates — its supplier polls forever
(core.py:268-269). Batch BFS rounds (operators/crawl.py) replay a crawl
deterministically; this module is the *continuous* complement: a stream of
discovered links (files of JSON lines — in production a Kafka topic of
fetcher output) is canonicalized, filtered, deduplicated against the
frontier snapshot and appended, in micro-batches via foreachBatch.

foreachBatch (rather than a stateful streaming dedup) is deliberate:
the seen-set already lives in the frontier snapshot table + bloom filter,
and reusing the batch dedup operator keeps exactly-once semantics in the
snapshot commit (idempotent per epoch) instead of in opaque state stores.
A watermark would only matter for event-time windows, which frontier
admission doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.urls import canonicalize_url, is_malformed
from mcp_crawl4ai_rag_spark.operators.dedup import new_urls
from mcp_crawl4ai_rag_spark.operators.politeness import robots_allowed, with_host_and_path
from mcp_crawl4ai_rag_spark.plans.snapshots import SnapshotTable

LINK_STREAM_SCHEMA = "href string, parent_url string, depth int"


def admit_links_batch(
    batch: DataFrame, frontier: DataFrame, robots: DataFrame, base_seq: int
) -> DataFrame:
    """One micro-batch of raw links → frontier-insertable rows."""
    cand = (
        batch.withColumn("url", canonicalize_url(F.col("href")))
        .where(~is_malformed(F.col("url")))
        .groupBy("url")
        .agg(F.min(F.col("depth")).alias("depth"))
    )
    cand = robots_allowed(with_host_and_path(cand), robots)
    fresh = new_urls(cand, frontier.select("url"))
    w = Window.orderBy("url")  # deterministic within the epoch
    return fresh.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        "host",
        (F.col("depth") + 1).cast("int").alias("depth"),
        F.lit(0).alias("priority"),
        (F.row_number().over(w) + F.lit(base_seq - 1)).cast("long").alias("seq"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("attempts"),
    )


def start_link_ingest(
    spark: SparkSession,
    links_dir: str,
    workdir: str,
    robots: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream(json files) → foreachBatch(admit + snapshot append)."""
    frontier_tbl = SnapshotTable(workdir, "frontier")

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        frontier = frontier_tbl.read(spark)
        max_seq = frontier.agg(F.max("seq")).collect()[0][0] or 0
        rows = admit_links_batch(batch, frontier, robots, int(max_seq) + 1)
        frontier_tbl.commit(
            frontier.unionByName(rows), partition_by=["state"]
        )

    stream = (
        spark.readStream.schema(LINK_STREAM_SCHEMA)
        .json(links_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()
