"""Training-data export: interleaved span documents ↔ sharded JSONL.

The engine's document model is the interleaved text+media span sequence
(kind, text, media_ref, offset) the north rule prescribes. A training
pipeline consumes that as sharded JSONL (one document per line, spans in
order); this module is the sink/source pair:

- ``export_jsonl``: deterministic shard assignment pmod(xxhash64(key),
  n_shards) → written as a ``shard=N`` partitioned text dataset of
  ``to_json`` lines. Pure DataFrameWriter — no driver-side iteration, no
  per-row Python; shard count decouples file layout from the upstream
  partitioning.
- ``read_jsonl``: reads the dataset back with the exact span schema and
  restores span order (spans are serialized in array order; JSON keeps
  it).

Round-trip span-sequence equality (kind, text, media_ref, order — the
per-row invariant the north rule names) is pinned by
tests/test_export.py against crawled documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "url string, host string, depth int, fetch_round int, seq_in_round int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def export_jsonl(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    key_col: str = "url",
) -> None:
    """Write interleaved span documents as shard-partitioned JSONL."""
    cols = [c for c in docs.columns]
    out = docs.select(
        F.pmod(F.xxhash64(key_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    (
        out.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str = SPAN_SCHEMA) -> DataFrame:
    """Read a JSONL export back into the span-document shape."""
    raw = spark.read.text(path)
    return raw.select(F.from_json(F.col("value"), schema).alias("d")).select("d.*")


def media_manifest(docs: DataFrame) -> DataFrame:
    """Distinct media references with usage counts — the fetch list a
    media-resolution stage consumes (media bytes live outside the text
    export; spans carry refs)."""
    return (
        docs.select(F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .groupBy(F.col("span.media_ref").alias("media_ref"))
        .agg(F.count("*").alias("n_uses"))
    )
