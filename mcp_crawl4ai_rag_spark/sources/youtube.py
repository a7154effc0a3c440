"""Media (YouTube subtitle) document source — S12.

The reference extracts subtitles to JSON files
({"context": <video title>, "content": <subtitle text>},
youtube_subtitles_extractor/extract_subtitles.py:31-60) and imports them
as pages with url = https://www.youtube.com/watch?v={id} and content =
that JSON string (import_to_database.py:10-15,38-80).

Here: spark.read.json over the subtitle directory → normalized media
document rows + span form (kind='media' lead span carrying the video
ref, then the subtitle text span) so media docs flow through the same
span pipeline as web docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATCH_PREFIX = "https://www.youtube.com/watch?v="


def read_subtitle_dir(
    spark: SparkSession, path: str, video_id_col: str | None = None
) -> DataFrame:
    """JSON subtitle files → (url, title, content). The video id comes from
    an explicit column when present, else the file stem (the reference
    keys files by video id)."""
    raw = spark.read.json(path)
    if video_id_col and video_id_col in raw.columns:
        vid = F.col(video_id_col)
    else:
        vid = F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1)
    return raw.select(
        F.concat(F.lit(WATCH_PREFIX), vid).alias("url"),
        F.col("context").alias("title"),
        F.col("content").alias("content"),
    )


def media_documents_as_spans(media_docs: DataFrame) -> DataFrame:
    """(url, title, content) → span-document shape: a media span for the
    video ref followed by a text span with the subtitle text (the engine's
    interleaved text+media model; the reference flattens this into a JSON
    string instead)."""
    spans = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.col("url").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("content").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
    )
    return media_docs.select(
        "url",
        "title",
        spans.alias("spans"),
        # P12: media embedding text assembly (youtube_processor.py:105-116)
        F.concat_ws("\n\n", F.col("title"), F.col("content")).alias("embed_text"),
    )


def display_url(col) -> "F.Column":
    """P11: UI display simplification (frontend/api.py:47-51)."""
    simplified = F.regexp_replace(
        col, r"^https://developer\.apple\.com/documentation/", "docs:"
    )
    return F.regexp_replace(simplified, r"^https://www\.youtube\.com/watch\?v=", "yt:")


def token_accounting(df: DataFrame, text_col: str) -> DataFrame:
    """A8: cumulative token metric for embedding jobs
    (local_qwen3.py:60-64) — whitespace-token proxy."""
    from mcp_crawl4ai_rag_spark.functions.text import token_count

    return df.agg(
        F.sum(token_count(F.col(text_col))).alias("total_tokens"),
        F.count("*").alias("total_texts"),
    )
