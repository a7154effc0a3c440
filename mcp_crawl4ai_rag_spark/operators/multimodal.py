"""Multimodal column plumbing: media as opaque binary + typed metadata.

The reference strips media at fetch time (apple_stealth_crawler.py:246,331)
and handles only one media type out-of-band (YouTube subtitles). A
training-data engine must carry media through: this module defines the
Spark-side plumbing — schema, partitioning, Arrow batch shapes — for
decode / feature-extract / resize / frame-sample stages.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub_raises=True`` surfaces a clear
NotImplementedError; the default produces a deterministic fake (hash-derived
dimensions/features) so the distributed plumbing is fully testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, kind string, payload binary, "
    "meta map<string,string>"
)

DECODED_SCHEMA = (
    "doc_id string, media_ref string, kind string, width int, height int, "
    "n_frames int, feature array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for image/audio/video decode."""
    d = hashlib.blake2b(payload or b"", digest_size=16).digest()
    width = 16 + d[0]
    height = 16 + d[1]
    n_frames = 1 if kind == "image" else 1 + d[2]
    rng = np.random.default_rng(int.from_bytes(d[8:], "little"))
    feat = rng.standard_normal(8).astype(np.float32)
    feat /= max(float(np.linalg.norm(feat)), 1e-9)
    return width, height, n_frames, feat.tolist()


def decode_media(
    media: DataFrame,
    decode_stub_raises: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas decode stage: binary payload → dimensions + feature
    vector. Arrow-batched; at scale, repartition by xxhash64(media_ref) to
    even out payload-size skew before the decode pass."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode_stub_raises:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this "
                    "environment — plug a real kernel here"
                )
            rows = [
                _fake_decode(p, k) for p, k in zip(b["payload"], b["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_ref": b["media_ref"],
                    "kind": b["kind"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_frames": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    src = media
    if batch_partitions:
        src = media.repartition(batch_partitions, F.xxhash64("media_ref"))
    return src.mapInPandas(decode, DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (the pixel work happens in the
    decode kernel at scale): emit target dims preserving aspect ratio."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "doc_id",
        "media_ref",
        "kind",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """1 media row → K frame rows (video frame sampling), as a sequence
    explode — the UDTF shape without Python."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return decoded.where(F.col("kind") == "video").select(
        "doc_id", "media_ref", F.explode(frames).alias("frame_idx")
    )


def _sampled_cells(payload: bytes, n_cells: int) -> list[int]:
    """Deterministic stand-in for decode + grayscale-resize: cell i is the
    payload byte at the length-proportional position (i * len) // n_cells
    — LOCALITY-preserving (an in-place byte edit moves only the cells
    whose sample position lands inside it), which is what makes the
    perceptual hashes behave like they would on a real decoder's pixel
    grid. A real deployment swaps this for PIL resize + luma."""
    n = len(payload)
    return [payload[(i * n) // n_cells] for i in range(n_cells)]


def _pack64(bits: list[int]) -> int:
    """Bits (MSB first) → signed 64-bit int (Spark LongType)."""
    val = 0
    for b in bits:
        val = (val << 1) | b
    return val - (1 << 64) if val >= (1 << 63) else val


def dhash64_py(payload: bytes) -> int:
    """dHash (difference hash, Krawetz): 9x8 luma grid, bit (r, c) = 1 iff
    cell (r, c) > cell (r, c+1) — 64 horizontal-gradient bits, robust to
    brightness/scale changes on real images. Grid cells come from the
    deterministic ``_sampled_cells`` stub (no codec in this container);
    every step is recomputable in SQL over ASCII payloads, so the entry
    query `media_dedup_phash` carries an exact DuckDB twin."""
    if not payload:
        return 0
    cells = _sampled_cells(payload, 72)
    bits = []
    for r in range(8):
        row = cells[r * 9 : (r + 1) * 9]
        bits.extend(1 if row[c] > row[c + 1] else 0 for c in range(8))
    return _pack64(bits)


def ahash64_py(payload: bytes) -> int:
    """aHash (average hash): 8x8 grid, bit i = 1 iff cell i is strictly
    above the grid mean. The mean compare is exact integer arithmetic
    (cell * 64 > sum) so a SQL twin needs no float."""
    if not payload:
        return 0
    cells = _sampled_cells(payload, 64)
    total = sum(cells)
    return _pack64([1 if v * 64 > total else 0 for v in cells])


_PHASH_KERNELS = {"dhash": dhash64_py, "ahash": ahash64_py}


def make_phash_udf(method: str = "dhash"):
    """Pandas UDF: binary payload → signed 64-bit perceptual hash."""
    try:
        kernel = _PHASH_KERNELS[method]
    except KeyError:
        raise ValueError(
            f"unknown perceptual hash {method!r}; use one of "
            f"{sorted(_PHASH_KERNELS)}"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def phash(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: kernel(bytes(p) if p is not None else b""))

    return phash


def media_near_duplicates(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    method: str = "dhash",
    max_hamming: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs (id_a, id_b, hamming) —
    the image/frame dedup stage of a 100-TB pipeline, over the multimodal
    payload column.

    One Arrow-batched hash pass (O(items)), then the SAME banded Hamming
    join the text simhash uses (operators/dedup.hamming_near_duplicates):
    with the default n_blocks=8 > max_hamming=6 the pigeonhole makes
    recall 100% on any corpus, so the DuckDB oracle asserts exact
    all-pairs set equality (entry `media_dedup_phash`), like
    `dedup_simhash_md5`. Video frames: run frame_sample_plan first and
    use (media_ref, frame_idx) as the id."""
    from mcp_crawl4ai_rag_spark.operators.dedup import hamming_near_duplicates
    from mcp_crawl4ai_rag_spark.partitioning import (
        LIGHT_KERNEL_BYTES_PER_TASK,
        spread_for_compute,
    )

    # per-payload hash kernel: spread an under-split scan first (§2.5).
    # Light kernel → byte floor (tiny corpora keep exchange-free plans).
    media = spread_for_compute(
        media, id_col, min_bytes_per_task=LIGHT_KERNEL_BYTES_PER_TASK
    )
    hashed = media.select(
        F.col(id_col).alias("id"),
        make_phash_udf(method)(F.col(payload_col)).alias("ph"),
    )
    return hamming_near_duplicates(hashed, "ph", "id", max_hamming, n_blocks)


def media_from_spans(documents: DataFrame) -> DataFrame:
    """Pull media spans out of span documents into the media table shape
    (payload empty here — fetch of binaries is a separate source)."""
    return documents.select(
        F.col("url").alias("doc_id"),
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == "media")
        ).alias("span"),
    ).select(
        "doc_id",
        F.col("span.media_ref").alias("media_ref"),
        F.lit("image").alias("kind"),
        F.encode(F.col("span.media_ref"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("offset"), F.col("span.offset").cast("string")
        ).alias("meta"),
    )
