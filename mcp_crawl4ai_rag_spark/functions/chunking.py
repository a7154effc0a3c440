"""Document chunkers: dynamic-adaptive smart chunker and the YouTube
(media) sentence chunker.

Semantics transcribed from the reference (NOT code-copied; independent
implementation with identical outputs, guarded by differential tests):

- smart chunker: src/chunking/chunker.py:34-154
  constants 2500/250/300 (:38-40); split-priority patterns (:43-50);
  context/content split at the first line starting '# ' but not '## '
  (:68-79); single chunk when content <= 2500 (:83-84);
  target_count = len(content)//2500 (:86); dynamic per-chunk size =
  remaining_len // remaining_chunks (:100-104); best split = pattern
  rfind within a ±250 window, closest to target, skipping splits that
  leave < 300 chars (:117-143); last chunk takes the remainder (:92-98);
  chunk JSON = json.dumps({context, content.strip()}, ensure_ascii=False,
  indent=2) (:149-154).
- YouTube chunker: youtube_subtitles_extractor/youtube_chunker.py:18-159
  constants 2500/3000/250 (:22-24); no split when len <= 3000 (:52);
  target_count = max(1, round(len/2500)) — bankers' round (:61); linear
  scan for the sentence period closest to target, split AFTER the period
  (:128-136); last chunk and any tail <= 3000 absorb the remainder
  (:109-116).
- validity filter: keep chunk iff json.strip() and len(json) >= 64
  (src/processor/core.py:39,139-142).

Spark integration: a pandas UDF maps the document text column to an
array<string> of chunk JSONs (byte-identical to the reference format);
``posexplode`` assigns chunk_index; context/content are recovered with
``from_json``. The per-document algorithm is inherently sequential in the
character offsets, so the Python implementation *is* the semantic spec —
vectorization happens across documents (Arrow batches), the Spark way to
run a per-row sequential algorithm at scale.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

TARGET_CHUNK_SIZE = 2500
SEARCH_RANGE = 250
MIN_REMAINING = 300
MAX_CHUNK_SIZE = 3000  # YouTube chunker only
MIN_CHUNK_JSON_LEN = 64  # processor/core.py:39

# (pattern, split-offset) in priority order — chunker.py:43-50. The offset
# places the cut *inside* the pattern (e.g. after '#' for '# ').
SPLIT_PATTERNS = (
    ("# ", 2),
    ("## ", 3),
    ("### ", 4),
    ("\n\n", 2),
    ("\n", 1),
    (".", 1),
)

CHUNK_JSON_SCHEMA = "struct<context:string, content:string>"
MEDIA_CHUNK_JSON_SCHEMA = "struct<title:string, content:string>"


def format_chunk_json(context: str, content: str) -> str:
    """Byte-exact chunk JSON (chunker.py:149-154)."""
    return json.dumps(
        {"context": context, "content": content.strip()},
        ensure_ascii=False,
        indent=2,
    )


def split_context_content(text: str) -> tuple[str, str]:
    """Context/content split at the first H1 line (chunker.py:68-79)."""
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if line.startswith("# ") and not line.startswith("## "):
            return "\n".join(lines[:i]).strip(), "\n".join(lines[i:])
    return "", text


def _best_split_pos(content: str, target_pos: int) -> int:
    """Priority split-point search in a ±SEARCH_RANGE window
    (chunker.py:117-143)."""
    lo = max(0, target_pos - SEARCH_RANGE)
    hi = min(len(content), target_pos + SEARCH_RANGE)
    window = content[lo:hi]
    best, best_dist = target_pos, float("inf")
    for pattern, offset in SPLIT_PATTERNS:
        found = window.rfind(pattern)
        if found == -1:
            continue
        pos = lo + found + offset
        if len(content) - pos < MIN_REMAINING:
            continue
        dist = abs(pos - target_pos)
        if dist < best_dist:
            best, best_dist = pos, dist
    return best


def smart_chunk_text(text: str) -> list[str]:
    """Chunk one document into reference-format JSON strings
    (chunker.py:52-115). This is both the oracle and the UDF kernel."""
    if not text or not text.strip():
        return []
    context, content = split_context_content(text)
    if not content:
        return [format_chunk_json(context, text)]
    if len(content) <= TARGET_CHUNK_SIZE:
        return [format_chunk_json(context, content)]

    target_count = max(1, len(content) // TARGET_CHUNK_SIZE)
    chunks: list[str] = []
    start = 0
    for chunk_num in range(1, target_count + 1):
        if chunk_num == target_count:
            tail = content[start:]
            if tail.strip():
                chunks.append(format_chunk_json(context, tail))
            break
        remaining = len(content) - start
        dynamic_size = remaining // (target_count - chunk_num + 1)
        split_pos = _best_split_pos(content, start + dynamic_size)
        chunks.append(format_chunk_json(context, content[start:split_pos]))
        start = split_pos
    return chunks


def media_chunk_text(title: str, content: str) -> list[str]:
    """YouTube/media sentence chunker → JSON strings
    (youtube_chunker.py:29-142, 144-159)."""
    if not content or not content.strip():
        return []

    def fmt(chunk: str) -> str:
        return json.dumps(
            {"title": title, "content": chunk}, ensure_ascii=False, indent=2
        )

    total = len(content)
    if total <= MAX_CHUNK_SIZE:
        return [fmt(content)]

    target_count = max(1, round(total / TARGET_CHUNK_SIZE))
    chunks: list[str] = []
    pos = 0
    idx = 0
    while pos < total and idx < target_count:
        if idx == target_count - 1 or total - pos <= MAX_CHUNK_SIZE:
            end = total
        else:
            dynamic = (total - pos) // (target_count - idx)
            target_pos = pos + dynamic
            lo = max(pos, target_pos - SEARCH_RANGE)
            hi = min(total, target_pos + SEARCH_RANGE)
            end, best_dist = target_pos, float("inf")
            found = False
            for i in range(lo, hi):
                if content[i] == ".":
                    dist = abs((i + 1) - target_pos)
                    if dist < best_dist:
                        best_dist, end = dist, i + 1
                        found = True
            if not found:
                end = min(target_pos, total)
        piece = content[pos:end].strip()
        if piece:
            chunks.append(fmt(piece))
        pos = end
        idx += 1
    return chunks


def chunk_is_valid_py(chunk_json: str) -> bool:
    """processor/core.py:139-142 — applied to the JSON string."""
    return bool(chunk_json.strip()) and len(chunk_json) >= MIN_CHUNK_JSON_LEN


# ---------------------------------------------------------------------------
# Spark-side: pandas UDFs + explode helpers.
# ---------------------------------------------------------------------------

@pandas_udf(ArrayType(StringType()))
def smart_chunk_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: smart_chunk_text(t) if t is not None else [])


@pandas_udf(ArrayType(StringType()))
def media_chunk_udf(titles: pd.Series, contents: pd.Series) -> pd.Series:
    return pd.Series(
        [
            media_chunk_text(t if t is not None else "", c)
            if c is not None
            else []
            for t, c in zip(titles, contents)
        ]
    )


def chunk_json_is_valid(col: Column) -> Column:
    return (F.length(F.trim(col)) > 0) & (F.length(col) >= MIN_CHUNK_JSON_LEN)


def chunk_documents(df: DataFrame, url_col: str = "url", text_col: str = "content") -> DataFrame:
    """documents(url, content) → chunks(url, chunk_index, context, content,
    chunk_json). 1 doc → N chunks via pandas UDF + posexplode; chunk_index is
    the emission order (W8)."""
    parsed = F.from_json(F.col("chunk_json"), CHUNK_JSON_SCHEMA)
    return (
        df.select(
            F.col(url_col).alias("url"),
            F.posexplode(smart_chunk_udf(F.col(text_col))).alias(
                "chunk_index", "chunk_json"
            ),
        )
        .where(chunk_json_is_valid(F.col("chunk_json")))
        .select(
            "url",
            "chunk_index",
            parsed["context"].alias("context"),
            parsed["content"].alias("content"),
            "chunk_json",
        )
    )


def chunk_media_documents(
    df: DataFrame, url_col: str = "url", title_col: str = "title", text_col: str = "content"
) -> DataFrame:
    parsed = F.from_json(F.col("chunk_json"), MEDIA_CHUNK_JSON_SCHEMA)
    return (
        df.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                media_chunk_udf(F.col(title_col), F.col(text_col))
            ).alias("chunk_index", "chunk_json"),
        )
        .where(chunk_json_is_valid(F.col("chunk_json")))
        .select(
            "url",
            "chunk_index",
            parsed["title"].alias("title"),
            parsed["content"].alias("content"),
            "chunk_json",
        )
    )
