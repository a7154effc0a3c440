"""Legacy header-cascade chunker (C2) + dual-chunk differential (C4).

Transcribed semantics from the reference's deprecated chunker
(src/chunking_deprecated/chunker.py:88-332):

- short doc (<= 2500 chars) → single chunk, context split at the first
  line whose strip() starts with '#' (:219-226, :321-332);
- header cascade H1 → H2 → H3: a level is used iff it yields >= 2
  sections (:116-124, :137); sections split on exact '#'*level + ' '
  prefixes (next level excluded via prefix+'#' test, :149,162);
- greedy merge: sections join with '\n\n'; merge while
  len(test_json) <= 3000 AND len(current_json) < 2500, where sizes are of
  the FULL chunk-JSON string (:175-217) — the JSON size feedback is part
  of the algorithm;
- fallback newline split: chunk_count = total//2500, fixed
  adjusted_size = total//chunk_count, nearest-'\n' bidirectional scan with
  backward preference on ties (:228-319).

The dual-chunk differential (C4, src/processor/dual_chunking_processor.py:
158-169) — equal iff same count and element-wise string equality — is a
pure Column expression here, used to re-chunk only changed documents
(the reference's differential-skip optimization,
dual_chunking_processor.py:184-209).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

TARGET_CHUNK_SIZE = 2500
MAX_CHUNK_SIZE = 3000


def _fmt(context: str, content: str) -> str:
    return json.dumps(
        {"context": context, "content": content}, ensure_ascii=False, indent=2
    )


def _split_by_first_header(text: str) -> tuple[str, str]:
    """chunker.py:321-332 — any '#'-leading line (stripped) splits."""
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if line.strip().startswith("#"):
            return "\n".join(lines[:i]).strip(), "\n".join(lines[i:]).strip()
    return "", text.strip()


def _context_and_remaining(text: str, prefix: str) -> tuple[str, str]:
    """chunker.py:145-153 — split at the first exact-level heading."""
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if line.startswith(prefix) and not line.startswith(prefix + "#"):
            return "\n".join(lines[:i]).strip(), "\n".join(lines[i:])
    return "", ""


def _sections(text: str, prefix: str) -> list[str]:
    """chunker.py:155-172."""
    out: list[str] = []
    cur: list[str] = []
    for line in text.split("\n"):
        if line.startswith(prefix) and not line.startswith(prefix + "#"):
            if cur:
                out.append("\n".join(cur))
            cur = [line]
        else:
            cur.append(line)
    if cur:
        out.append("\n".join(cur))
    return out


def _greedy_merge(sections: list[str], context: str) -> list[str]:
    """chunker.py:175-217 — merge criterion on full-JSON lengths."""
    if not sections:
        return []
    chunks: list[str] = []
    cur = [sections[0]]
    for section in sections[1:]:
        test_json = _fmt(context, "\n\n".join(cur + [section]))
        cur_json = _fmt(context, "\n\n".join(cur))
        if len(test_json) <= MAX_CHUNK_SIZE and len(cur_json) < TARGET_CHUNK_SIZE:
            cur.append(section)
        else:
            chunks.append(cur_json)
            cur = [section]
    chunks.append(_fmt(context, "\n\n".join(cur)))
    return chunks


def _newline_chunk_end(content: str, start: int, size: int, idx: int, count: int) -> int:
    """chunker.py:274-319 — bidirectional nearest-'\\n', backward on ties."""
    if idx == count - 1:
        return len(content)
    if start + size >= len(content):
        return len(content)
    target = start + size
    backward = None
    for i in range(target, start - 1, -1):
        if content[i] == "\n":
            backward = i + 1
            break
    forward = None
    for i in range(target, len(content)):
        if content[i] == "\n":
            forward = i + 1
            break
    if backward is None and forward is None:
        return len(content)
    if backward is None:
        return forward
    if forward is None:
        return backward
    if target - (backward - 1) <= (forward - 1) - target:
        return backward
    return forward


def _chunk_by_newlines(text: str) -> list[str]:
    """chunker.py:228-272."""
    context, content = _split_by_first_header(text)
    if not content.strip():
        return [_fmt(context, content)]
    total = len(content)
    count = max(1, total // TARGET_CHUNK_SIZE)
    size = total // count
    chunks: list[str] = []
    pos = 0
    idx = 0
    while pos < total and idx < count:
        end = _newline_chunk_end(content, pos, size, idx, count)
        piece = content[pos:end].strip()
        if piece:
            chunks.append(_fmt(context, piece))
        pos = end
        idx += 1
    return chunks


def legacy_chunk_text(text: str) -> list[str]:
    """Oracle + UDF kernel for the deprecated chunker
    (chunker.py:103-124)."""
    if not text or not text.strip():
        return []
    if len(text) <= TARGET_CHUNK_SIZE:
        context, content = _split_by_first_header(text)
        return [_fmt(context, content)]
    for level in (1, 2, 3):
        prefix = "#" * level + " "
        context, remaining = _context_and_remaining(text, prefix)
        if not remaining:
            continue
        sections = _sections(remaining, prefix)
        if len(sections) < 2:
            continue
        return _greedy_merge(sections, context)
    return _chunk_by_newlines(text)


@pandas_udf(ArrayType(StringType()))
def legacy_chunk_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: legacy_chunk_text(t) if t is not None else [])


def chunks_equal(a: Column, b: Column) -> Column:
    """C4: dual-chunk differential — same count AND element-wise string
    equality (dual_chunking_processor.py:158-169), pure Column ops."""
    return (F.size(a) == F.size(b)) & F.forall(
        F.zip_with(a, b, lambda x, y: x.eqNullSafe(y)), lambda v: v
    )


def differential_rechunk_targets(documents, text_col: str = "content"):
    """The differential-skip shape (dual_chunking_processor.py:184-209):
    chunk with both chunkers, keep only documents whose outputs differ —
    those are the ones needing re-embedding."""
    from mcp_crawl4ai_rag_spark.functions.chunking import smart_chunk_udf

    return (
        documents.withColumn("new_chunks", smart_chunk_udf(F.col(text_col)))
        .withColumn("old_chunks", legacy_chunk_udf(F.col(text_col)))
        .withColumn("unchanged", chunks_equal(F.col("new_chunks"), F.col("old_chunks")))
        .where(~F.col("unchanged"))
    )


def content_integrity_violation(doc_text: Column, chunks_col: Column) -> Column:
    """C5/T6: >5% character loss between source and concatenated chunk
    contents (chunking_deprecated/chunker.py:67-77) — assertion column."""
    chunk_content_len = F.aggregate(
        chunks_col,
        F.lit(0),
        lambda acc, cj: acc
        + F.length(F.get_json_object(cj, "$.content")),
    )
    return (
        (F.length(doc_text) - chunk_content_len).cast("double")
        / F.greatest(F.length(doc_text), F.lit(1))
    ) > 0.05
