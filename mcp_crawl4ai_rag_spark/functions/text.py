"""Text-analysis functions for training-data pipelines.

These extend the reference's surface (it has only keyword ILIKE search,
operations.py:189-198) with the operations a large-scale corpus pipeline
needs: token counting, quality scoring, language ID, fingerprinting.

All pure Column expressions (JVM, whole-stage codegen) so they run at
100 TB without Python in the hot path. Each has an ANSI-SQL twin in
__spark_entry__.oracle_sql for the DuckDB correctness gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Top English stopwords used by the n-gram language heuristic.
EN_STOPWORD_PATTERN = r"\b(the|and|of|to|in|is|that|for|with|was|are)\b"
PUNCT_PATTERN = r"[.,;:!?]"


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for blank strings."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+", -1))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND punctuation/camel
    boundaries — a cheap proxy for BPE token budgeting."""
    pieces = F.split(
        F.trim(col), r"(\s+|(?<=[a-z])(?=[A-Z])|(?=[^\w\s])|(?<=[^\w\s]))", -1
    )
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def punct_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(col, F.lit(PUNCT_PATTERN)).cast("double") / F.length(col)
    )


def stopword_ratio(col: Column) -> Column:
    tokens = token_count(col)
    hits = F.regexp_count(F.lower(col), F.lit(EN_STOPWORD_PATTERN))
    return F.when(tokens == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / tokens.cast("double")
    )


def mean_word_len(col: Column) -> Column:
    tokens = token_count(col)
    chars = F.length(F.regexp_replace(col, r"\s+", ""))
    return F.when(tokens == 0, F.lit(0.0)).otherwise(
        chars.cast("double") / tokens.cast("double")
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    sane punctuation + sane mean word length."""
    length_ok = (F.length(col) >= 200) & (F.length(col) <= 50000)
    stop_ok = stopword_ratio(col) >= 0.05
    punct_ok = punct_ratio(col).between(0.001, 0.2)
    word_ok = mean_word_len(col).between(2.0, 12.0)
    return (
        length_ok.cast("double") * 0.25
        + stop_ok.cast("double") * 0.25
        + punct_ok.cast("double") * 0.25
        + word_ok.cast("double") * 0.25
    )


def lang_id(col: Column) -> Column:
    """Cheap language ID: English iff stopword ratio clears a threshold."""
    return F.when(stopword_ratio(col) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def winnow_fingerprints_py(
    text: str, k: int = 8, window: int = 6
) -> list[int]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    '03 — the MOSS algorithm): rolling Rabin-Karp hash over character
    k-grams of the normalized text, then the minimum hash of each sliding
    window of ``window`` consecutive k-gram hashes (rightmost min wins).
    Guarantees any shared substring of length >= k + window - 1 yields at
    least one shared fingerprint — the local, position-robust complement
    to the global md5 ``fingerprint``."""
    import re

    s = re.sub(r"\s+", " ", (text or "").lower().strip())
    n = len(s)
    if n < k:
        return []
    base = 257
    mod = (1 << 61) - 1
    power = pow(base, k - 1, mod)
    h = 0
    hashes = []
    for i, ch in enumerate(s):
        h = (h * base + ord(ch)) % mod
        if i >= k:
            h = (h - ord(s[i - k]) * power * base) % mod
        if i >= k - 1:
            hashes.append(h)
    out = []
    prev_pick = -1
    for w0 in range(0, len(hashes) - window + 1):
        seg = hashes[w0 : w0 + window]
        m = min(seg)
        # rightmost occurrence of the min in the window
        pick = w0 + max(i for i, v in enumerate(seg) if v == m)
        if pick != prev_pick:
            out.append(hashes[pick])
            prev_pick = pick
    if not out and hashes:
        out = [min(hashes)]
    # int64 range for Spark array<bigint>
    return [v - (1 << 62) if v >= (1 << 62) else v for v in out]


def make_winnow_udf(k: int = 8, window: int = 6):
    """Pandas UDF: text → array<bigint> winnowing fingerprints."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def winnow(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow_fingerprints_py(t, k, window))

    return winnow
