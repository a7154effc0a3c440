"""URL canonicalization, validation, routing, hashing.

Semantics matched to the reference (file:line cites into /root/reference):

- canonicalize: lowercase scheme + netloc + *path* (a reference-specific
  quirk we preserve for URL-seen-set equality), strip trailing '/' from the
  path, drop query + fragment — src/crawler/core.py:157-169.
- malformed filter — src/crawler/core.py:171-188.
- scope filter (allow-prefix) — src/crawler/core.py:75,212-215,444.
- error-page predicate — src/crawler/core.py:78-82,190-205.
- URL-kind router (web vs media) — src/database/operations.py:144-145,
  youtube_subtitles_extractor/youtube_processor.py:66-76.

The canonicalizer is a vectorized pandas UDF (Arrow batches); every other
predicate is pure Column expressions (JVM-side, whole-stage codegen).
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf, pandas_udf
from pyspark.sql.types import StringType

APPLE_DOCS_PREFIX = "https://developer.apple.com/documentation/"
PERMANENT_ERROR_CODES = (403, 404, 410)
HTTP_200_ERROR_PATTERN = "An unknown error occurred."


# ---------------------------------------------------------------------------
# Pure-Python oracles (used by tests and the sequential crawl simulator).
# ---------------------------------------------------------------------------

def canonicalize_url_py(url: str) -> str:
    """Oracle transcription of core.py:157-169 semantics."""
    parsed = urlparse(url)
    return urlunparse(
        parsed._replace(
            scheme=parsed.scheme.lower(),
            netloc=parsed.netloc.lower(),
            path=parsed.path.rstrip("/").lower(),
            query="",
            fragment="",
        )
    )


def is_malformed_py(url: str) -> bool:
    """Oracle transcription of core.py:171-188 (True = reject)."""
    return any(
        [
            url.count("https://") > 1 or url.count("http://") > 1,
            "%ef%bb%bf" in url or "﻿" in url,
            url.count("/documentation/") > 1,
            "https:/" in url and not url.startswith("https://"),
            len(url) > 200,
            url.count("developer.apple.com") > 1,
        ]
    )


def host_of_py(url: str) -> str:
    return urlparse(url).netloc.lower()


# ---------------------------------------------------------------------------
# Spark-side implementations.
# ---------------------------------------------------------------------------

_SIMPLE_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?[^#]*)?(?:#.*)?$"

import re as _re

_SIMPLE_URL_RE_C = _re.compile(_SIMPLE_URL_RE)


def _canonicalize_slow(u: str) -> str:
    """Row-wise canonicalizer for rows outside the Arrow kernel's numpy
    fast path (non-ASCII bytes, ';', odd shapes). Reproduces the
    historical pandas kernel exactly: simple-shape rows (regex match, no
    ';' in the path group) use the lower/rstrip formula; everything else
    the urlparse oracle — so the total function is bit-identical to the
    round-5 kernel on EVERY input."""
    m = _SIMPLE_URL_RE_C.match(u)
    if m and ";" not in m.group(3):
        return (
            m.group(1).lower() + "://" + m.group(2).lower()
            + m.group(3).rstrip("/").lower()
        )
    return canonicalize_url_py(u)


# byte-class lookup tables for the Arrow kernel
_SCHEME_OK = np.zeros(256, dtype=bool)
_SCHEME_OK[np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789+.-",
    dtype=np.uint8,
)] = True
_ALPHA = np.zeros(256, dtype=bool)
_ALPHA[np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ", dtype=np.uint8
)] = True
_TO_LOWER = np.arange(256, dtype=np.uint8)
_TO_LOWER[65:91] += 32


def _first_per_row(positions: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map sorted global byte ``positions`` to rows via ``offsets`` and
    keep the first position per row. Returns (row_idx, pos) pairs."""
    if len(positions) == 0:
        return positions, positions
    rows = np.searchsorted(offsets, positions, side="right") - 1
    first = np.ones(len(rows), dtype=bool)
    first[1:] = rows[1:] != rows[:-1]
    return rows[first], positions[first]


def canonicalize_arrow(arr: pa.Array) -> pa.Array:
    """Byte-level vectorized canonicalizer over an Arrow string array.

    Fast path (pure numpy over the Arrow data buffer, no per-row Python):
    ASCII URLs of the common scheme://netloc/path[?query][#fragment]
    shape with no ';' before the cut. For those the oracle semantics
    collapse to: lowercase everything before the first '?'/'#', then
    strip trailing '/' down to (not past) the netloc end. Everything
    else — no '://', non-scheme chars before it, non-ASCII bytes, ';'
    (urlparse params) — falls back row-wise to the urlparse oracle, so
    output is identical to canonicalize_url_py for EVERY input
    (differential-tested in tests/test_urls.py / test_properties.py).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = (
            arr.chunk(0)
            if arr.num_chunks == 1
            else pa.concat_arrays(arr.chunks)
            if arr.num_chunks
            else pa.array([], type=pa.string())
        )
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lo, hi = int(offs[0]), int(offs[-1])
    view = data[lo:hi]
    null_mask = arr.is_null().to_numpy(zero_copy_only=False)

    s, e = offs[:-1], offs[1:]

    # first "://" per row (bounded inside the row)
    if len(view) >= 3:
        m = (view[:-2] == 58) & (view[1:-1] == 47) & (view[2:] == 47)
        cand = np.flatnonzero(m) + lo
    else:
        cand = np.empty(0, dtype=np.int64)
    crow = np.searchsorted(offs, cand, side="right") - 1
    ok = cand + 3 <= e[crow]
    cand, crow = cand[ok], crow[ok]
    first = np.ones(len(crow), dtype=bool)
    first[1:] = crow[1:] != crow[:-1]
    colon = np.full(n, -1, dtype=np.int64)
    colon[crow[first]] = cand[first]

    # cut = first '?' or '#' per row (none can precede the colon on rows
    # that pass the scheme check — '?'/'#' are not scheme chars)
    cut = e.copy()
    qrow, qpos = _first_per_row(np.flatnonzero((view == 63) | (view == 35)) + lo, offs)
    cut[qrow] = qpos

    has = colon >= 0
    colon_c = np.where(has, colon, s)  # clamp for safe indexing
    alpha_ok = np.zeros(n, dtype=bool)
    nz = e > s
    alpha_ok[nz] = _ALPHA[data[s[nz]]]

    # ';' and non-ASCII bytes are rare: count-in-range via sparse position
    # lists + searchsorted instead of full-buffer prefix sums
    semi_pos = np.flatnonzero(view == 59) + lo
    na_pos = np.flatnonzero(view >= 128) + lo
    no_semi = np.searchsorted(semi_pos, cut) == np.searchsorted(semi_pos, s)
    all_ascii = np.searchsorted(na_pos, cut) == np.searchsorted(na_pos, s)

    # scheme charset check: gather just the scheme bytes (schemes are a
    # few bytes per row; cap 64 — longer prefixes go to the slow path)
    sch_len = colon_c - s
    sidx = np.flatnonzero(has & (sch_len > 0) & (sch_len <= 64))
    scheme_ok = np.zeros(n, dtype=bool)
    if len(sidx):
        L = sch_len[sidx]
        cumL = np.concatenate(([0], np.cumsum(L)))
        g = np.repeat(s[sidx] - cumL[:-1], L) + np.arange(int(cumL[-1]))
        badcum = np.concatenate(([0], np.cumsum(~_SCHEME_OK[data[g]])))
        scheme_ok[sidx] = badcum[cumL[1:]] == badcum[cumL[:-1]]

    fast = ~null_mask & has & alpha_ok & scheme_ok & all_ascii & no_semi

    # netloc end = first '/' at/after colon+3 (else cut)
    slashes = np.flatnonzero(view == 47) + lo
    j = np.searchsorted(slashes, colon_c + 3, side="left")
    j = np.minimum(j, max(len(slashes) - 1, 0))
    ne = cut.copy()
    if len(slashes):
        sl = slashes[j]
        in_row = (sl >= colon_c + 3) & (sl < cut)
        ne = np.where(in_row, sl, cut)

    # strip trailing '/' of the path, never past the netloc end: if the
    # byte at cut-1 is a slash, rewind to the start of its run (slash
    # runs derived from the sparse slash-position list)
    if len(slashes):
        brk = np.concatenate(([True], np.diff(slashes) != 1))
        run_start = slashes[brk][np.cumsum(brk) - 1]  # per slash
        ci = np.searchsorted(slashes, cut - 1, side="left")
        cic = np.minimum(ci, len(slashes) - 1)
        ends_in_slash = slashes[cic] == cut - 1
        new_end = np.where(ends_in_slash, np.maximum(ne, run_start[cic]), cut)
    else:
        new_end = cut.copy()
    new_end = np.maximum(np.minimum(new_end, cut), ne)

    # build fast outputs: gather [s, new_end) per fast row, lowercased
    fidx = np.flatnonzero(fast)
    lens = np.where(fast, new_end - s, 0)[fidx]
    total = int(lens.sum())
    cum = np.concatenate(([0], np.cumsum(lens)))
    gather = np.repeat(s[fidx] - cum[:-1], lens) + np.arange(total)
    out_data = _TO_LOWER[data[gather]]
    fast_arr = pa.StringArray.from_buffers(
        len(fidx),
        pa.py_buffer(cum.astype(np.int32).tobytes()),
        pa.py_buffer(out_data.tobytes()),
    )

    # hard rows: row-wise historical kernel (rare on real URL streams)
    hidx = np.flatnonzero(~fast & ~null_mask)
    if len(hidx) == 0 and not null_mask.any():
        if len(fidx) == n:
            return fast_arr
    hard_vals = [
        _canonicalize_slow(v)
        for v in arr.take(pa.array(hidx, type=pa.int64())).to_pylist()
    ]
    hard_arr = pa.array(hard_vals, type=pa.string())

    combined = pa.concat_arrays([fast_arr, hard_arr.cast(pa.string())])
    if len(combined) == 0:
        return pa.nulls(n, pa.string())
    perm = np.empty(n, dtype=np.int64)
    perm[fidx] = np.arange(len(fidx))
    perm[hidx] = len(fidx) + np.arange(len(hidx))
    perm[null_mask] = 0  # masked out below
    indices = pa.array(perm, type=pa.int64(), mask=null_mask)
    return combined.take(indices)


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer kernel (pandas wrapper around the Arrow
    kernel — kept as the differential-test surface)."""
    arr = pa.Array.from_pandas(urls, type=pa.string())
    return canonicalize_arrow(arr).to_pandas()


@arrow_udf(StringType())
def _canonicalize_url_udf(urls: pa.Array) -> pa.Array:
    """Vectorized canonicalizer (Arrow batch in/out, no pandas boundary)."""
    return canonicalize_arrow(urls)


# Non-deterministic flag (value is fully deterministic): stops the
# optimizer's pushed-down-filter copy of the UDF — a filter on the canon
# output otherwise evaluates the whole canonicalize (and everything
# feeding it) TWICE, once below the filter and once in the projection
# (guide §4.4: two ArrowEvalPython nodes for one call).
canonicalize_url = _canonicalize_url_udf.asNondeterministic()

# Deterministic alias for callers with no filter on the output, where
# the optimizer's normal freedoms (column pruning under count, etc.)
# are wanted. Same kernel, same values.
canonicalize_url_det = _canonicalize_url_udf


@pandas_udf(StringType())
def url_host(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlparse(u).netloc.lower() if u is not None else None)


def count_occurrences(col: Column, token: str) -> Column:
    """str.count(token) as a JVM expression: non-overlapping occurrence count."""
    tok_len = len(token)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / F.lit(tok_len)
    ).cast("int")


def _occurs_twice(col: Column, token: str) -> Column:
    """str.count(token) > 1 (non-overlapping), as two allocation-free
    ``locate`` scans with early exit — replaces the length(replace(...))
    count, which materialized a full copy of the string per token."""
    first = F.call_function("locate", F.lit(token), col)
    return (first > 0) & (
        F.call_function("locate", F.lit(token), col, first + F.lit(len(token))) > 0
    )


def is_malformed(col: Column) -> Column:
    """Column predicate matching is_malformed_py (True = reject).

    Pure expressions — stays inside whole-stage codegen.
    """
    return (
        _occurs_twice(col, "https://")
        | _occurs_twice(col, "http://")
        | col.contains("%ef%bb%bf")
        | col.contains("﻿")
        | _occurs_twice(col, "/documentation/")
        | (col.contains("https:/") & ~col.startswith("https://"))
        | (F.length(col) > 200)
        | _occurs_twice(col, "developer.apple.com")
    )


def in_scope(col: Column, prefix: str = APPLE_DOCS_PREFIX) -> Column:
    """Allow-prefix scope filter (core.py:75,444)."""
    return col.startswith(prefix)


def is_permanent_error(status: Column, content: Column) -> Column:
    """Error-page predicate (core.py:78-82,190-205).

    Permanent iff status in {403,404,410}, or status==200 with the known
    error body pattern. NULL status → not an error (retry path).
    """
    return F.when(status.isNull(), F.lit(False)).otherwise(
        status.isin(*PERMANENT_ERROR_CODES)
        | (
            (status == 200)
            & content.isNotNull()
            & content.contains(HTTP_200_ERROR_PATTERN)
        )
    )


def is_error_page_py(content: str, status_code: int | None) -> bool:
    """Oracle twin of is_permanent_error."""
    if not status_code:
        return False
    if status_code in PERMANENT_ERROR_CODES:
        return True
    if status_code == 200 and content:
        return HTTP_200_ERROR_PATTERN in content
    return False


def url_kind(col: Column, web_prefix: str = APPLE_DOCS_PREFIX) -> Column:
    """Route URLs to pipelines (operations.py:144-145, youtube_processor.py:66-76)."""
    return (
        F.when(
            col.startswith(web_prefix) | (col == web_prefix.rstrip("/")), F.lit("web")
        )
        .when(col.like("https://www.youtube.com/watch?v=%"), F.lit("media"))
        .otherwise(F.lit("other"))
    )


def url_id(col: Column) -> Column:
    """64-bit stable URL id — replaces the reference's UUID pk and feeds the
    bloom/cuckoo filters (north rule: xxhash64 hashing)."""
    return F.xxhash64(col)
