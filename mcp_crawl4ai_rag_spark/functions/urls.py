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

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer kernel.

    Fast path: pandas C-speed string ops for the common
    scheme://netloc/path[?query][#fragment] shape (no ';' path params —
    urlparse treats those specially). Rows outside that shape fall back to
    the urlparse oracle, so output is identical to canonicalize_url_py for
    every input (differential-tested in tests/test_urls.py).
    """
    ext = urls.str.extract(_SIMPLE_URL_RE)
    simple = ext[0].notna() & ~ext[2].str.contains(";", na=False)
    out = (
        ext[0].str.lower()
        + "://"
        + ext[1].str.lower()
        + ext[2].str.rstrip("/").str.lower()
    )
    hard = ~simple & urls.notna()
    if hard.any():
        out.loc[hard] = urls[hard].map(canonicalize_url_py)
    return out.where(urls.notna(), None)


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer (Arrow batch in/out)."""
    return canonicalize_batch(urls)


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


def is_malformed(col: Column) -> Column:
    """Column predicate matching is_malformed_py (True = reject).

    Pure expressions — stays inside whole-stage codegen.
    """
    return (
        (count_occurrences(col, "https://") > 1)
        | (count_occurrences(col, "http://") > 1)
        | col.contains("%ef%bb%bf")
        | col.contains("﻿")
        | (count_occurrences(col, "/documentation/") > 1)
        | (col.contains("https:/") & ~col.startswith("https://"))
        | (F.length(col) > 200)
        | (count_occurrences(col, "developer.apple.com") > 1)
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
