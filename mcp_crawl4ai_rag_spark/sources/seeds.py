"""Sitemap / url-list seed sources (S1 feeders; north-rule sitemap fixtures).

The reference's current fork has no sitemap ingestion (its smart_crawl_url
sitemap path was dropped — no sitemap code remains under /root/reference),
but the north rule names "sitemap, txt-file, and recursive-crawl" seeding
explicitly, so this module closes that gap Spark-first:

- files are read via the ``binaryFile`` source — one task per file, so a
  50k-file sitemap index farm parses embarrassingly parallel;
- XML / line parsing happens in an Arrow-batched ``mapInPandas`` pass
  (never on the driver); a sitemapindex is expanded level by level, the
  driver only ever sees the child *locations* (bounded: an index entry per
  child file, not per URL);
- ``<priority>`` (0.0–1.0, sitemaps.org) maps to the frontier's integer
  priority as round(priority * 1000), so sitemap priority drives the W1
  max-heap pop order; absent priority uses the protocol default 0.5;
- seed order (the seq-assignment contract) is (source file path ASC,
  position in file ASC) — pass ``order_cols=["source", "pos"]`` to
  ``CrawlEngine.seed_df``.

Scale note: a single multi-GB .txt url list lands in one task under
binaryFile; split such files upstream (or read via spark.read.text when
per-file ordering is not required).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED_SCHEMA = (
    "source string, pos long, raw_url string, priority int, lastmod string"
)
_SITEMAP_DEFAULT_PRIORITY = 0.5


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_bytes(
    data: bytes,
) -> tuple[list[tuple[str, float | None, str | None]], list[str]]:
    """One sitemap document → (url entries, child sitemap locations).

    Handles <urlset> (loc/priority/lastmod) and <sitemapindex> (loc of
    child sitemaps), namespace-agnostic.
    """
    root = ET.fromstring(data)
    urls: list[tuple[str, float | None, str | None]] = []
    children: list[str] = []
    kind = _local(root.tag)
    if kind == "sitemapindex":
        for sm in root:
            for c in sm:
                if _local(c.tag) == "loc" and c.text:
                    children.append(c.text.strip())
    elif kind == "urlset":
        for u in root:
            loc: str | None = None
            pri: float | None = None
            lastmod: str | None = None
            for c in u:
                t = _local(c.tag)
                if t == "loc":
                    loc = (c.text or "").strip()
                elif t == "priority":
                    try:
                        pri = float(c.text)
                    except (TypeError, ValueError):
                        pri = None
                elif t == "lastmod":
                    lastmod = (c.text or "").strip()
            if loc:
                urls.append((loc, pri, lastmod))
    return urls, children


def sitemap_priority_to_int(pri: float | None) -> int:
    if pri is None:
        pri = _SITEMAP_DEFAULT_PRIORITY
    pri = min(max(pri, 0.0), 1.0)
    return int(round(pri * 1000))


def parse_sitemap_frame(files: DataFrame) -> DataFrame:
    """(source string, content binary) → SEED_SCHEMA rows ∪ index entries.

    Output rows with raw_url = child location and priority = -1 mark
    sitemapindex children (consumed by read_sitemap_seeds' expansion loop);
    real URL entries carry priority ≥ 0.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("source", "pos", "raw_url", "priority", "lastmod")}
            for src, blob in zip(batch["source"], batch["content"]):
                try:
                    urls, children = parse_sitemap_bytes(bytes(blob))
                except ET.ParseError:
                    continue  # malformed sitemap file: skip, like a 4xx fetch
                for i, (loc, pri, lastmod) in enumerate(urls):
                    out["source"].append(src)
                    out["pos"].append(i)
                    out["raw_url"].append(loc)
                    out["priority"].append(sitemap_priority_to_int(pri))
                    out["lastmod"].append(lastmod)
                for i, loc in enumerate(children):
                    out["source"].append(src)
                    out["pos"].append(i)
                    out["raw_url"].append(loc)
                    out["priority"].append(-1)
                    out["lastmod"].append(None)
            yield pd.DataFrame(out)

    return files.select("source", "content").mapInPandas(run, SEED_SCHEMA)


def _read_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .load(paths)
        .select(F.col("path").alias("source"), "content")
    )


def read_sitemap_seeds(
    spark: SparkSession, paths: list[str] | str, max_depth: int = 3
) -> DataFrame:
    """Sitemap files (urlsets and/or sitemapindexes) → seed frame
    (source, pos, raw_url, priority, lastmod), index files expanded up to
    ``max_depth`` levels. Feed to ``CrawlEngine.seed_df(df,
    order_cols=["source", "pos"])``.
    """
    if isinstance(paths, str):
        paths = [paths]
    level = _read_files(spark, paths)
    collected: DataFrame | None = None
    for _ in range(max_depth):
        parsed = parse_sitemap_frame(level).cache()
        urls = parsed.where(F.col("priority") >= 0)
        collected = urls if collected is None else collected.unionByName(urls)
        children = [
            r["raw_url"]
            for r in parsed.where(F.col("priority") < 0).select("raw_url").collect()
        ]
        if not children:
            break
        # child locations may be file paths or file:// URLs in fixtures
        level = _read_files(
            spark, [c[len("file://"):] if c.startswith("file://") else c for c in children]
        )
    return collected if collected is not None else spark.createDataFrame([], SEED_SCHEMA)


def read_url_list_seeds(
    spark: SparkSession, paths: list[str] | str, priority: int = 0
) -> DataFrame:
    """Plain .txt url lists (one URL per line; blank lines and '#' comments
    skipped) → seed frame. Line order is preserved per file (pos)."""
    if isinstance(paths, str):
        paths = [paths]
    files = _read_files(spark, paths)
    pri = priority

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("source", "pos", "raw_url", "priority", "lastmod")}
            for src, blob in zip(batch["source"], batch["content"]):
                pos = 0
                for line in bytes(blob).decode("utf-8", errors="replace").splitlines():
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    out["source"].append(src)
                    out["pos"].append(pos)
                    out["raw_url"].append(line)
                    out["priority"].append(pri)
                    out["lastmod"].append(None)
                    pos += 1
            yield pd.DataFrame(out)

    return files.mapInPandas(run, SEED_SCHEMA)
