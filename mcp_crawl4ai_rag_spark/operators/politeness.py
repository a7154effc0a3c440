"""Per-host politeness (token buckets) + robots rules evaluation.

The reference's politeness is architectural — a fixed worker pool
(core.py:86,234-237) and a 5 s per-page delay (apple_stealth_crawler.py:230)
bound per-host request rate because there is exactly one host. The north
rule generalizes this to explicit DataFrame state:

- ``hosts`` table (host, capacity, refill_rate, tokens): refilled each
  round, charged by actual pops; a host's pop budget for a round is
  floor(tokens). Unlimited budget (capacity=∞) degenerates to the
  reference's pure-FIFO behavior.
- robots rules: tiny table broadcast-joined on host; longest
  path-prefix match wins; no matching rule ⇒ allow. The reference's only
  allow-rule is the scope prefix filter (core.py:75,444), which is the
  special case of a single allow rule.

All pure DataFrame ops — the rules join is a broadcast hash join, the
budget is a window rank, nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/]*)"
PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)?$"


def with_host_and_path(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Host/path extraction for *canonicalized* URLs (lowercased scheme and
    netloc), pure regexp — no Python."""
    return df.withColumn(
        "host", F.regexp_extract(F.col(url_col), HOST_RE, 1)
    ).withColumn("path", F.regexp_extract(F.col(url_col), PATH_RE, 1))


def robots_allowed(df: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Keep rows whose URL passes robots evaluation.

    df must carry unique ``url_col`` values and host/path columns (use
    with_host_and_path). robots: (host, rule_type, path_prefix, crawl_delay)
    — assumed small → broadcast. Longest-prefix match; tie behavior is
    undefined (rule tables must not carry equal-length conflicting prefixes).
    """
    r = F.broadcast(
        robots.select(
            F.col("host").alias("r_host"),
            F.col("rule_type").alias("r_type"),
            F.col("path_prefix").alias("r_prefix"),
        )
    )
    joined = df.join(r, df["host"] == r["r_host"], "left").withColumn(
        "__mlen",
        F.when(
            F.col("r_prefix").isNotNull() & F.col("path").startswith(F.col("r_prefix")),
            F.length("r_prefix"),
        ).otherwise(F.lit(-1)),
    )
    w = Window.partitionBy(url_col).orderBy(F.desc("__mlen"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where((F.col("__mlen") == -1) | (F.col("r_type") == "allow"))
        .drop("r_host", "r_type", "r_prefix", "__mlen", "__rn")
    )


def init_hosts(hosts: DataFrame) -> DataFrame:
    """(host, capacity, refill_rate) → + tokens(=capacity)."""
    return hosts.withColumn("tokens", F.col("capacity"))


def refill_hosts(hosts: DataFrame) -> DataFrame:
    return hosts.withColumn(
        "tokens", F.least(F.col("capacity"), F.col("tokens") + F.col("refill_rate"))
    )


def charge_hosts(hosts: DataFrame, popped_counts: DataFrame) -> DataFrame:
    """popped_counts: (host, popped) — subtract actual pops."""
    return (
        hosts.join(popped_counts, "host", "left")
        .withColumn("tokens", F.col("tokens") - F.coalesce(F.col("popped"), F.lit(0)))
        .drop("popped")
    )


def budgeted_pop(
    pending: DataFrame, hosts: DataFrame, batch_size: int
) -> DataFrame:
    """W1: the frontier pop. Per-host window rank bounded by the token
    budget, then global (priority DESC, seq ASC) top-``batch_size``.

    Replaces the reference's advisory lock + ``ORDER BY created_at ASC
    LIMIT n FOR UPDATE SKIP LOCKED`` (operations.py:61-83); the window-ranked
    snapshot IS the priority heap. Emits pop_rank (1-based pop order).

    Scale: the per-host window shuffles by host — the same partitioning the
    fetch stage wants; skewed hot hosts are bounded by their budget, so the
    post-filter global top-k is small (TakeOrderedAndProject, no full sort).
    """
    budgets = hosts.select(
        "host", F.floor(F.col("tokens")).cast("long").alias("__budget")
    )
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    eligible = (
        pending.join(F.broadcast(budgets), "host", "left")
        .withColumn("__hrank", F.row_number().over(w_host))
        .where(F.col("__hrank") <= F.coalesce(F.col("__budget"), F.lit(1 << 62)))
        .drop("__budget", "__hrank")
    )
    w_global = Window.orderBy(F.desc("priority"), F.asc("seq"))
    return (
        eligible.orderBy(F.desc("priority"), F.asc("seq"))
        .limit(batch_size)
        .withColumn("pop_rank", F.row_number().over(w_global))
    )
