"""Freshness-driven recrawl scheduling (crawl-tier extension).

The reference crawls each URL once (`pages` rows are terminal after
fetch, src/database/operations.py:85-106 marks content and stops); a
production crawler must also decide WHEN to revisit. This module is that
scheduler: estimate each page's change rate from its visit history and
decay/boost its priority by the probability it has changed since the
last fetch, producing rows that feed straight back into
`CrawlEngine.seed_df` (or the reprioritize path) as a recrawl wave.

Model (Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT
2003): page changes are Poisson with rate λ. With n visits at average
interval Δ of which X detected a change, the bias-corrected estimator is

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ

and the probability the page changed in the `age` elapsed since the last
fetch is p = 1 - exp(-λ̂ · age). `recrawl_priority = base_priority · p`
makes hot pages resurface quickly and static pages decay toward never.

Everything is pure Column arithmetic (ln/exp in whole-stage codegen —
no UDF, no shuffle: the plan is a map over the history table), so the
operator has an exact DuckDB twin in the entry gate. At 100 TB the
history table is url-partitioned like the frontier; the scheduler is
embarrassingly parallel and the only downstream shuffle is the pop's
own (host)-window when the wave is admitted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def change_rate(n_visits: Column, n_changes: Column, avg_interval: Column) -> Column:
    """Bias-corrected Poisson change-rate estimator λ̂ (TOIT 2003 §4.2).

    Defined for n_visits >= 1, 0 <= n_changes <= n_visits,
    avg_interval > 0. The +0.5 correction keeps the estimate finite at
    the X = n boundary (every visit saw a change). At X = 0 the estimate
    is exactly 0 — "no evidence of change" schedules no recrawl; a
    caller wanting exploration puts a floor under it
    (`F.greatest(change_rate(...), F.lit(eps))`) rather than this
    function biasing every estimate upward.
    """
    n = n_visits.cast("double")
    x = n_changes.cast("double")
    return -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / avg_interval.cast(
        "double"
    )


def visit_history(
    visits: DataFrame,
    now: float,
    url_col: str = "url",
    host_col: str = "host",
    fingerprint_col: str = "fingerprint",
    ts_col: str = "ts",
    default_interval: float = 1.0,
) -> DataFrame:
    """Fold a raw visit log — one row per (url, fetch) with the content
    fingerprint observed — into the per-URL history `recrawl_priorities`
    consumes.

    Emits (url, host, n_visits, n_samples, n_changes, avg_interval, age):
    `n_samples` = n_visits - 1 is the number of change OPPORTUNITIES
    (fingerprint transitions between consecutive visits) and `n_changes`
    how many of those transitions actually differed — the (n, X) pair
    the Cho & Garcia-Molina estimator expects. Single-visit URLs get
    n_samples = 0, which the estimator maps to rate 0 (no evidence);
    `avg_interval` falls back to ``default_interval`` for them so the
    column stays non-null. `age` = now - last_ts. ``now`` is an explicit
    caller argument (deterministic jobs; no wall-clock in the engine).

    Scale shape: one exchange on the uniform url key serves BOTH the
    lag window and the fold — Catalyst reuses hashpartitioning(url), so
    the groupBy adds no second shuffle. No UDF anywhere.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(ts_col)
    flagged = visits.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(ts_col).cast("double").alias("__ts"),
        (
            F.lag(F.col(fingerprint_col)).over(w).isNotNull()
            & (F.col(fingerprint_col) != F.lag(F.col(fingerprint_col)).over(w))
        )
        .cast("int")
        .alias("__changed"),
    )
    n = F.count("*")
    return flagged.groupBy("url", "host").agg(
        n.cast("int").alias("n_visits"),
        (n - F.lit(1)).cast("int").alias("n_samples"),
        F.sum("__changed").cast("int").alias("n_changes"),
        F.when(
            n > 1, (F.max("__ts") - F.min("__ts")) / (n - F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(default_interval)))
        .alias("avg_interval"),
        (F.lit(float(now)) - F.max("__ts")).alias("age"),
    )


def recrawl_priorities(
    history: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    base_priority_col: str = "base_priority",
    n_visits_col: str = "n_visits",
    n_changes_col: str = "n_changes",
    avg_interval_col: str = "avg_interval",
    age_col: str = "age",
) -> DataFrame:
    """Score every fetched URL for recrawl.

    Input: one row per URL of visit history — total visits, visits that
    observed a changed page (content fingerprint differed), the average
    inter-visit interval, and the time elapsed since the last fetch
    (interval/age in the same unit, e.g. days).

    Returns (url, host, change_rate, p_changed, recrawl_priority):
    `p_changed` = P[page changed since last fetch] under the estimated
    Poisson rate; `recrawl_priority` = base_priority × p_changed,
    rounded to 6dp (the pagerank oracle-parity precedent). Feed the
    top slice into `CrawlEngine.seed_df` as the recrawl wave — seeding
    dedups against the live frontier, so re-admission is idempotent.
    """
    lam = change_rate(
        F.col(n_visits_col), F.col(n_changes_col), F.col(avg_interval_col)
    )
    p_changed = F.lit(1.0) - F.exp(-lam * F.col(age_col).cast("double"))
    return history.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.round(lam, 6).alias("change_rate"),
        F.round(p_changed, 6).alias("p_changed"),
        F.round(F.col(base_priority_col).cast("double") * p_changed, 6).alias(
            "recrawl_priority"
        ),
    )
