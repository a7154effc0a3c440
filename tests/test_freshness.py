"""Recrawl scheduler: differential vs the closed-form Python formula +
the monotonicity properties the Cho & Garcia-Molina estimator promises."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.freshness import recrawl_priorities


def lam_py(n, x, dt):
    return -math.log((n - x + 0.5) / (n + 0.5)) / dt


def score_py(n, x, dt, age, base):
    lam = lam_py(n, x, dt)
    p = 1.0 - math.exp(-lam * age)
    return round(lam, 6), round(p, 6), round(base * p, 6)


def _history(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, base_priority int, n_visits int, "
        "n_changes int, avg_interval double, age double",
    )


def test_matches_closed_form(spark):
    rows = [
        (f"https://h{i % 3}.x/p/{i}", f"h{i % 3}.x", 1 + i % 5, 1 + i % 8,
         min(i % 5, 1 + i % 8), 1.0 + i % 14, float(i % 30))
        for i in range(200)
    ]
    got = {
        r["url"]: (r["change_rate"], r["p_changed"], r["recrawl_priority"])
        for r in recrawl_priorities(_history(spark, rows)).collect()
    }
    for u, h, base, n, x, dt, age in rows:
        want = score_py(n, x, dt, age, base)
        assert got[u] == want, (u, got[u], want)


def test_monotonicity_and_bounds(spark):
    # same visits/interval/age: more observed changes => higher rate
    rows = [(f"u{x}", "h", 1, 10, x, 2.0, 5.0) for x in range(0, 11)]
    out = {r["url"]: r for r in recrawl_priorities(_history(spark, rows)).collect()}
    rates = [out[f"u{x}"]["change_rate"] for x in range(0, 11)]
    assert rates == sorted(rates)
    assert rates[0] == 0.0  # no observed change -> no recrawl evidence
    assert all(b > a for a, b in zip(rates, rates[1:]))  # strictly more
    assert all(0.0 <= out[f"u{x}"]["p_changed"] <= 1.0 for x in range(0, 11))

    # same history: older page => higher change probability
    rows = [(f"a{a}", "h", 1, 6, 3, 2.0, float(a)) for a in range(0, 20)]
    out = {r["url"]: r for r in recrawl_priorities(_history(spark, rows)).collect()}
    ps = [out[f"a{a}"]["p_changed"] for a in range(0, 20)]
    assert ps == sorted(ps) and ps[0] == 0.0  # age 0 -> definitely fresh

    # static page decays far below a churning one at equal base priority
    rows = [("static", "h", 5, 20, 0, 1.0, 3.0), ("churn", "h", 5, 20, 19, 1.0, 3.0)]
    out = {r["url"]: r for r in recrawl_priorities(_history(spark, rows)).collect()}
    assert out["churn"]["recrawl_priority"] > 10 * out["static"]["recrawl_priority"]


def test_plan_is_a_pure_projection(spark):
    rows = [("u", "h", 1, 3, 1, 2.0, 4.0)]
    plan = (
        recrawl_priorities(_history(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only: no shuffle, no window


def _fold_py(log, now, default_interval=1.0):
    from collections import defaultdict

    by_url = defaultdict(list)
    for u, h, fp, ts in log:
        by_url[u].append((ts, h, fp))
    out = {}
    for u, vs in by_url.items():
        vs.sort()
        n = len(vs)
        changes = sum(1 for a, b in zip(vs, vs[1:]) if a[2] != b[2])
        interval = (vs[-1][0] - vs[0][0]) / (n - 1) if n > 1 else default_interval
        out[u] = (vs[0][1], n, n - 1, changes, round(interval, 9), now - vs[-1][0])
    return out


def _mk_log():
    log = []
    for i in range(60):
        u, h = f"https://h{i % 4}.x/p/{i}", f"h{i % 4}.x"
        k = 1 + i % 5
        for v in range(1, k + 1):
            if i % 3 == 0:
                fp = "static"
            elif i % 3 == 1:
                fp = f"v{v}"          # changes every visit
            else:
                fp = f"v{v // 2}"     # changes every other visit
            log.append((u, h, fp, float(v * (1 + i % 7))))
    return log


def test_visit_history_matches_python_fold(spark):
    from mcp_crawl4ai_rag_spark.operators.freshness import visit_history

    log, now = _mk_log(), 50.0
    df = spark.createDataFrame(log, "url string, host string, fingerprint string, ts double")
    got = {
        r["url"]: (
            r["host"], r["n_visits"], r["n_samples"], r["n_changes"],
            round(r["avg_interval"], 9), r["age"],
        )
        for r in visit_history(df, now=now).collect()
    }
    want = _fold_py(log, now)
    assert got == want


def test_visit_history_single_shuffle(spark):
    from mcp_crawl4ai_rag_spark.operators.freshness import visit_history

    df = spark.createDataFrame(
        _mk_log(), "url string, host string, fingerprint string, ts double"
    )
    plan = visit_history(df, now=50.0)._jdf.queryExecution().executedPlan().toString()
    # the url-keyed exchange feeds both the lag window and the fold
    assert plan.count("Exchange hashpartitioning") == 1


def test_full_freshness_loop(spark):
    """visit log -> visit_history -> recrawl_priorities, vs the composed
    Python computation: a churning page must outrank a static one of the
    same base priority; scores match the closed form on the folded stats."""
    from mcp_crawl4ai_rag_spark.operators.freshness import (
        recrawl_priorities,
        visit_history,
    )

    log, now = _mk_log(), 50.0
    df = spark.createDataFrame(log, "url string, host string, fingerprint string, ts double")
    hist = visit_history(df, now=now).withColumn("base_priority", F.lit(2))
    got = {
        r["url"]: (r["change_rate"], r["p_changed"], r["recrawl_priority"])
        for r in recrawl_priorities(hist, n_visits_col="n_samples").collect()
    }
    want_hist = _fold_py(log, now)
    for u, (_h, _n, n_samp, x, dt, age) in want_hist.items():
        if n_samp == 0:
            assert got[u] == (0.0, 0.0, 0.0)
        else:
            assert got[u] == score_py(n_samp, x, dt, age, 2), u
    churn = [u for u, v in want_hist.items() if v[1] == 5 and v[3] == 4]
    static = [u for u, v in want_hist.items() if v[1] == 5 and v[3] == 0]
    assert churn and static
    assert min(got[u][2] for u in churn) > max(got[u][2] for u in static)
