"""Recrawl scheduler: differential vs the closed-form Python formula +
the monotonicity properties the Cho & Garcia-Molina estimator promises."""

from __future__ import annotations

import math

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
