"""budgeted_pop: salted pre-prune must be result-identical to a direct
Python computation of the exact pop semantics, across budget regimes."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.politeness import budgeted_pop


def exact_pop_py(rows, budgets, batch_size):
    pending = sorted(rows, key=lambda r: (-r[3], r[4]))
    taken = {}
    eligible = []
    for r in pending:
        host = r[1]
        b = budgets.get(host)
        budget = math.floor(b) if b is not None else 1 << 62
        if taken.get(host, 0) < budget:
            eligible.append(r)
            taken[host] = taken.get(host, 0) + 1
    batch = sorted(eligible, key=lambda r: (-r[3], r[4]))[:batch_size]
    return [(r[0], i + 1) for i, r in enumerate(batch)]


def make_rows(rng, n, hosts):
    rows = []
    for i in range(n):
        host = hosts[0] if rng.random() < 0.5 else rng.choice(hosts)
        rows.append((f"https://{host}/p/{i}", host, 1, rng.randint(0, 3), i))
    return rows


def run_case(spark, budgets, batch_size, n=3000, salt_buckets=4):
    rng = random.Random(hash((batch_size, tuple(sorted(budgets.items())))) & 0xFFFF)
    hosts_list = ["hot.h", "a.h", "b.h", "c.h"]
    rows = make_rows(rng, n, hosts_list)
    pending = spark.createDataFrame(
        rows, "url string, host string, depth int, priority int, seq long"
    )
    hosts = spark.createDataFrame(
        [(h, float(b), 0.0, float(b)) for h, b in budgets.items()],
        "host string, capacity double, refill_rate double, tokens double",
    )
    got = sorted(
        (r["url"], r["pop_rank"])
        for r in budgeted_pop(pending, hosts, batch_size, salt_buckets).collect()
    )
    want = sorted(exact_pop_py(rows, budgets, batch_size))
    assert got == want, f"batch={batch_size} budgets={budgets}"


def test_budget_smaller_than_batch(spark):
    run_case(spark, {"hot.h": 7, "a.h": 3, "b.h": 2, "c.h": 5}, batch_size=50)


def test_budget_larger_than_batch(spark):
    run_case(spark, {"hot.h": 1000, "a.h": 1000}, batch_size=25)


def test_missing_hosts_unlimited(spark):
    run_case(spark, {"hot.h": 4}, batch_size=40)


def test_zero_and_negative_budget(spark):
    run_case(spark, {"hot.h": 0, "a.h": -2.5, "b.h": 3}, batch_size=30)


def test_hosts_from_robots(spark):
    from mcp_crawl4ai_rag_spark.operators.politeness import hosts_from_robots

    robots = spark.createDataFrame(
        [
            ("slow.h", "allow", "/", 10.0),
            ("slow.h", "disallow", "/x/", 2.0),
            ("fast.h", "allow", "/", 0.0),
        ],
        "host string, rule_type string, path_prefix string, crawl_delay double",
    )
    got = {
        r["host"]: (r["capacity"], r["refill_rate"])
        for r in hosts_from_robots(
            robots, round_seconds=5.0, default_rate=3.0, burst_rounds=2.0
        ).collect()
    }
    assert got["slow.h"] == (1.0, 0.5)  # 5s round / 10s delay = 0.5/round
    assert got["fast.h"] == (6.0, 3.0)  # default rate


def test_priorities_respected(spark):
    # priority DESC dominates seq ASC
    rows = [
        ("u1", "a.h", 1, 0, 0),
        ("u2", "a.h", 1, 5, 10),
        ("u3", "b.h", 1, 5, 3),
        ("u4", "b.h", 1, 0, 1),
    ]
    import pyspark.sql.functions as F  # noqa: F401

    from pyspark.sql import SparkSession  # noqa: F401

    pending = spark.createDataFrame(
        rows, "url string, host string, depth int, priority int, seq long"
    )
    hosts = spark.createDataFrame(
        [], "host string, capacity double, refill_rate double, tokens double"
    )
    got = [
        r["url"]
        for r in budgeted_pop(pending, hosts, 3)
        .orderBy("pop_rank")
        .collect()
    ]
    assert got == ["u3", "u2", "u1"]
