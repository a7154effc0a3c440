"""End-to-end crawl replay: Spark engine vs sequential oracle simulator.

Asserts (SURVEY.md §5.2 / north rule):
(a) crawl ordering equality — every fetched page's (url, fetch_round,
    seq_in_round) matches the oracle;
(b) URL-seen set equality (SO4) — both directions empty;
(c) final per-url states match;
(d) document span-sequence equality (kind, text, media_ref, order) and
    rendered-content equality;
(e) politeness: per-round per-host pops never exceed the token budget;
(f) resume-from-checkpoint reproduces the uninterrupted run bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.oracle.simulator import CrawlSimulator
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web


def run_pair(spark, tmp_path, web, batch_size, host_budgets, max_rounds=200, **ekw):
    sim = CrawlSimulator(
        web.corpus,
        web.seeds,
        robots=web.robots,
        host_budgets=host_budgets,
        batch_size=batch_size,
        max_attempts=3,
        max_rounds=max_rounds,
    ).run()
    hosts_rows = [(h, float(c), float(r)) for h, (c, r) in host_budgets.items()]
    hosts_df = spark.createDataFrame(
        hosts_rows, "host string, capacity double, refill_rate double"
    )
    eng = CrawlEngine(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        hosts_df,
        str(tmp_path / "crawl"),
        batch_size=batch_size,
        max_attempts=3,
        **ekw,
    )
    eng.seed(web.seeds)
    eng.run(max_rounds=max_rounds)
    return sim, eng


def assert_equivalent(sim, eng):
    # (a) ordering for fetched pages
    got = {
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in eng.crawl_order().collect()
    }
    want = {
        (u, rnd, seq) for (u, rnd, seq) in sim.crawl_order if u in sim.documents
    }
    assert got == want, (
        f"order mismatch: extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
    )
    # (b) URL-seen set equality
    eng_seen = {r["url"] for r in eng.frontier().select("url").collect()}
    assert eng_seen == sim.seen_set, (
        f"seen diff: extra={sorted(eng_seen - sim.seen_set)[:5]} "
        f"missing={sorted(sim.seen_set - eng_seen)[:5]}"
    )
    # (c) states
    eng_states = {
        r["url"]: r["state"] for r in eng.frontier().select("url", "state").collect()
    }
    assert eng_states == sim.final_states
    # (d) span-sequence + content equality
    docs = {
        r["url"]: r
        for r in eng.documents().select("url", "content", "spans").collect()
    }
    assert set(docs) == set(sim.documents)
    for url, row in docs.items():
        assert row["content"] == sim.documents[url], url
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        want_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sim.doc_spans[url]
        ]
        assert got_spans == want_spans, url


@pytest.fixture(scope="module")
def web():
    return generate_web(seed=42, n_hosts=6, n_pages=120, n_seeds=3)


def test_crawl_matches_oracle_fifo(spark, tmp_path, web):
    """Unlimited politeness → pure FIFO (reference semantics).
    rank_window_threshold=0 forces the two-stage distributed seq rank (the
    10^7-links-per-round path) — its total order must equal the oracle's."""
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark, tmp_path, web, batch_size=30, host_budgets=budgets,
        rank_window_threshold=0,
    )
    assert_equivalent(sim, eng)
    # sanity: the crawl actually did something non-trivial
    assert len(sim.documents) > 30
    assert sim.rounds >= 2


def test_crawl_matches_oracle_probe_broadcast_path(spark, tmp_path, web):
    """probe_broadcast_threshold=0 forces the URL-seen dedup onto the
    frontier-scale probe shape (seen scanned once with a broadcast
    candidate semi-join, never shuffled or auto-broadcast — new_urls
    docstring). Output must be bit-for-bit the plain-anti-join crawl:
    same oracle equivalence as the default-path test above."""
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark, tmp_path, web, batch_size=30, host_budgets=budgets,
        probe_broadcast_threshold=0,
    )
    assert_equivalent(sim, eng)
    assert len(sim.documents) > 30


def test_crawl_matches_oracle_with_politeness(spark, tmp_path, web):
    """Tight token buckets: equality AND budget enforcement."""
    budgets = {h: (4.0, 2.0) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark, tmp_path, web, batch_size=12, host_budgets=budgets, max_rounds=60
    )
    assert_equivalent(sim, eng)
    # (e) per-round per-host pops <= running token budget
    per_host = {
        (r["round"], r["scope"]): r["value"]
        for r in eng.metrics().where("scope like 'host:%'").collect()
    }
    tokens = {h: 4.0 for h, _, _ in web.hosts}
    max_round = max(rnd for rnd, _ in per_host) if per_host else 0
    for rnd in range(1, max_round + 1):
        if rnd > 1:
            for h in tokens:
                tokens[h] = min(4.0, tokens[h] + 2.0)
        for h in tokens:
            popped = per_host.get((rnd, f"host:{h}"), 0)
            assert popped <= int(tokens[h]), (rnd, h, popped, tokens[h])
            tokens[h] -= popped


def test_resume_bit_for_bit(spark, tmp_path, web):
    """Kill after k rounds, resume from checkpoint, final state identical."""
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    hosts_df = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    corpus_df = web.corpus_df(spark)
    robots_df = web.robots_df(spark)

    full = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "full"), batch_size=30,
        max_attempts=3,
    )
    full.seed(web.seeds)
    full.run(max_rounds=200)

    part = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "part"), batch_size=30,
        max_attempts=3,
    )
    part.seed(web.seeds)
    for _ in range(3):
        part.round()
    # simulate crash: drop the engine, resume purely from disk state
    resumed = CrawlEngine.resume(
        spark, corpus_df, robots_df, str(tmp_path / "part"), max_attempts=3
    )
    assert resumed.round_id == 3 and resumed.seq_counter == part.seq_counter
    resumed.run(max_rounds=200)

    a = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in full.crawl_order().collect()
    )
    b = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in resumed.crawl_order().collect()
    )
    assert a == b
    fa = sorted(
        (r["url"], r["state"], r["seq"]) for r in full.frontier().collect()
    )
    fb = sorted(
        (r["url"], r["state"], r["seq"]) for r in resumed.frontier().collect()
    )
    assert fa == fb


def test_crawl_with_cuckoo_filter(spark, tmp_path):
    """Cuckoo-filter variant (deletable seen-set, distributed shard
    maintenance, wired as the new_urls prefilter) produces identical
    results."""
    web = generate_web(seed=7, n_hosts=4, n_pages=60, n_seeds=2)
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    sim, eng = run_pair(
        spark,
        tmp_path,
        web,
        batch_size=20,
        host_budgets=budgets,
        use_bloom=False,
        use_cuckoo=True,
    )
    assert_equivalent(sim, eng)
    # the deletable filter is live state: resumes from its checkpoint file
    resumed = CrawlEngine.resume(
        spark,
        web.corpus_df(spark),
        web.robots_df(spark),
        str(tmp_path / "crawl"),
        use_bloom=False,
        use_cuckoo=True,
    )
    import numpy as np

    seen_hashes = np.array(
        [r["url_hash"] for r in eng.frontier().select("url_hash").collect()],
        dtype=np.int64,
    )
    assert resumed.seen_cuckoo.contains_many(seen_hashes).all()


def test_resume_rebuilds_lost_filter_state(spark, tmp_path, web):
    """A missing/corrupt bloom file must NOT silently resume with an empty
    filter (re-fetch of seen URLs); it rebuilds from pending ∪ fetched and
    the resumed crawl stays bit-for-bit equal."""
    import json
    import os

    hosts_df = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    corpus_df = web.corpus_df(spark)
    robots_df = web.robots_df(spark)

    full = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "full"), batch_size=30,
        max_attempts=3,
    )
    full.seed(web.seeds)
    full.run(max_rounds=200)

    part = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "part"), batch_size=30,
        max_attempts=3,
    )
    part.seed(web.seeds)
    for _ in range(3):
        part.round()
    ck = json.load(open(str(tmp_path / "part" / "CHECKPOINT.json")))
    os.remove(ck["bloom_path"])  # simulate lost filter state
    resumed = CrawlEngine.resume(spark, corpus_df, robots_df, str(tmp_path / "part"))
    assert resumed.max_attempts == 3  # retry semantics restored from checkpoint
    resumed.run(max_rounds=200)
    a = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in full.crawl_order().collect()
    )
    b = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in resumed.crawl_order().collect()
    )
    assert a == b


def test_resume_ignores_orphan_commits(spark, tmp_path, web):
    """A crash AFTER some of a round's (now-concurrent) table commits but
    BEFORE the checkpoint pointer advances leaves orphan snapshot versions
    on disk. Resume must pin the checkpointed versions — the orphans are
    invisible — and the continued crawl must equal an uninterrupted one."""
    hosts_df = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    corpus_df = web.corpus_df(spark)
    robots_df = web.robots_df(spark)

    full = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "full2"),
        batch_size=30, max_attempts=3,
    )
    full.seed(web.seeds)
    full.run(max_rounds=200)

    part = CrawlEngine(
        spark, corpus_df, robots_df, hosts_df, str(tmp_path / "part2"),
        batch_size=30, max_attempts=3,
    )
    part.seed(web.seeds)
    for _ in range(2):
        part.round()

    # simulate the torn round: orphan commits land in documents (a bogus
    # appended row) and metrics (a bogus round) with NO checkpoint update
    bogus = spark.createDataFrame(
        [("https://bogus.example/x", "bogus.example", 0, 99, 0, 200, "junk", [])],
        part.documents_tbl.read(spark).schema,
    )
    part.documents_tbl.commit(bogus, mode="append")
    part.metrics_tbl.commit_rows(
        [(99, "round", "popped", 1)],
        "round int, scope string, key string, value long",
        mode="append",
    )

    resumed = CrawlEngine.resume(
        spark, corpus_df, robots_df, str(tmp_path / "part2"), max_attempts=3
    )
    # pinned reads: the orphan rows are invisible to the resumed engine
    assert resumed.documents().where("url like 'https://bogus%'").count() == 0
    assert resumed.metrics().where("round = 99").count() == 0
    resumed.run(max_rounds=200)

    a = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in full.crawl_order().collect()
    )
    b = sorted(
        (r["url"], r["fetch_round"], r["seq_in_round"])
        for r in resumed.crawl_order().collect()
    )
    assert a == b
    assert resumed.documents().where("url like 'https://bogus%'").count() == 0


def test_xxh64_matches_spark(spark):
    """The driver-side XXH64 (functions/xxh.py) must be bit-identical to
    the JVM's F.xxhash64 on strings — purge_host's bucket math depends on
    it. Covers every length class of the algorithm (empty, <4, <8, <32,
    >=32 bytes) plus multi-byte UTF-8, and the pmod bucket helper."""
    import random
    import string

    from mcp_crawl4ai_rag_spark.functions.xxh import (
        host_bucket,
        spark_xxhash64_str,
    )

    rng = random.Random(7)
    cases = ["", "a", "abc", "abcdefg", "x" * 31, "y" * 32, "z" * 100,
             "host.example.com", "héllo wörld   unicode"]
    cases += [
        "".join(rng.choices(string.printable, k=rng.randint(0, 80)))
        for _ in range(60)
    ]
    rows = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(16)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert host_bucket(r["s"], 16) == r["b"], repr(r["s"])


def test_purge_host_partition_pruned(spark, tmp_path, web):
    """purge_host drops exactly one host's pending rows via the
    partition-pruned bucket read + O(matched) delta dels; other hosts'
    rows, fetched history, and resume are untouched."""
    hosts_df = spark.createDataFrame(
        [(h, 1e9, 1e9) for h, _, _ in web.hosts],
        "host string, capacity double, refill_rate double",
    )
    eng = CrawlEngine(
        spark, web.corpus_df(spark), web.robots_df(spark), hosts_df,
        str(tmp_path / "purge"), batch_size=10, max_attempts=3,
    )
    eng.seed(web.seeds)
    for _ in range(2):
        eng.round()
    pending_before = eng.frontier().where("state = 'pending'")
    by_host = {
        r["host"]: r["n"]
        for r in pending_before.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    victim = max(by_host, key=by_host.get)
    n_docs_before = eng.documents().count()

    n = eng.purge_host(victim)
    assert n == by_host[victim] > 0
    after = {
        r["host"]: r["n"]
        for r in eng.frontier().where("state = 'pending'")
        .groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert victim not in after
    for h, c in by_host.items():
        if h != victim:
            assert after.get(h) == c
    assert eng.documents().count() == n_docs_before  # history untouched
    # idempotent: second purge finds nothing
    assert eng.purge_host(victim) == 0

    # resume sees the purged frontier and keeps crawling
    resumed = CrawlEngine.resume(
        spark, web.corpus_df(spark), web.robots_df(spark),
        str(tmp_path / "purge"), max_attempts=3,
    )
    assert resumed.frontier().where(
        (F.col("state") == "pending") & (F.col("host") == victim)
    ).count() == 0
    resumed.round()
    assert resumed.round_id == 3


def test_reprioritize_every_policy(spark, tmp_path):
    """run(reprioritize_every=k): PageRank over the accumulated link graph
    folds into pending priorities mid-crawl. Asserts (a) the policy
    actually fires and CHANGES the pop sequence vs the plain BFS crawl,
    (b) coverage is unchanged (same final fetched set — priorities only
    reorder), (c) the policy crawl is deterministic run-to-run."""
    web = generate_web(seed=7, n_hosts=5, n_pages=100, n_seeds=2)
    budgets = {h: (1e9, 1e9) for h, _, _ in web.hosts}
    hosts_rows = [(h, float(c), float(r)) for h, (c, r) in budgets.items()]
    hosts_df = spark.createDataFrame(
        hosts_rows, "host string, capacity double, refill_rate double"
    )

    def crawl(workdir, **kw):
        eng = CrawlEngine(
            spark,
            web.corpus_df(spark),
            web.robots_df(spark),
            hosts_df,
            str(tmp_path / workdir),
            batch_size=10,
            max_attempts=3,
            **kw,
        )
        eng.seed(web.seeds)
        ms = eng.run(max_rounds=60, **({"reprioritize_every": 2} if kw.get("track_link_graph") else {}))
        order = [
            (r["url"], r["fetch_round"], r["seq_in_round"])
            for r in eng.crawl_order().orderBy("fetch_round", "seq_in_round").collect()
        ]
        return eng, ms, order

    _, ms_a, order_a = crawl("plain")
    eng_b, ms_b, order_b = crawl("policy", track_link_graph=True)
    _, _, order_b2 = crawl("policy2", track_link_graph=True)

    # (a) policy fired and reordered the crawl
    assert sum(m.get("reprioritized", 0) for m in ms_b) > 0
    assert order_a != order_b
    # (b) same coverage — reprioritization must only reorder
    assert {u for u, _, _ in order_a} == {u for u, _, _ in order_b}
    # (c) deterministic: identical policy runs produce identical order
    assert order_b == order_b2
    # importance-first: after the first policy step, popped priorities are
    # respected (every round's metrics exist; spot-check the engine's
    # pending is drained)
    assert eng_b.link_graph().count() > 0


def test_run_reprioritize_requires_tracking(spark, tmp_path):
    eng = CrawlEngine(
        spark,
        generate_web(seed=1, n_hosts=2, n_pages=10).corpus_df(spark),
        spark.createDataFrame([], "host string, rule_type string, path_prefix string, crawl_delay double"),
        spark.createDataFrame([], "host string, capacity double, refill_rate double"),
        str(tmp_path / "x"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="track_link_graph"):
        eng.run(max_rounds=1, reprioritize_every=2)
