"""O(batch) frontier-growth proof → appended to BENCH/BASELINE.md.

The merge-on-read frontier claims per-round cost independent of the
PENDING size (round path = O(batch) delta commits + bounded-delta
anti-join; the base is only touched by amortized compaction). Evidence:
run the SAME crawl loop (batch_size, cpus fixed) over webs 10x apart in
page count and show sec/round flat between them — including the
compaction rounds, whose amortized cost is the one component allowed to
grow with pending size (O(pending / compact_every)).

Prints one JSON line:
  {"levels": [{"n_pages": N, "rounds": R, "sec_per_round_median": s,
               "sec_per_round_noncompact_median": s, "compact_sec_total": s,
               "round_curve": [...]}, ...],
   "flatness_ratio": median_200k / median_20k}

Usage: python scripts/frontier_growth_bench.py [n_small] [n_big] [batch] [cpus]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine  # noqa: E402
from mcp_crawl4ai_rag_spark.session import get_spark  # noqa: E402
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web  # noqa: E402


def run_level(spark, n_pages: int, batch: int, max_rounds: int) -> dict:
    web = generate_web(seed=11, n_hosts=24, n_pages=n_pages, n_seeds=6)
    corpus = web.corpus_df(spark).cache()
    corpus.count()
    eng = CrawlEngine(
        spark,
        corpus,
        web.robots_df(spark),
        web.hosts_df(spark),
        tempfile.mkdtemp(prefix=f"growth{n_pages}-"),
        batch_size=batch,
        max_attempts=3,
        bloom_bits=1 << 23,
    )
    eng.profile_rounds = True
    eng.seed(web.seeds)
    t = time.time()
    # Chunk the crawl and drain stale shuffle state between chunks (the
    # bench.py drain_shuffle_state mechanism, documented in
    # BENCH/BASELINE.md round-4 notes): shuffle files + map-output
    # tracker entries are freed by the ContextCleaner only on a driver
    # GC, and a mostly-empty driver heap can go a whole multi-level
    # session without one — the accumulated state then inflates LATE
    # rounds of the big level, which reads as O(rounds) growth that
    # isn't the engine's. The drain sits BETWEEN rounds (per-round phase
    # timings are measured inside round()), exactly like a long-lived
    # driver GC-ing between jobs; wall_sec honestly includes it.
    ms: list = []
    while len(ms) < max_rounds:
        want = min(8, max_rounds - len(ms))
        chunk = eng.run(max_rounds=want)
        ms.extend(chunk)
        if len(chunk) < want:
            break  # frontier drained
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
    wall = time.time() - t
    corpus.unpersist()
    totals = [m["phases"]["total"] for m in ms]
    noncompact = [
        m["phases"]["total"] - m["phases"].get("compact", 0.0) for m in ms
    ]
    return {
        "n_pages": n_pages,
        "rounds": len(ms),
        "wall_sec": round(wall, 1),
        "pages_fetched": sum(m["fetched"] for m in ms),
        "sec_per_round_median": round(statistics.median(totals), 2),
        "sec_per_round_noncompact_median": round(statistics.median(noncompact), 2),
        "compact_sec_total": round(
            sum(m["phases"].get("compact", 0.0) for m in ms), 1
        ),
        "round_curve": [round(t, 2) for t in totals],
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    spark = get_spark(
        app_name="growth-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # cap the big level's rounds: by then pending holds ~10x the popped
    # rows of the whole small crawl, which is exactly the regime the
    # O(batch) claim must hold in — no need to drain 100+ rounds
    levels = [
        run_level(spark, n_small, batch, max_rounds=200),
        run_level(spark, n_big, batch, max_rounds=40),
    ]
    ratio = (
        levels[1]["sec_per_round_noncompact_median"]
        / levels[0]["sec_per_round_noncompact_median"]
    )
    print(json.dumps({"levels": levels, "flatness_ratio": round(ratio, 2),
                      "batch": batch, "cpus": cpus}))


if __name__ == "__main__":
    main()
