"""End-to-end BFS crawl-loop benchmark → appended to BENCH/BASELINE.md.

Runs the full CrawlEngine (pop → fetch join → span clean → error split →
link pipeline → bloom dedup → snapshot commits → checkpoint) on a larger
synthetic web and reports pages fetched/sec and URLs admitted/sec across
the whole crawl — the engine-loop counterpart of the admission-pipeline
headline. The reference's implied throughput is ~3.6 pages/s
(BASELINE.md: 20 workers / 5.5 s per page).

Usage: python scripts/crawl_bench.py [n_pages] [batch_size] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_crawl4ai_rag_spark.operators.crawl import CrawlEngine  # noqa: E402
from mcp_crawl4ai_rag_spark.session import get_spark  # noqa: E402
from mcp_crawl4ai_rag_spark.sources.synthetic_web import generate_web  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    t = time.time()
    web = generate_web(seed=11, n_hosts=24, n_pages=n_pages, n_seeds=6)
    gen_sec = time.time() - t

    spark = get_spark(
        app_name="crawl-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = web.corpus_df(spark).cache()
    corpus.count()

    eng = CrawlEngine(
        spark,
        corpus,
        web.robots_df(spark),
        web.hosts_df(spark),
        tempfile.mkdtemp(prefix="crawlbench-"),
        batch_size=batch,
        max_attempts=3,
        bloom_bits=1 << 22,
    )
    t = time.time()
    eng.seed(web.seeds)
    metrics = eng.run(max_rounds=200)
    crawl_sec = time.time() - t

    fetched = sum(m["fetched"] for m in metrics)
    popped = sum(m["popped"] for m in metrics)
    admitted = sum(m["links_inserted"] for m in metrics)
    links_seen = sum(m["links_seen"] for m in metrics)
    result = {
        "n_pages": n_pages,
        "batch_size": batch,
        "cpus": cpus,
        "rounds": len(metrics),
        "gen_sec": round(gen_sec, 1),
        "crawl_sec": round(crawl_sec, 1),
        "pages_fetched": fetched,
        "urls_popped": popped,
        "urls_admitted": admitted,
        "links_processed": links_seen,
        "pages_per_sec": round(fetched / crawl_sec, 1),
        "links_per_sec": round(links_seen / crawl_sec, 1),
        "sec_per_round": round(crawl_sec / max(len(metrics), 1), 2),
    }
    print(json.dumps(result))

    md = f"""

## End-to-end BFS crawl loop (scripts/crawl_bench.py)

Full engine rounds (pop → fetch join → span clean → error split → link
pipeline → bloom dedup → 4 snapshot commits + checkpoint per round) on a
{n_pages:,}-page synthetic web, batch {batch:,}, local[{cpus}]:

| metric | value |
|---|---|
| rounds | {result["rounds"]} |
| pages fetched | {fetched:,} |
| raw links processed | {links_seen:,} |
| URLs admitted (post dedup/filters) | {admitted:,} |
| wall time | {result["crawl_sec"]} s ({result["sec_per_round"]} s/round) |
| **pages fetched/sec** | **{result["pages_per_sec"]}** |
| links processed/sec | {result["links_per_sec"]:,} |

Reference baseline: ~3.6 pages/s (20 Playwright workers x 5.5 s/page,
BASELINE.md) — the Spark loop's scheduling/dedup/commit machinery sustains
{result["pages_per_sec"]} pages/s per round-trip at test scale with
synthetic zero-latency fetches; in production the fetch stage dominates and
the loop's politeness budgets bound per-host rates.

```
{json.dumps(result)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
