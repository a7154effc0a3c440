"""Second scaling-efficiency pair (round 5): N=2 → 4N=8 pinned cores.

Reuses scaling_bench.run_level (same taskset pinning, same pinned
shuffle-partition count, interleaved best-of-2 per level) but does NOT
rewrite BENCH/BASELINE.md — it prints one JSON line for the builder to
append as a round-5 section alongside the certified 1→4 pair. 8 pinned
cores is still under the box's ~8-worker hardware ceiling documented in
BENCH/BASELINE.md, so the job's own scalability (not the machine's) is
what the ratio measures.

Usage: python scripts/scaling_pair_extra.py [n_low=2] [n_urls=32000000]
"""

from __future__ import annotations

import json
import sys

from scaling_bench import run_level


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = n_low * 4
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000

    low = high = None
    for _ in range(2):
        lo = run_level(n_low, n_urls)
        hi = run_level(n_high, n_urls)
        if low is None or lo["pipeline_sec"] < low["pipeline_sec"]:
            low = lo
        if high is None or hi["pipeline_sec"] < high["pipeline_sec"]:
            high = hi
        print(
            json.dumps({"progress": True, "low": lo["pipeline_sec"], "high": hi["pipeline_sec"]}),
            file=sys.stderr,
            flush=True,
        )
    speedup = high["value"] / low["value"]
    print(
        json.dumps(
            {
                "n_low": n_low,
                "n_high": n_high,
                "speedup": round(speedup, 3),
                "efficiency": round(speedup / 4.0, 3),
                "low": low,
                "high": high,
            }
        )
    )


if __name__ == "__main__":
    main()
