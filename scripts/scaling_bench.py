"""Scaling-efficiency evidence (BASELINE.json north rule).

Runs the frontier-admission pipeline (bench.py --pipeline-only) as separate
processes at two parallelism levels (N and 4N local cores) on the SAME
input, computes throughput scaling efficiency, and writes
BENCH/BASELINE.md.

Usage:
    python scripts/scaling_bench.py [n_low] [n_high] [n_urls]
Defaults: 2 8 32000000 (compute-dominated; ≈7 min per N=2 run).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_urls: int, repeats: int = 1, pin: bool = True) -> dict:
    """One fresh-process run per repeat, best-of (variance control).

    ``pin=True`` confines the whole process tree (JVM task threads AND
    python UDF workers) to exactly ``cpus`` CPUs via taskset — the honest
    emulation of an executor with N cores. Without pinning, local[N]
    overlaps N JVM threads with N python workers and the small level
    silently uses ~2N cores, understating scaling.
    """
    env = dict(
        os.environ,
        # UDF workers resolve imports via PYTHONPATH/cwd, not the
        # driver's sys.path — without this the child only works when
        # launched from the repo root (ModuleNotFoundError otherwise)
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_URLS=str(n_urls),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        # this script interleaves its own repeats across levels — one
        # pipeline run per bench.py invocation keeps samples independent
        SPARK_GRAFT_BENCH_RUNS="1",
        # identical job at both levels: same plan, same shuffle partition
        # count — only the executor resources differ (the cluster shape)
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        ),
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-only"]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    best = None
    for _ in range(repeats):
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if out.returncode != 0:
            # surface the child's failure (a silent CalledProcessError
            # hides the actual Spark/JVM error) and retry once — a
            # level run is ~5-10 min; losing the whole pair to one
            # transient executor hiccup wastes more than a retry costs
            sys.stderr.write(
                f"level cpus={cpus} failed (rc={out.returncode}); stderr tail:\n"
                + "\n".join(out.stderr.splitlines()[-40:])
                + "\n"
            )
            sys.stderr.flush()
            out = subprocess.run(cmd, env=env, capture_output=True, text=True)
            if out.returncode != 0:
                sys.stderr.write(
                    f"retry also failed (rc={out.returncode}); stderr tail:\n"
                    + "\n".join(out.stderr.splitlines()[-40:])
                    + "\n"
                )
                raise subprocess.CalledProcessError(out.returncode, cmd)
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["pipeline_sec"] < best["pipeline_sec"]:
            best = r
    return best


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else n_low * 4
    n_urls = int(sys.argv[3]) if len(sys.argv) > 3 else 32_000_000
    assert n_high == n_low * 4, "criterion is N vs 4N"

    # interleaved best-of-2 per level
    low = high = None
    for _ in range(2):
        lo = run_level(n_low, n_urls)
        hi = run_level(n_high, n_urls)
        if low is None or lo["pipeline_sec"] < low["pipeline_sec"]:
            low = lo
        if high is None or hi["pipeline_sec"] < high["pipeline_sec"]:
            high = hi
    speedup = high["value"] / low["value"]
    efficiency = speedup / (n_high / n_low)

    md = f"""# BENCH — frontier scheduling throughput + scaling efficiency

North metric (BASELINE.json): **URLs scheduled+deduped/sec** through the
full admission pipeline — canonicalize (pandas UDF) → malformed filter →
robots broadcast join → exact anti-join dedup (pre-partitioned seen) →
per-host
politeness window pop — on a synthetic candidate stream with hot-host skew
(50% of URLs on one host), ~4% malformed, ~50% already-seen.

No real cluster exists in this sandbox; per the driver instructions the
two-cluster-size criterion is evidenced by running the SAME job on the
same input at two parallelism levels. Each level's process tree (JVM task
threads AND python UDF workers) is pinned to exactly its core count via
`taskset` — the honest emulation of N-core executors; without pinning,
local[N] overlaps JVM threads with python workers and the small level
silently uses ~2N cores, understating scaling. Interleaved best-of-2 runs
per level control shared-machine variance.

## Result

| level | cores | candidates | pipeline sec | URLs/sec |
|---|---|---|---|---|
| N  | {n_low} | {low["n_candidates"]:,} | {low["pipeline_sec"]} | {low["value"]:,.0f} |
| 4N | {n_high} | {high["n_candidates"]:,} | {high["pipeline_sec"]} | {high["value"]:,.0f} |

**Speedup {n_low}→{n_high} cores: {speedup:.2f}x — scaling efficiency
{efficiency:.2f}** (criterion ≥ 0.8: {"PASS" if efficiency >= 0.8 else "FAIL"}).

## Phase breakdown (best runs)

| phase | N={n_low} sec | 4N={n_high} sec | speedup |
|---|---|---|---|
| canonicalize + malformed + robots | {low["canon_sec"]} | {high["canon_sec"]} | {low["canon_sec"] / high["canon_sec"]:.2f}x |
| anti-join dedup (pre-partitioned seen) | {low["dedup_sec"]} | {high["dedup_sec"]} | {low["dedup_sec"] / high["dedup_sec"]:.2f}x |
| politeness pop (salted) | {low["pop_sec"]} | {high["pop_sec"]} | {low["pop_sec"] / high["pop_sec"]:.2f}x |

## What closed the round-2 FAIL (0.76 → this round)

Round 2 certified 0.76 (dedup 2.57x, pop 2.54x vs canon 3.42x). Profiling
the phases at 1 vs 4 pinned cores localized the loss to per-batch work
that should have been amortized engine state, and to shuffles a correct
plan doesn't need:

- **Seen-side re-exchange.** The dedup anti-join re-shuffled and re-sorted
  the 16M-row seen set on every batch. The seen set is now cached
  pre-partitioned + pre-sorted on the join key (the local analogue of the
  url-hash-bucketed Iceberg seen table the 10^10 design maintains), so
  each batch exchanges only the candidate side. Dedup speedup 2.57x →
  3.10x.
- **Pop unbudgeted-host bypass.** The per-host budget window is an
  identity filter for any host with no politeness budget row. Those rows
  now skip both window shuffles and feed the final TakeOrderedAndProject
  heap directly; only budgeted (rate-limited) hosts' rows are salt-pruned
  and ranked. Same output (pop-exactness + full-crawl bit-for-bit
  tests); pop N=1 time fell ~30% and its weight in the pipeline with it.
- **Identical job across levels.** Shuffle partitions are pinned to one
  value at both levels (previously 2/core, so the two levels ran
  different plans).

## Round-4 change: bloom prefilter dropped from the bulk dedup path

With the seen side pre-partitioned, the anti-join already exchanges only
the candidate batch; the bloom's two Python/Arrow probe passes then cost
more than the shuffle volume they save. Measured A/B (pinned cores,
steady state, 32M vs 16M): bloom path 168.3 s (1 core) / 59.2 s (4
cores); plain anti-join 73.9 s / 27.8 s — >2x faster at both levels.
The pipeline now runs the plain anti-join (SPARK_GRAFT_BENCH_BLOOM=1
re-enables the old path); the bloom/cuckoo prefilter remains in the
crawl-round probe_broadcast path, where it shrinks a broadcast probe set
against a seen table too large to scan per batch.

## Hardware ceiling context

This container reports 32 CPUs but measured raw capacity does not scale
linearly past ~8 workers (SMT/shared cores + memory bandwidth): a pure
multiprocessing busy loop gives only ~2.8x total throughput from 8 → 32
workers, and a pure-JVM Spark md5 job ~1.6x. Scaling efficiency is
therefore reported at N={n_low} → 4N={n_high} pinned cores, where the hardware
itself is not the bottleneck — matching the criterion's intent (the
job's *own* scalability: no serial stages, no skew collapse). The hot
host (50% of candidates) is spread by the salted pre-prune in
budgeted_pop; the dedup anti-join exchanges only the candidate batch.
The 10^10 design point runs the identical plan on 1000 multi-core
executors.

## Raw JSON

```
{json.dumps(low)}
{json.dumps(high)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve sections other tools appended (crawl-loop, spark-submit):
    # everything from the first heading this script does not own
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n## End-to-end BFS crawl loop")
        if idx < 0:
            idx = old.find("\n## spark-submit packaging")
        if idx >= 0:
            tail = old[idx:]
    with open(path, "w") as f:
        f.write(md.rstrip("\n") + "\n" + tail)
    print(md)


if __name__ == "__main__":
    main()
