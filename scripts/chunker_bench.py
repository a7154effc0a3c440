"""Chunker-throughput scaling bench (VERDICT r4 #7).

C1/C3 are the engine's only per-row-sequential Python kernels (inherent:
the reference chunker is a stateful scan over each document,
src/chunking/chunker.py:52-115). They are Arrow-batched ACROSS documents,
so throughput must scale with cores — this bench pins that property so a
future chunker change can't silently serialize.

Method (same as scripts/scaling_bench.py): generate the long-doc input
parquet ONCE (both levels read identical bytes), then run
`bench.py --chunker-only` as a fresh process per level with the whole
process tree pinned to exactly N cores via taskset, interleaved
best-of-2 per level. Prints one JSON line with docs/s at both levels and
the scaling efficiency; the builder appends the section to
BENCH/BASELINE.md.

Usage: python scripts/chunker_bench.py [n_low=1] [n_high=4]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/tmp/chunker_bench_input.parquet"


def generate_input(sf_dir: str) -> None:
    """Materialize the long-doc workload once, 64 files for ample splits
    at every level (unpinned local[32] — setup, untimed)."""
    sys.path.insert(0, REPO)
    from bench import chunker_input
    from mcp_crawl4ai_rag_spark.session import get_spark

    if os.path.exists(INPUT):
        shutil.rmtree(INPUT)
    spark = get_spark(app_name="chunker-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    replicas = int(os.environ.get("SPARK_GRAFT_CHUNK_REPLICAS", "30"))
    repeat = int(os.environ.get("SPARK_GRAFT_CHUNK_REPEAT", "64"))
    chunker_input(spark, sf_dir, replicas, repeat).repartition(64).write.parquet(INPUT)
    spark.stop()


def run_level(cpus: int) -> dict:
    env = dict(
        os.environ,
        # workers need the repo on PYTHONPATH regardless of launch cwd
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CHUNK_INPUT=INPUT,
        SPARK_GRAFT_BENCH_RUNS="1",
        # identical job at both levels (scaling_bench.py precedent)
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        ),
    )
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, os.path.join(REPO, "bench.py"), "--chunker-only",
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    generate_input(sf_dir)

    low = high = None
    for _ in range(2):
        lo = run_level(n_low)
        hi = run_level(n_high)
        if low is None or lo["chunk_sec"] < low["chunk_sec"]:
            low = lo
        if high is None or hi["chunk_sec"] < high["chunk_sec"]:
            high = hi
        print(
            json.dumps({"progress": True, "low": lo["chunk_sec"], "high": hi["chunk_sec"]}),
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
                "efficiency": round(speedup / (n_high / n_low), 3),
                "low": low,
                "high": high,
            }
        )
    )


if __name__ == "__main__":
    main()
