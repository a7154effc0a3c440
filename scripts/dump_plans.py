"""Dump .explain('formatted') for a set of entry queries to files.

Usage:
  python scripts/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: a built-in
list of the round-6 touched queries). Run from the tree whose plans you
want (round-start checkout for *_before, current tree for *_after); use
the sf dir/core count of the driver's measurement so size-adaptive
branches (scan spread) resolve the same way they do in the bench.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R06_QUERIES = [
    "p1_canonicalize",
    "p2_malformed_filter",
    "dedup_simhash",
    "dedup_simhash_md5",
    "dedup_keep_best",
    "dedup_substring",
    "dedup_substring_removal",
    "decontaminate",
    "decontaminate_spans",
    "media_dedup_phash",
    "dedup_minhash",
    "feature_hash_embed",
    "recrawl_priorities",
    "text_langid",
    "span_interleave",
    "vector_topk_2560",
    "text_repetition",
    "gopher_filter",
    "training_pipeline",
    "training_pipeline_neardup",
    "c1_smart_chunker",
    "c3_media_chunker",
    "multimodal_decode",
    "bm25_rank",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or R06_QUERIES
    os.makedirs(out_dir, exist_ok=True)

    from mcp_crawl4ai_rag_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dump-plans", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
