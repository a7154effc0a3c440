"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB at the given sf, compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from mcp_crawl4ai_rag_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def main():
    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if scols != dcols:
            failures.append((name, f"cols {scols} vs {dcols}"))
            print(f"FAIL {name}: cols {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        a = sorted(tuple(norm(v) for v in r) for r in ([*r] for r in srows))
        b = sorted(tuple(norm(v) for v in r) for r in drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ e.g. {diff}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
