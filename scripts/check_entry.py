"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB at the given sf, compare row count,
column names, order-insensitive values, AND physical Arrow column types.

The type check exists because the driver's value hash is *typed*: equal
Python values with different wire types (the classic: DuckDB window
SUM(BIGINT) returns HUGEINT → arrow decimal128, Spark emits int64) hash
differently even though a value-level compare passes. Running this gate
locally catches that drift before the driver does."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from mcp_crawl4ai_rag_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def arrow_type_key(t: pa.DataType) -> str:
    """Canonical key for an arrow type so benign encoding variants compare
    equal: string/large_string are interchangeable (DuckDB emits either
    depending on version), as are list/large_list; everything else must
    match exactly — int32 vs int64 vs decimal128 are REAL differences the
    driver's typed hash sees."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_integer(t):
        # Width-only differences (Spark size()→int32 vs DuckDB len()→int64)
        # are proven benign: text_tokens was int32-vs-int64 and green in the
        # driver's r2 gate. decimal128 (HUGEINT) is NOT an integer type here
        # and stays a real mismatch.
        return "int"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_key(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/tz differences are formatting, not value
    if pa.types.is_decimal(t):
        # DuckDB DECIMAL(p, s>0) converts to float64 downstream (matches a
        # Spark double — observed green in the driver gate for
        # text_quality/dedup_keep_best), but an integer-valued decimal —
        # HUGEINT = decimal128(38, 0) — does NOT hash like int64 (the r2
        # seq_packing failure). Keep scale-0 decimals distinct from ints.
        return "float" if t.scale > 0 else "decimal-int"
    if pa.types.is_float64(t):
        return "float"
    return str(t)


def type_mismatches(spark_schema: pa.Schema, duck_schema: pa.Schema):
    out = []
    for sf_, df_ in zip(spark_schema, duck_schema):
        if arrow_type_key(sf_.type) != arrow_type_key(df_.type):
            out.append(f"{sf_.name}: spark={sf_.type} duckdb={df_.type}")
    return out


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def check_queries(spark, sf_dir: str, only=None, log=print) -> list:
    """Run every __spark_entry__ query vs its DuckDB oracle at sf_dir and
    return [(name, reason)] failures. Importable — tests/test_entry_gate.py
    runs this (typed comparison included) on every oracled query so type
    drift is caught by pytest before the driver's hash gate sees it."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stbl = sdf.toArrow()
            srows = [tuple(r.values()) for r in stbl.to_pylist()]
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            log(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            log(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            dtbl = con.execute(oracles[name]).arrow()
            dcols = dtbl.column_names
            drows = [tuple(r.values()) for r in dtbl.to_pylist()]
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            log(f"FAIL {name}: duckdb error {e}")
            continue
        if scols != dcols:
            failures.append((name, f"cols {scols} vs {dcols}"))
            log(f"FAIL {name}: cols {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            log(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        tmis = type_mismatches(stbl.schema, dtbl.schema)
        if tmis:
            failures.append((name, f"arrow types differ: {tmis}"))
            log(f"FAIL {name}: arrow types differ: {tmis}")
            continue
        a = sorted(tuple(norm(v) for v in r) for r in ([*r] for r in srows))
        b = sorted(tuple(norm(v) for v in r) for r in drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            log(f"FAIL {name}: values differ e.g. {diff}")
        else:
            log(f"ok   {name}: {len(srows)} rows match")
    return failures


def main():
    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=8)
    failures = check_queries(spark, SF_DIR, only=ONLY)
    print(f"\n{len(failures)} failures / {len(entrymod.queries())} queries")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
