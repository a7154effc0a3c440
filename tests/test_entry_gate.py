"""Typed local replica of the driver's correctness gate.

Every oracled __spark_entry__ query runs against its DuckDB twin at the
micro sf (sf0.001) with the TYPED comparison from scripts/check_entry.py —
row count, column names, order-insensitive values, and physical Arrow
column types. The type check is the point: the driver's value hash is
typed, so equal Python values with different wire types (DuckDB window
SUM(BIGINT) → HUGEINT/decimal128 vs Spark int64 — the r2 seq_packing
failure) fail the driver while a value-level compare passes locally.
This test would have caught that drift before the driver did.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

SF_DIR = "/root/testdata/sf0.001"


def test_all_oracled_queries_typed(spark):
    from check_entry import check_queries

    failures = check_queries(spark, SF_DIR, log=lambda *_: None)
    assert not failures, "\n".join(f"{n}: {r}" for n, r in failures)
