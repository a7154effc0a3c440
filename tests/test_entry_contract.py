"""Driver-contract guard: entry() smoke + queries()/oracle_sql() shape +
a few representative query executions at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # a healthy majority is oracle-checked
    assert len(oracles) >= 25


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "content", "similarity", "tier"} <= set(df.columns)


@pytest.mark.parametrize(
    "name", ["s2_dedup_insert", "w4_vector_topk", "j4_hybrid_merge", "text_quality"]
)
def test_representative_queries_match_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, SF)
    srows = sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in ([*r] for r in sdf.collect())
    )
    res = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    assert sdf.columns == dcols
    drows = sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in res.fetchall()
    )
    assert srows == drows
