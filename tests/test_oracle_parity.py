"""Local replica of the driver's DuckDB-oracle correctness gate.

For every query with an oracle: run the Spark impl and the DuckDB SQL on
the same sf0.01 parquet, compare row count, column names, and an
order-insensitive value comparison (sorted rows, stringified values).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from edsnlp_spark.queries import all_queries

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, (_, sql) in _QUERIES.items() if sql)
NO_ORACLE = sorted(n for n, (_, sql) in _QUERIES.items() if not sql)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # normalize -0.0 and integral floats
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return f"{val:.6g}"
    if isinstance(val, bool):
        return str(bool(val))
    return str(val)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, sf_dir):
    import concurrent.futures

    fn, sql = _QUERIES[name]
    # Run the DuckDB oracle concurrently with the Spark side (r15,
    # VERDICT r14 #6 suite wall time): the two engines are independent
    # processes/threads over read-only parquet, both release the GIL
    # while executing, and the comparison below is unchanged.
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        ofut = ex.submit(lambda: duck_con(sf_dir).execute(sql).df())
        sdf = fn(spark, sf_dir).toPandas()
        odf = ofut.result()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"

    s_rows = canon_rows(list(sdf.columns), sdf.itertuples(index=False))
    o_rows = canon_rows(list(odf.columns), odf.itertuples(index=False))
    if s_rows != o_rows:
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(name, spark, sf_dir):
    fn, _ = _QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
