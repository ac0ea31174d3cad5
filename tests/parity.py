"""Local replica of the driver's oracle-parity check: row count, column
names, and order-insensitive value equality between a Spark result and
its DuckDB oracle."""

from __future__ import annotations

import math

import duckdb

from etl_sql_and_pyspark_developement__spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        df[c] = df[c].map(_norm_cell)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(map(str, r)))
    return cols, rows


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # bit-exact: queries are required to produce byte-identical
        # doubles to the oracle (rounding discipline + -0.0 handling),
        # so compare the full repr, not a truncated format
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    # numpy scalars -> python
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    return str(v)


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, key: str = "?"):
    duck = run_oracle(oracle_sql, sf_dir)
    pdf = spark_df.toPandas()
    assert sorted(pdf.columns) == sorted(duck.columns), (
        f"{key}: column mismatch spark={sorted(pdf.columns)} oracle={sorted(duck.columns)}"
    )
    assert len(pdf) == len(duck), f"{key}: row count spark={len(pdf)} oracle={len(duck)}"
    _, srows = _normalize(pdf)
    _, drows = _normalize(duck)
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{key}: row {i} differs\n spark={a}\n oracle={b}"
