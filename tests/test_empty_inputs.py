"""Empty-input robustness: every registered query must run (and return
zero or aggregate-only rows, not crash) when every table is empty —
the situation a pipeline hits on an empty ingest partition, a
filtered-out date range, or a cold-start corpus."""

from __future__ import annotations

import duckdb
import pytest

from etl_sql_and_pyspark_developement__spark.plans import QUERIES
from etl_sql_and_pyspark_developement__spark.sources.catalog import TABLES


@pytest.fixture(scope="module")
def empty_sf_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') "
            f"WHERE 1=0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_tolerates_empty_tables(spark, empty_sf_dir):
    failures = []
    for key in sorted(QUERIES):
        try:
            QUERIES[key](spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            failures.append(f"{key}: {type(ex).__name__}: {str(ex).splitlines()[0][:100]}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)
