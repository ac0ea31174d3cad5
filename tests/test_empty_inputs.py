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


@pytest.fixture(scope="module")
def nulled_sf_dir(sf_dir, tmp_path_factory):
    """sf0.001 with 10% NULLs injected into the nullable value columns
    (document text/lang, event value/props, embedding vectors)."""
    d = tmp_path_factory.mktemp("sf_nulls")
    mods = {
        "documents": (
            "SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN NULL ELSE text END AS text, "
            "CASE WHEN doc_id % 10 = 4 THEN NULL ELSE lang END AS lang, source, n_chars FROM t"
        ),
        "events": (
            "SELECT event_id, ts, user_id, event_type, "
            "CASE WHEN event_id % 10 = 3 THEN NULL ELSE value END AS value, "
            "CASE WHEN event_id % 10 = 4 THEN NULL ELSE props END AS props FROM t"
        ),
        "embeddings": (
            "SELECT vec_id, CASE WHEN vec_id % 10 = 3 THEN NULL ELSE embedding END AS embedding, "
            "label FROM t"
        ),
    }
    con = duckdb.connect()
    for t in TABLES:
        sel = mods.get(t, "SELECT * FROM t").replace(
            " FROM t", f" FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
        con.execute(f"COPY ({sel}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


def test_every_query_tolerates_null_values(spark, nulled_sf_dir):
    """A real corpus has missing fields; no query may crash on NULL
    text / lang / value / props / embedding rows."""
    failures = []
    for key in sorted(QUERIES):
        try:
            QUERIES[key](spark, nulled_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{key}: {type(ex).__name__}: {str(ex).splitlines()[0][:100]}")
    assert not failures, "queries crashed on NULL inputs:\n" + "\n".join(failures)


@pytest.fixture(scope="module")
def adversarial_sf_dir(sf_dir, tmp_path_factory):
    """documents with adversarial text: empty strings, whitespace-only,
    emoji/CJK/RTL unicode, embedded tabs/newlines, 5000-char tokens."""
    d = tmp_path_factory.mktemp("sf_adversarial")
    adv = """SELECT doc_id,
     CASE doc_id % 7
       WHEN 0 THEN ''
       WHEN 1 THEN '🚀🔥 émojis and ünïcode 北京 مرحبا текст'
       WHEN 2 THEN repeat('x', 5000)
       WHEN 3 THEN concat('tabs\tand\nnewlines  ', text)
       WHEN 4 THEN ' '
       ELSE text END AS text,
     lang, source, n_chars
     FROM read_parquet('{src}/documents.parquet')"""
    con = duckdb.connect()
    con.execute(
        f"COPY ({adv.format(src=sf_dir)}) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t != "documents":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')) "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


def test_every_query_tolerates_adversarial_text(spark, adversarial_sf_dir):
    """Empty / whitespace-only / unicode / giant-token documents must
    not crash any query (ANSI mode turns division-by-zero on
    degenerate docs into task failures — guarded in textstats)."""
    failures = []
    for key in sorted(QUERIES):
        try:
            QUERIES[key](spark, adversarial_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{key}: {type(ex).__name__}: {str(ex).splitlines()[0][:100]}")
    assert not failures, "queries crashed on adversarial text:\n" + "\n".join(failures)
