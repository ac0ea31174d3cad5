"""Unit tests for the shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_safe_div_null_on_zero(spark):
    from etl_sql_and_pyspark_developement__spark.functions import safe_div

    df = spark.createDataFrame([(10.0, 4.0), (1.0, 0.0)], ["n", "d"])
    got = [r.q for r in df.select(safe_div(F.col("n"), F.col("d")).alias("q")).collect()]
    assert got[0] == 2.5
    assert got[1] is None


def test_pct_and_zscore(spark):
    from etl_sql_and_pyspark_developement__spark.functions import pct, zscore

    df = spark.createDataFrame([(25.0, 100.0, 10.0, 5.0)], ["x", "t", "m", "s"])
    r = df.select(
        pct(F.col("x"), F.col("t")).alias("p"),
        zscore(F.col("x"), F.col("m"), F.col("s")).alias("z"),
    ).collect()[0]
    assert r.p == 25.0
    assert r.z == 3.0


def test_bucket_by_thresholds(spark):
    from etl_sql_and_pyspark_developement__spark.functions import bucket_by_thresholds

    df = spark.createDataFrame([(1,), (15,), (100,)], ["v"])
    buckets = bucket_by_thresholds(
        F.col("v"), [(5, "low"), (50, "mid")], "high"
    )
    got = [r.b for r in df.select(buckets.alias("b")).collect()]
    assert got == ["low", "mid", "high"]


def test_needs_driver_row_names_real_queries():
    """Every key in the driver-priority backlog must be a registered
    query — a typo here would silently demote a real backlog entry
    below the driver's 50-row sampling horizon."""
    import __spark_entry__ as entry

    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    unknown = [k for k in entry._NEEDS_DRIVER_ROW if k not in QUERIES]
    assert not unknown, f"backlog names unknown queries: {unknown}"


def test_udtf_split_installments_conservation(spark):
    """Standalone table-call + conservation: the installment split is
    a partition of cents — sum(inst_cents) == cents for every row,
    remainder cents land on the EARLIEST installments."""
    from etl_sql_and_pyspark_developement__spark.functions.udtfs import (
        SplitInstallments,
    )

    spark.udtf.register("split_installments", SplitInstallments)
    rows = spark.sql(
        "SELECT * FROM split_installments(5, 1001)"
    ).collect()
    # orderkey 5 -> n = 3; 1001 = 334 + 334 + 333
    assert [(r.inst_no, r.inst_cents) for r in rows] == [
        (1, 334), (2, 334), (3, 333),
    ]
    agg = spark.sql(
        """
        SELECT t.k, t.cents, sum(s.inst_cents) AS total
        FROM VALUES (1, 999), (2, 1000), (3, 7), (6, 0) t(k, cents),
             LATERAL split_installments(t.k, t.cents) s
        GROUP BY t.k, t.cents
        """
    ).collect()
    assert all(r.total == r.cents for r in agg), "split must conserve cents"


def test_udtf_polymorphic_schema(spark):
    """The analyze()-time schema: column COUNT is a plan-time function
    of the constant width argument; a non-constant width must be
    rejected at analysis, not at runtime."""
    import pytest
    from pyspark.sql.functions import udtf

    from etl_sql_and_pyspark_developement__spark.functions.udtfs import (
        CharNgrams,
    )

    spark.udtf.register("char_ngrams", udtf(CharNgrams))
    wide = spark.sql("SELECT * FROM char_ngrams('hello', 4)")
    assert wide.columns == ["n_grams", "g0", "g1", "g2", "g3"]
    assert wide.collect() == [
        spark.sql("SELECT 3 n_grams, 'hel' g0, 'ell' g1, 'llo' g2,"
                  " CAST(NULL AS STRING) g3").collect()[0]
    ]
    narrow = spark.sql("SELECT * FROM char_ngrams('hello', 2)")
    assert narrow.columns == ["n_grams", "g0", "g1"]
    with pytest.raises(Exception, match="constant"):
        spark.sql(
            "SELECT s.* FROM VALUES (2) t(w),"
            " LATERAL char_ngrams('hello', t.w) s"
        ).collect()


def test_approx_top_k_regimes(spark):
    """The two regimes the q121 lane's docstring promises:
    capacity >= cardinality -> EXACT counts for every key;
    capacity << cardinality on SKEWED data -> the hot key surfaces
    with estimate >= exact (the sketch never undercounts a reported
    heavy hitter). Near-uniform data at low capacity may return
    NOTHING certifiable — pinned so nobody 'fixes' it into a flake."""
    import pyspark.sql.functions as F

    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(100) for _ in range(5)]
    df = spark.createDataFrame(rows, "k string")

    def top(capacity, k):
        return {
            r["item"]: r["count"]
            for r in df.agg(
                F.expr(f"approx_top_k(k, {k}, {capacity})").alias("tk")
            ).select(F.explode("tk").alias("e")).select("e.*").collect()
        }

    exact_all = top(10000, 200)
    assert exact_all["hot"] == 500 and len(exact_all) == 101
    assert all(v == (500 if key == "hot" else 5) for key, v in exact_all.items())

    skew = top(16, 3)
    assert "hot" in skew, "skewed heavy hitter must survive low capacity"
    assert skew["hot"] >= 500, "reported heavy hitter must not undercount"
    assert skew["hot"] - 500 <= 1000 // 16, "overcount beyond n/capacity"

    uniform = spark.createDataFrame(
        [(f"u{i % 150}",) for i in range(1500)], "k string"
    )
    thin = {
        r["item"]: r["count"]
        for r in uniform.agg(F.expr("approx_top_k(k, 5, 16)").alias("tk"))
        .select(F.explode("tk").alias("e")).select("e.*").collect()
    }
    assert len(thin) <= 5


def test_row_udf_pricing_exhibit_matches_both_twins(spark, sf_dir):
    """The row-at-a-time pricing exhibit must agree with the Arrow UDF
    AND the builtin expression on every document (NULLs included) —
    it exists only to be measured, but a wrong exhibit would price a
    different computation. Also pins the plan boundary: the row UDF
    plans BatchEvalPython, the pandas UDF ArrowEvalPython."""
    from pyspark.sql import functions as F

    from etl_sql_and_pyspark_developement__spark.functions.arrow_udfs import (
        quality_score_row_udf,
        quality_score_udf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    docs = docs.unionByName(
        spark.createDataFrame([(None,)], "text string")
    )
    n_chars = F.length("text")
    n_ws = n_chars - F.length(F.translate("text", " ", ""))
    n_dg = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    expr_score = (
        F.lit(1000) * n_chars + F.lit(7) * n_ws + F.lit(3) * n_dg
    ).cast("bigint")
    out = docs.select(
        quality_score_row_udf("text").alias("row_score"),
        quality_score_udf("text").alias("arrow_score"),
        expr_score.alias("expr_score"),
    )
    bad = out.filter(
        ~(
            (
                F.col("row_score").eqNullSafe(F.col("arrow_score"))
            )
            & F.col("row_score").eqNullSafe(F.col("expr_score"))
        )
    ).count()
    assert bad == 0, "all three rungs must compute the same score"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in plan, "row UDF must plan BatchEvalPython"
    assert "ArrowEvalPython" in plan, "pandas UDF must plan ArrowEvalPython"


def test_t26_fault_classes_non_vacuous_and_nfc_kernel(spark, sf_dir):
    """t26's audit must count NON-ZERO totals for every planted fault
    class (a hygiene lane that audits all-zeros is vacuous — the q120
    lesson), and the NFC kernel must agree with Python's unicodedata
    on canonical cases including NULL."""
    from pyspark.sql import functions as F

    from etl_sql_and_pyspark_developement__spark.functions.arrow_udfs import (
        is_not_nfc_udf,
    )
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    out = QUERIES["t26_unicode_hygiene"](spark, sf_dir)
    tot = out.agg(
        F.sum("n_zero_width").alias("zw"),
        F.sum("n_replacement").alias("re"),
        F.sum("n_nonnfc").alias("nn"),
        F.sum("scrub_delta").alias("sd"),
    ).collect()[0]
    assert tot.zw > 0 and tot.re > 0 and tot.nn > 0, (
        f"every planted fault class must be counted: {tot}"
    )
    assert tot.sd >= tot.zw + tot.re, (
        "the scrub must remove at least the injected characters"
    )

    cases = spark.createDataFrame(
        [("plain",), ("café",), ("café",), (None,)],
        "t string",
    )
    got = [
        r.f
        for r in cases.select(is_not_nfc_udf("t").alias("f")).collect()
    ]
    assert got == [False, False, True, None], got
