"""Salted join / two-phase agg must be result-identical to the plain
versions (they only change the physical distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_matches_plain(spark, sf_dir):
    from etl_sql_and_pyspark_developement__spark.operators.salt import salted_join
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, cust, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_rejects_right_and_full(spark, sf_dir):
    """Round-7 VERDICT: how="right"/"full" would emit each unmatched
    small-side row once PER SALT REPLICA (salt x duplicate
    null-extended rows) — the operator must refuse, not silently
    corrupt. Left/semi/anti stay accepted (big side is never
    replicated, so they are exact)."""
    import pytest

    from etl_sql_and_pyspark_developement__spark.operators.salt import salted_join
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="per salt replica"):
            salted_join(orders, cust, "o_custkey", salt=4, how=how)
    # left join with an UNMATCHED big-side key stays exact: null-
    # extended rows appear once, not once per replica.
    neg = orders.withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(10_000_000)
    ).limit(50)
    left = salted_join(neg, cust, "o_custkey", salt=4, how="left")
    assert left.count() == 50


def test_two_phase_agg_matches_plain(spark, sf_dir):
    from etl_sql_and_pyspark_developement__spark.operators.salt import two_phase_agg
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    li = table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, r.q, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    two = {
        r.l_returnflag: (r.n, r.q, r.mx)
        for r in two_phase_agg(
            li,
            ["l_returnflag"],
            {"n": "count(*)", "q": "sum(l_quantity)", "mx": "max(l_extendedprice)"},
            salt=8,
        ).collect()
    }
    assert set(plain) == set(two)
    for k in plain:
        assert plain[k][0] == two[k][0]
        assert abs(plain[k][1] - two[k][1]) < 1e-6
        assert plain[k][2] == two[k][2]


def test_two_phase_rejects_nondecomposable(spark, sf_dir):
    import pytest

    from etl_sql_and_pyspark_developement__spark.operators.salt import two_phase_agg
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    li = table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="not decomposable"):
        two_phase_agg(li, ["l_returnflag"], {"a": "avg(l_quantity)"})


def test_skew_profile_exact_and_tiebreak(spark):
    """Hand-checked profile: a 6/2/2 key distribution, with the
    heaviest-key tie broken toward the lexicographically larger key."""
    from etl_sql_and_pyspark_developement__spark.operators.salt import skew_profile

    rows = [("hot",)] * 6 + [("aa",)] * 2 + [("bb",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = skew_profile(df, "k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_n, r.top_key) == (10, 3, 6, "hot")
    assert r.top_ppm == 600_000
    assert r.avg_group_x1000 == (1000 * 10) // 3
    assert r.skew_ppm == (1_000_000 * 6 * 3) // 10  # 1.8x mean

    tied = spark.createDataFrame([("a",), ("a",), ("z",), ("z",)], "k string")
    r2 = skew_profile(tied, "k").collect()[0]
    assert r2.top_key == "z", "tie must break to the larger key string"
    assert r2.skew_ppm == 1_000_000, "uniform distribution -> exactly 1x mean"
