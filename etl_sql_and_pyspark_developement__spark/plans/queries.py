"""The §2 query inventory: each entry is a (spark, sf_dir) -> DataFrame
callable re-expressing a reference capability Spark-first.

Conventions (driver-contract critical):
- Every computed column is aliased, with the *same* name used in the
  DuckDB oracle (plans/oracles.py) — the driver's comparator sorts
  columns by name and hashes values.
- All double outputs are rounded (money: 2 dp, rates/averages: 4 dp) so
  summation-order nondeterminism can't flip the value hash.
- Date anchors are literals or derived from the data, never
  current_date(), so results are deterministic.
"""

from __future__ import annotations

import functools

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sql_and_pyspark_developement__spark.sources.catalog import (
    cached_parquet,
    table,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def query(key: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Idempotent session guard: the driver may call queries()
            # on a session that never went through entry(); UTC + AQE
            # must hold for timestamp parity with the DuckDB oracles.
            from etl_sql_and_pyspark_developement__spark.session import (
                configure_existing,
            )

            configure_existing(spark)
            return fn(spark, sf_dir)

        QUERIES[key] = wrapped
        # Return the guarded wrapper so DIRECT imports/calls of a query
        # function get the same session guard as QUERIES[key] lookups.
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Core relational / analytics parity (SURVEY §2 table 1)
# ---------------------------------------------------------------------------


@query("q01_pricing_summary")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide groupBy multi-agg (TPC-H Q1 shape).

    Reference parity: the grouped-metric rollups in
    pyspark/User Engagement Funnel Analysis.py:17-24 (8-agg groupBy) and
    Infrastructure Cost Optimization by Content Type.py.

    Scale: single shuffle on two low-cardinality keys; all aggregates
    decompose into partial (map-side) + final — optimal at any SF.
    """
    from etl_sql_and_pyspark_developement__spark.functions import disc_price as _dp

    li = table(spark, sf_dir, "lineitem")
    disc_price = _dp()
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 3).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query("q02_engagement_rollup")
def q02_engagement_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi LEFT JOIN + CASE segmentation + ROLLUP + GROUPING + HAVING.

    Reference parity: SQL/User Engagement Funnel Analysis.txt (WITH
    ROLLUP over engagement segments) and its pyspark twin's
    rollup(...).agg(...) stage.

    Scale: the customer⋈orders join shuffles on the key once; the
    rollup runs on the already-aggregated per-customer table (one row
    per customer), so super-aggregate rows cost a second tiny pass.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
        .withColumn(
            "order_segment",
            F.when(F.col("n_orders") == 0, "Inactive")
            .when(F.col("n_orders") <= 5, "Light")
            .when(F.col("n_orders") <= 12, "Medium")
            .otherwise("Heavy"),
        )
    )
    return (
        per_cust.rollup("c_mktsegment", "order_segment")
        .agg(
            F.grouping("c_mktsegment").alias("g_mktsegment"),
            F.grouping("order_segment").alias("g_order_segment"),
            F.count("*").alias("user_count"),
            F.round(F.avg("n_orders"), 4).alias("avg_orders"),
            F.round(F.avg("spend"), 2).alias("avg_spend"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
        )
        .filter(F.col("user_count") > 10)
        .orderBy("g_mktsegment", "g_order_segment", "c_mktsegment", "order_segment")
    )


@query("q03_sessionization")
def q03_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (LAG + cumulative session ids) and
    per-user session statistics.

    Reference parity: SQL/Binge-Watching Behavior Analysis.txt:10-56
    (LAG over profile/time, 4-hour max gap, per-binge aggregates).
    """
    from etl_sql_and_pyspark_developement__spark.operators.sessionize import sessionize

    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id")
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (
            (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")))
            / 60.0
        ).alias("minutes"),
        F.sum("value").alias("sess_value"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_session_events"),
            F.round(F.avg("minutes"), 4).alias("avg_session_minutes"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("sess_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@query("q04_churn_risk")
def q04_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-vs-historical conditional aggregation + integer risk
    scoring + segment rollup.

    Reference parity: pyspark/Churn Prediction and Risk Analysis.py
    (recent_period/historical_period conditional aggs, churn_risk_score,
    engagement_segment, final segment rollup). Integer risk points
    instead of float weights keep classification boundaries exact.

    Scale: single groupBy on the fact; all conditionals are map-side.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    recent_start = F.to_timestamp(F.lit("2000-08-01"))
    hist_start = F.to_timestamp(F.lit("1999-08-01"))
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.when(F.col("o_orderdate") >= recent_start, 1).otherwise(0)).alias(
                "recent_orders"
            ),
            F.sum(
                F.when(
                    (F.col("o_orderdate") >= hist_start)
                    & (F.col("o_orderdate") < recent_start),
                    1,
                ).otherwise(0)
            ).alias("hist_orders"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("o_orderdate") >= recent_start, F.col("o_totalprice")
                        )
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("recent_spend"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )
    scored = per_cust.withColumn(
        "risk_points",
        F.when(F.col("recent_orders") == 0, 40).otherwise(0)
        + F.when(
            (F.col("hist_orders") > 0)
            & ((F.col("hist_orders") - F.col("recent_orders")) * 2 > F.col("hist_orders")),
            30,
        ).otherwise(0)
        + F.when(F.col("recent_spend") < 50000, 20).otherwise(0)
        + F.when(F.col("n_priorities") <= 1, 10).otherwise(0),
    ).withColumn(
        "churn_segment",
        F.when(F.col("recent_orders") == 0, "Inactive")
        .when(
            (F.col("hist_orders") > 0)
            & ((F.col("hist_orders") - F.col("recent_orders")) * 2 > F.col("hist_orders")),
            "Declining",
        )
        .when(F.col("recent_orders") < F.lit(3), "Light")
        .otherwise("Active"),
    )
    return (
        scored.groupBy("c_mktsegment", "churn_segment")
        .agg(
            F.count("*").alias("user_count"),
            F.round(F.avg("risk_points"), 4).alias("avg_risk_points"),
            F.sum(F.when(F.col("risk_points") >= 60, 1).otherwise(0)).alias(
                "high_risk_users"
            ),
            F.sum(
                F.when(
                    (F.col("risk_points") >= 30) & (F.col("risk_points") < 60), 1
                ).otherwise(0)
            ).alias("medium_risk_users"),
            F.round(F.avg("recent_orders"), 4).alias("avg_recent_orders"),
            F.round(F.avg("hist_orders"), 4).alias("avg_hist_orders"),
        )
        .filter(F.col("user_count") >= 5)
        .orderBy("c_mktsegment", "churn_segment")
    )


@query("q05_cohort_retention")
def q05_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order-month cohort × month-offset retention matrix.

    Reference parity: SQL/Content Performance with Cohort Analysis.txt
    (cohort_month via MIN over first activity, retention vs cohort
    size).
    """
    from etl_sql_and_pyspark_developement__spark.operators.cohort import (
        cohort_retention,
    )

    orders = table(spark, sf_dir, "orders")
    return cohort_retention(orders, "o_custkey", "o_orderdate").orderBy(
        "cohort_month", "month_offset"
    )


@query("q06_market_basket")
def q06_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join co-occurrence pairs with support counts.

    Reference parity: SQL/Content Affinity and Cross-Genre Analysis.txt
    (profiles watching both A and B; pair ranking).
    """
    from etl_sql_and_pyspark_developement__spark.operators.cooccurrence import (
        pair_cooccurrence,
    )

    li = table(spark, sf_dir, "lineitem")
    pairs = pair_cooccurrence(li, "l_orderkey", "l_partkey")
    return pairs.orderBy(
        F.desc("pair_count"), "item_a", "item_b"
    ).limit(100)


@query("q07_catalog_gap")
def q07_catalog_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join demand-vs-catalog gap analysis (NOT EXISTS).

    Reference parity: SQL/Content Catalog Gap Analysis.txt (content
    present in catalog but never viewed / demanded but missing).

    Scale: left_anti join shuffles on l_partkey after a distinct that
    collapses the fact; per-brand counts are partial-agg friendly.
    """
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    ordered_keys = li.select(F.col("l_partkey").alias("p_partkey")).distinct()
    never = part.join(ordered_keys, "p_partkey", "left_anti")
    brand_totals = part.groupBy("p_brand").agg(F.count("*").alias("n_parts"))
    brand_missing = never.groupBy("p_brand").agg(
        F.count("*").alias("n_never_ordered")
    )
    return (
        brand_totals.join(brand_missing, "p_brand", "left")
        .withColumn(
            "n_never_ordered", F.coalesce(F.col("n_never_ordered"), F.lit(0))
        )
        .withColumn(
            "pct_never_ordered",
            F.round(F.col("n_never_ordered") * 100.0 / F.col("n_parts"), 4),
        )
        .orderBy("p_brand")
    )


@query("q08_pivot_platform")
def q08_pivot_platform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on a categorical column + per-entity mix ratios.

    Reference parity: SQL/Cross-Platform User Behavior Analysis.txt
    (device-type pivot per user) — Spark's .pivot() with an explicit
    value list so the plan is static (no extra distinct pass).
    """
    from etl_sql_and_pyspark_developement__spark.functions import safe_div

    ev = table(spark, sf_dir, "events")
    kinds = ["view", "click", "purchase", "signup", "error"]
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )
    renamed = pivoted.select(
        "user_id", *[F.col(k).alias(f"n_{k}") for k in kinds]
    )
    total = sum(F.col(f"n_{k}") for k in kinds)
    return (
        renamed.withColumn("n_total", total.cast("long"))
        .withColumn(
            "click_rate", safe_div(F.col("n_click"), F.col("n_view"))
        )
        .withColumn(
            "purchase_rate", safe_div(F.col("n_purchase"), F.col("n_click"))
        )
        .orderBy("user_id")
    )


@query("q09_geo_topk")
def q09_geo_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo hierarchy join + rank-per-group top-k.

    Reference parity: SQL/Geographic Content Preference Mapping.txt
    (per-region content ranking).

    Scale: region/nation broadcast (tiny dims); the only shuffle is
    the per-customer aggregation; the window's partition key reuses it.
    """
    from etl_sql_and_pyspark_developement__spark.operators.topk import top_k_per_group

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    geo = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(geo, cust.c_nationkey == F.col("n_nationkey"))
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_custkey").alias("custkey"),
            "revenue",
        )
    )
    return (
        top_k_per_group(
            per_cust,
            ["nation_name"],
            [F.desc("revenue"), F.col("custkey")],
            k=3,
            rank_name="rnk",
        )
        .select("region_name", "nation_name", "rnk", "custkey", "revenue")
        .orderBy("region_name", "nation_name", "rnk")
    )


@query("q10_seasonal")
def q10_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_part seasonality with a seasonal index vs overall mean.

    Reference parity: SQL/Seasonal Viewing Pattern Analysis.txt
    (month-of-year viewing intensity vs annual average).
    """
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("revenue"),
    )
    w = Window.partitionBy()
    return (
        monthly.withColumn(
            "seasonal_index",
            F.round(F.col("revenue") / F.avg("revenue").over(w), 4),
        )
        .select(
            "month",
            "n_orders",
            F.round("revenue", 2).alias("revenue"),
            "seasonal_index",
        )
        .orderBy("month")
    )


@query("q11_state_transitions")
def q11_state_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG state machine → transition matrix.

    Reference parity: SQL/Subscription Upgrade-Downgrade Patterns.txt
    (consecutive subscription states per user via LAG, transition
    counts and shares).
    """
    from etl_sql_and_pyspark_developement__spark.operators.transitions import (
        state_transitions,
    )

    orders = table(spark, sf_dir, "orders")
    return state_transitions(
        orders, "o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey"
    ).orderBy("from_state", "to_state")


@query("q12_ltv_deciles")
def q12_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile bucketing over customer lifetime value.

    Reference parity: pyspark/User Lifetime Value Prediction.py
    (per-user LTV, value-tier bucketing).

    Scale: deciles come from operators/quantiles.scalable_ntile —
    EXACT NTILE semantics (bit-identical to the global-window form,
    matching the DuckDB oracle) via distributed range-bucketed rank,
    so no single task ever sorts the whole customer table.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        scalable_ntile,
    )

    orders = table(spark, sf_dir, "orders")
    ltv = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("ltv"),
        F.count("*").alias("n_orders"),
    )
    return (
        scalable_ntile(ltv, "ltv", 10, "o_custkey", out_col="decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("ltv"), 2).alias("avg_ltv"),
            F.round(F.min("ltv"), 2).alias("min_ltv"),
            F.round(F.max("ltv"), 2).alias("max_ltv"),
            F.sum("n_orders").alias("total_orders"),
        )
        .orderBy("decile")
    )


@query("q13_ab_test")
def q13_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm A/B test statistics (n, mean, sample stddev, conversion).

    Reference parity: SQL/Test Analysis.txt (per-test-arm engagement
    means/stddevs and lift). Arm assignment is a deterministic hash
    split (user_id parity), the standard production A/B bucketing.
    """
    ev = table(spark, sf_dir, "events")
    armed = ev.withColumn("arm", (F.col("user_id") % 2).cast("int"))
    return (
        armed.groupBy("arm")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 4).alias("mean_value"),
            F.round(F.stddev("value"), 4).alias("stddev_value"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                * 1.0
                / F.count("*"),
                4,
            ).alias("purchase_rate"),
        )
        .orderBy("arm")
    )


@query("q14_percentile_benchmark")
def q14_percentile_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + exact interpolated percentiles (PERCENTILE_CONT)
    benchmarking each supplier within its nation cohort.

    Reference parity: SQL/Competitive Content Benchmarking.txt
    (PERCENTILE_CONT / PERCENT_RANK cross-benchmarks — the reference
    ranks within genre cohort, SQL lines 15-16, so the rank windows
    here partition by nation).

    Scale: per-supplier agg shuffles once on l_suppkey; rank windows
    partition by nation (no unpartitioned ORDER BY — each nation's
    suppliers sort in their own task); nation medians aggregate the
    tiny per-supplier table; the dim join broadcasts.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    per_supp = rev.join(
        F.broadcast(supp.join(nation, supp.s_nationkey == nation.n_nationkey)),
        rev.l_suppkey == F.col("s_suppkey"),
    ).select(
        F.col("s_suppkey").alias("suppkey"), F.col("n_name").alias("nation_name"), "revenue"
    )
    w = Window.partitionBy("nation_name").orderBy("revenue")
    wq = Window.partitionBy("nation_name").orderBy(
        F.desc("revenue"), F.col("suppkey")
    )
    ranked = per_supp.withColumn(
        "pct_rank", F.round(F.percent_rank().over(w), 6)
    ).withColumn("quartile", F.ntile(4).over(wq))
    medians = per_supp.groupBy("nation_name").agg(
        F.round(F.expr("percentile(revenue, 0.5)"), 2).alias("nation_median_revenue"),
        F.round(F.expr("percentile(revenue, 0.9)"), 2).alias("nation_p90_revenue"),
    )
    return (
        ranked.join(medians, "nation_name")
        .select(
            "suppkey",
            "nation_name",
            "revenue",
            "pct_rank",
            "quartile",
            "nation_median_revenue",
            "nation_p90_revenue",
        )
        .orderBy("suppkey")
    )


@query("q15_corr_features")
def q15_corr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + dispersion features per group.

    Reference parity: SQL/Predictive Content Performance Modeling.txt
    (CORR feature engineering per content segment).
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    )
    return (
        joined.groupBy("p_type")
        .agg(
            F.count("*").alias("n_lines"),
            (F.round(F.corr("l_discount", "l_quantity"), 4) + 0.0).alias("corr_disc_qty"),
            (F.round(F.corr("l_extendedprice", "l_quantity"), 4) + 0.0).alias(
                "corr_price_qty"
            ),
            F.round(F.stddev("l_quantity"), 4).alias("stddev_qty"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .orderBy("p_type")
    )


@query("q16_roi_deciles")
def q16_roi_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-vs-list-value ROI ratio + decile bucketing.

    Reference parity: SQL/Content Production ROI Analysis.txt
    (production cost vs generated revenue, ROI tiers).

    Scale: decile bucketing via quantiles.scalable_ntile — exact NTILE
    without an unpartitioned window (see q12).
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        scalable_ntile,
    )

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.sum("l_quantity").alias("qty"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("list_value", F.col("p_retailprice") * F.col("qty"))
        .withColumn("roi", F.round(F.col("revenue") / F.col("list_value"), 6))
    )
    return (
        scalable_ntile(per_part, "roi", 10, "p_partkey", out_col="roi_decile")
        .groupBy("roi_decile")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("roi"), 6).alias("avg_roi"),
            F.round(F.sum("revenue"), 4).alias("total_revenue"),
            F.round(F.avg("revenue"), 4).alias("avg_revenue"),
        )
        .orderBy("roi_decile")
    )


@query("q17_daily_growth")
def q17_daily_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time series with LAG growth, LEAD forward growth, and a
    7-day moving average.

    Reference parity: SQL/Social Network Effects on Content Virality.txt
    (day-over-day viewing growth via LAG AND the forward-looking
    next-period delta via LEAD, viral velocity windows).

    Scale: facts collapse to one row per day FIRST (partial-agg
    groupBy); the windows then run over the tiny series — never a
    global window over raw facts.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    w = Window.orderBy("day")
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn(
            "growth_pct",
            F.round(
                (F.col("n_events") - F.lag("n_events").over(w))
                * 100.0
                / F.lag("n_events").over(w),
                4,
            ),
        )
        .withColumn("next_events", F.lead("n_events").over(w))
        .withColumn(
            "fwd_growth_pct",
            F.round(
                (F.lead("n_events").over(w) - F.col("n_events"))
                * 100.0
                / F.col("n_events"),
                4,
            ),
        )
        .withColumn("ma7_events", F.round(F.avg("n_events").over(w7), 4))
        .orderBy("day")
    )


@query("q18_distribution_stats")
def q18_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution statistics (stddev, exact median, range).

    Reference parity: SQL/Multi-Profile Family Usage Patterns.txt
    (per-account profile-count distributions).
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("n_orders"), 4).alias("avg_orders"),
            F.round(F.stddev("n_orders"), 4).alias("stddev_orders"),
            F.round(F.expr("percentile(n_orders, 0.5)"), 4).alias("median_orders"),
            F.min("n_orders").alias("min_orders"),
            F.max("n_orders").alias("max_orders"),
        )
        .orderBy("nation_name")
    )


@query("q19_funnel_conversion")
def q19_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged funnel with per-stage user counts and conversion rates.

    Reference parity: SQL/Real-time Personalization Effectiveness.txt +
    User Engagement Funnel (impression→click→conversion staging).
    """
    from etl_sql_and_pyspark_developement__spark.functions import safe_div

    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.withColumn("channel", (F.col("user_id") % 5).cast("int"))
        .groupBy("user_id", "channel")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("saw"),
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicked"
            ),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchased"
            ),
        )
    )
    return (
        per_user.groupBy("channel")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("saw").alias("viewers"),
            F.sum(F.when((F.col("saw") == 1) & (F.col("clicked") == 1), 1).otherwise(0)).alias(
                "clickers"
            ),
            F.sum(
                F.when(
                    (F.col("saw") == 1)
                    & (F.col("clicked") == 1)
                    & (F.col("purchased") == 1),
                    1,
                ).otherwise(0)
            ).alias("purchasers"),
        )
        .withColumn(
            "view_to_click", safe_div(F.col("clickers") * 1.0, F.col("viewers"))
        )
        .withColumn(
            "click_to_purchase",
            safe_div(F.col("purchasers") * 1.0, F.col("clickers")),
        )
        .orderBy("channel")
    )


@query("q20_reco_precision")
def q20_reco_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + algorithm-arm performance comparison.

    Reference parity: SQL/Advanced Recommendation System Performance.txt
    (recommendation_score / algorithm_version comparison); props JSON
    plays the recommendation payload, k % 3 the algorithm version.
    """
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    ).withColumn("algorithm_version", (F.col("k") % 3).cast("int"))
    return (
        parsed.groupBy("algorithm_version")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                * 1.0
                / F.count("*"),
                4,
            ).alias("purchase_rate"),
        )
        .orderBy("algorithm_version")
    )


@query("q21_topk_per_group")
def q21_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number top-k with deterministic tiebreaks.

    Reference parity: SQL/Geographic Content Preference Mapping.txt
    (top content per geography).
    """
    from etl_sql_and_pyspark_developement__spark.operators.topk import top_k_per_group

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(
                supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
                    "s_suppkey", "n_name"
                )
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("n_name").alias("nation_name"), F.col("l_partkey").alias("partkey"))
        .agg(
            # 4 dp, not 2: these sums are exact 4-decimal values (2dp
            # price x 2dp discount), so 2dp rounding lands exactly on
            # .xx5 boundaries where Spark and DuckDB disagree
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )
    return (
        top_k_per_group(
            rev,
            ["nation_name"],
            [F.desc("revenue"), F.col("partkey")],
            k=5,
            rank_name="rnk",
        )
        .select("nation_name", "rnk", "partkey", "revenue")
        .orderBy("nation_name", "rnk")
    )


@query("q22_setops_except")
def q22_setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT set semantics over customer cohorts.

    Reference parity: the catalog-gap / cross-platform workloads'
    set-difference logic (users on platform A but not B).
    """
    orders = table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    urgent_only = urgent.distinct().subtract(low.distinct()).withColumn(
        "cohort", F.lit("urgent_only")
    )
    both = urgent.intersect(low).withColumn("cohort", F.lit("both"))
    return (
        urgent_only.unionByName(both)
        .select("cohort", "custkey")
        .orderBy("cohort", "custkey")
    )


@query("q23_exists_semijoin")
def q23_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join + segment aggregation.

    Reference parity: SQL/Multi-Profile Family Usage Patterns.txt /
    Catalog Gap (EXISTS subqueries).
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query("q24_conditional_pivot_cube")
def q24_conditional_pivot_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping flags over two categoricals.

    Reference parity: the reference's WITH ROLLUP usage generalized to
    CUBE (User Engagement Funnel Analysis) — all four grouping-set
    combinations in one pass.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("g_priority", "g_status", "o_orderpriority", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (SURVEY §2 table 2)
# ---------------------------------------------------------------------------


@query("t01_text_quality")
def t01_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + score (pure built-in exprs)."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        quality_features,
        quality_score,
    )

    docs = table(spark, sf_dir, "documents")
    feats = quality_score(quality_features(docs))
    return feats.select(
        "doc_id",
        "n_tokens",
        "punct_ratio",
        "stopword_ratio",
        "avg_token_len",
        "quality_score",
    ).orderBy("doc_id")


@query("t02_lang_id")
def t02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic + agreement vs labeled lang."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        predict_lang,
    )

    docs = table(spark, sf_dir, "documents")
    pred = predict_lang(docs)
    return (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


@query("t03_token_count")
def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts, aggregated per source."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        token_counts,
    )

    docs = table(spark, sf_dir, "documents")
    counted = token_counts(docs)
    return (
        counted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_ish_tokens").alias("total_bpe_ish_tokens"),
            F.round(F.avg("ws_tokens"), 4).alias("avg_ws_tokens"),
            F.round(F.avg("bpe_ish_tokens"), 4).alias("avg_bpe_ish_tokens"),
        )
        .orderBy("source")
    )


@query("t04_fingerprint")
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive bag fingerprint per document."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bag_fingerprint,
        exact_fingerprint,
    )

    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        exact_fingerprint("text").alias("exact_fp"),
        bag_fingerprint("text").alias("bag_fp"),
    ).orderBy("doc_id")


@query("t05_tfidf_terms")
def t05_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by tf × rational idf (BM25
    core without the log — monotone-identical ranking, and the pure
    rational arithmetic lets the DuckDB oracle verify SCORES
    value-for-value, not just ranks).
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        tfidf_top_terms,
    )

    docs = table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy(
        "doc_id", "rnk"
    )


@query("q44_skew_profile")
def q44_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostics for the events fact's candidate
    shuffle keys — the pre-flight a 100 TB pipeline runs to decide
    salting / broadcast / AQE strategy before planning hot joins."""
    from etl_sql_and_pyspark_developement__spark.operators.salt import (
        skew_profile,
    )

    ev = table(spark, sf_dir, "events")
    prof = skew_profile(ev, "event_type").unionByName(
        skew_profile(ev, "user_id")
    )
    return prof.orderBy("key_col")


@query("q45_incremental_agg")
def q45_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: history and the newest 30-day
    batch are aggregated SEPARATELY into decomposable partials, then
    merged — bit-identical to a full recompute (the oracle), without
    ever rescanning history. avg is derived from sum/count partials
    post-merge."""
    from etl_sql_and_pyspark_developement__spark.operators.incremental import (
        merge_partials,
        partial_aggs,
    )

    orders = table(spark, sf_dir, "orders")
    cutoff = orders.agg(
        F.date_sub(F.max("o_orderdate"), 30).alias("c")
    ).collect()[0].c
    specs = {
        "n_orders": ("count", "*"),
        "total_price": ("sum", "o_totalprice"),
        "min_price": ("min", "o_totalprice"),
        "max_price": ("max", "o_totalprice"),
    }
    history = orders.filter(F.col("o_orderdate") <= F.lit(cutoff))
    batch = orders.filter(F.col("o_orderdate") > F.lit(cutoff))
    keys = ["o_orderpriority"]
    merged = merge_partials(
        [partial_aggs(history, keys, specs), partial_aggs(batch, keys, specs)],
        keys,
        specs,
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.round("total_price", 2).alias("total_price"),
        "min_price",
        "max_price",
        F.round(F.col("total_price") / F.col("n_orders"), 4).alias("avg_price"),
    ).orderBy("o_orderpriority")


@query("t06_repetition")
def t06_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (duplicate
    token fraction, top-bigram character coverage, duplicated-trigram
    character coverage) — the standard repetition filters for LLM
    training corpora. All ratios are integer parts-per-million so the
    DuckDB oracle verifies them bit-for-bit."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        repetition_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text").orderBy("doc_id")


@query("t07_vocab_stats")
def t07_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary / Zipf health stats (vocab size, hapax
    mass, top-10-term coverage) — the corpus-audit rollup run before
    training. Integer-ppm arithmetic, bit-exact vs the oracle."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        vocab_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return vocab_stats(docs, "lang", "text", top_k=10).orderBy("lang")


@query("t08_quality_classifier")
def t08_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality-classifier gate (FineWeb-Edu/DCLM stage):
    fixed linear scorer over interpretable features in BIGINT ppm
    arithmetic, so scores — not just the kept set — are oracle-
    verified bit-for-bit. Pure codegen: one scan, no shuffle."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
    )

    docs = table(spark, sf_dir, "documents")
    return classifier_score(docs).orderBy("doc_id")


@query("d12_corpus_dup_profile")
def d12_corpus_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source word-3-gram duplication audit (occurrence vs type
    counts, repeat and cross-doc fractions in integer ppm) — the
    pre-flight measurement before pairwise dedup. Bit-exact oracle."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        corpus_dup_profile,
    )

    docs = table(spark, sf_dir, "documents")
    return corpus_dup_profile(docs, n=3).orderBy("source")


@query("t09_pii_scrub")
def t09_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus. The synthetic corpus
    carries no real PII, so the query plants deterministic doc_id-
    derived email/phone/IPv4 strings first — both engines build the
    identical augmented text, so the oracle verifies counts AND the
    md5 of the redacted output value-for-value."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        pii_scrub,
    )

    docs = table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "aug_text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 3) % 256).cast("string"),
        ),
    )
    return (
        pii_scrub(aug, "aug_text")
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ipv4",
            F.md5(F.col("scrubbed")).alias("scrub_fp"),
        )
        .orderBy("doc_id")
    )


@query("t10_surprisal")
def t10_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy (corpus-unigram surprisal) scores per doc —
    the LM-filter decision axis in engine-exact BIGINT arithmetic."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        surprisal_scores,
    )

    docs = table(spark, sf_dir, "documents")
    return surprisal_scores(docs).orderBy("doc_id")


@query("p08_epoch_mix")
def p08_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-epoch corpus expansion (training-mix repetition:
    en 2.5 / zh 2.0 / de 1.5 / fr 1.0 / es 0.5 average epochs).
    Returns the exact expanded multiset (doc_id, lang, copy_idx), so
    the oracle verifies every repetition decision, not just expected
    proportions."""
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        epoch_expand,
    )

    weights = {"en": 2.5, "zh": 2.0, "de": 1.5, "fr": 1.0, "es": 0.5}
    docs = table(spark, sf_dir, "documents")
    return (
        epoch_expand(docs, "doc_id", "lang", weights)
        .select("doc_id", "lang", "copy_idx")
        .orderBy("doc_id", "copy_idx")
    )


@query("p06_token_budget")
def p06_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation: spend a 500-token quota per
    source on the highest-quality documents first (quality score desc,
    doc_id tiebreak), keeping the maximal prefix that fits. Returns
    the exact kept set, so the oracle value-verifies the selection,
    not just its size."""
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        token_budget_select,
    )
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        quality_features,
        quality_score,
        tokens,
    )

    docs = table(spark, sf_dir, "documents")
    scored = quality_score(quality_features(docs)).withColumn(
        "ws_tokens", F.size(tokens(F.col("text")))
    )
    kept = token_budget_select(
        scored,
        group_col="source",
        token_col="ws_tokens",
        budget=500,
        priority_cols=["quality_score"],
        id_col="doc_id",
    )
    return kept.select(
        "source",
        "sel_rank",
        "doc_id",
        "quality_score",
        "ws_tokens",
        "cum_tokens",
    ).orderBy("source", "sel_rank")


@query("d10_span_dedup")
def d10_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication screen: positional 4-gram matches
    chained into maximal shared spans (distributed suffix-array-style
    dedup); per-pair span counts for spans of >= 6 tokens."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        duplicated_spans,
    )

    docs = table(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", k=4, min_span_tokens=6).orderBy(
        "doc_a", "doc_b"
    )


@query("p07_epoch_shuffle")
def p07_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch-0 training order: md5(seed, doc_id) ranks the
    corpus — the whole permutation is value-verified by the oracle
    (identical md5 hex in both engines)."""
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        seeded_shuffle_rank,
    )

    docs = table(spark, sf_dir, "documents")
    return (
        seeded_shuffle_rank(docs, "doc_id", seed=0)
        .select("epoch_rank", "doc_id", "shuffle_key", "source")
        .orderBy("epoch_rank")
    )


@query("d01_dedup_exact")
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + bag dedup statistics per source (hash-groupBy dedup)."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        exact_dedup_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return (
        exact_dedup_stats(docs, "doc_id", "text", "source")
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    )


@query("d02_dedup_ngram_jaccard")
def d02_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar document pairs by exact 3-gram Jaccard."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    return (
        jaccard_pairs(docs, "doc_id", "text", n=3)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


@query("d03_dedup_minhash_lsh")
def d03_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128)+LSH(32 bands) candidates, Jaccard-verified ≥ 0.5.

    The md5-based hash family and band-tuple keys are deterministic
    arithmetic both engines share, so the DuckDB oracle mirrors the
    whole probabilistic pipeline value-for-value; recall vs exact
    Jaccard is additionally property-tested with planted near-dups.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


@query("d04_dedup_simhash")
def d04_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via chunk-equality candidates.

    The md5-derived token hash exists identically in DuckDB, so the
    oracle mirrors signatures, pigeonhole candidates, and the hamming
    verify value-for-value (invariants additionally property-tested).
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import simhash_pairs

    docs = table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


@query("d11_semantic_dedup")
def d11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning summary: per cluster, how many
    embeddings survive centrality-ordered cosine dedup.

    The deterministic seeded form (md5-ranked seeds, k = floor(sqrt(n)),
    broadcast argmax assignment, capped keeper side) is mirrored
    value-for-value by the DuckDB oracle — no iterative k-means, no
    rows-only fallback. Keep/drop invariants are additionally
    property-tested in tests/test_similarity.py."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        semantic_dedup,
    )

    emb = table(spark, sf_dir, "embeddings")
    flagged = semantic_dedup(emb, "vec_id", "embedding", threshold=0.95)
    return (
        flagged.groupBy("cluster")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("dropped").alias("n_dropped"),
            (F.count("*") - F.sum("dropped")).alias("n_kept"),
        )
        .orderBy("cluster")
    )


@query("s01_cosine_topk")
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        cosine_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries_df, k=5).orderBy("query_id", "rnk")


@query("s02_ann_lsh")
def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (scale path for s01).

    The hyperplanes are deterministic literals, so the DuckDB oracle
    mirrors the bucketing, the hamming-1 multi-probe set, and the
    scoring bit-for-bit — the approximate ANN result is value-verified
    (plus recall vs s01 asserted in tests/test_similarity.py).
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        ann_lsh_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(emb, queries_df, k=5, n_bits=4, dim=64).orderBy(
        "query_id", "rnk"
    )


@query("m01_multimodal_meta")
def m01_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode plumbing via mapInPandas (decode stubbed).

    No SQL oracle (Pandas-UDF path); schema/batch behavior tested in
    tests/test_multimodal.py.
    """
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        decode_metadata,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    return decode_metadata(with_binary_payload(docs)).orderBy("doc_id")


@query("m04_window_features")
def m04_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style overlapping-window feature extraction (STFT access
    pattern, stubbed kernel) over binary payloads, rolled up per doc.

    Oracle-verified: the payload is the UTF-8 byte stream of `text`,
    so the DuckDB oracle replays the exact window arithmetic via
    hex(encode(text)) byte extraction — per-window energies are exact
    integers (< 2^53), the /64 mean is a power-of-two division, and
    sqrt is IEEE-correctly-rounded in both engines, so even the float
    RMS matches bit-for-bit. The kernel's window math is additionally
    tested against an independent Python reference in
    tests/test_multimodal.py.
    """
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        window_features,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    wins = window_features(with_binary_payload(docs))
    return (
        wins.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.round(F.avg("rms"), 4).alias("avg_rms"),
            F.round(F.avg("zero_crossings"), 4).alias("avg_zc"),
            F.sum("energy").alias("total_energy"),
        )
        .orderBy("doc_id")
    )


@query("q25_asof_attribution")
def q25_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the latest preceding view
    by the same user, then per-user conversion-lag stats.

    Spark lacks a native as-of join; operators/asof.py composes it as
    tag+union+window (one shuffle). The DuckDB oracle uses its native
    ASOF JOIN — independent implementations, same semantics.
    """
    from etl_sql_and_pyspark_developement__spark.operators.asof import as_of_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    attributed = as_of_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"view_ts": "ts"},
    )
    lag_minutes = (
        F.col("ts").cast("double") - F.col("asof_view_ts").cast("double")
    ) / 60.0
    return (
        attributed.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.when(F.col("asof_view_ts").isNotNull(), 1).otherwise(0)).alias(
                "n_attributed"
            ),
            F.round(F.avg(lag_minutes), 4).alias("avg_minutes_to_convert"),
        )
        .orderBy("user_id")
    )


@query("q26_rolling_window")
def q26_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling 90-day revenue per customer (time-based
    window frame, not row-based), aggregated to per-customer peaks.

    Reference parity: the reference's rolling engagement windows
    (Churn / Virality workloads' 30/90-day sliding metrics).
    """
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1995-01-01")))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-89, 0)
    )
    rolled = orders.withColumn(
        "rolling90_revenue", F.round(F.sum("o_totalprice").over(w), 2)
    )
    return (
        rolled.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.max("rolling90_revenue"), 2).alias("peak_rolling90"),
            # sum, not avg: averaging 2-dp money can land exactly on a
            # rounding boundary where Spark and DuckDB disagree by 1 ulp
            F.round(F.sum("rolling90_revenue"), 2).alias("sum_rolling90"),
        )
        .orderBy("custkey")
    )


@query("q27_approx_sketches")
def q27_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL distinct, approx quantiles) next to
    their exact counterparts — the 100 TB substitutes for exact
    distinct/percentile when cardinality explodes.

    No SQL oracle (sketch internals are engine-specific); accuracy
    bounds are asserted in tests/test_operators.py.
    """
    li = table(spark, sf_dir, "lineitem")
    # The distinct-count pair and the percentile pair run as SEPARATE
    # aggregates joined on the 3-row group key: mixing countDistinct
    # with object-typed imperative aggregates (percentile /
    # percentile_approx) in one agg routes EVERY aggregate through the
    # distinct Expand path (input doubled, hash agg falls back to
    # sort-based with per-row sketch buffers) — measured 9.3s vs 1.8s
    # at sf0.1 for the split form. The join side is |l_returnflag| = 3
    # rows, broadcast for free.
    distincts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_distinct"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        # 3 dp: the interpolated median of 2-dp values is x.xx5 —
        # exactly a 2-dp rounding boundary
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 3).alias(
            "exact_median_price"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
    )
    sketched = distincts.join(F.broadcast(pcts), "l_returnflag")
    # Emit sketch accuracy as booleans the oracle asserts TRUE: the
    # sketch values themselves are engine-specific, but "within
    # tolerance of exact" is a portable, checkable contract — if HLL or
    # the quantile sketch ever drifts, the correctness gate fails.
    return (
        sketched.select(
            "l_returnflag",
            "exact_distinct_parts",
            "exact_median_price",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct_parts"))
                <= F.col("exact_distinct_parts") * 0.1
            ).alias("hll_within_10pct"),
            (
                F.abs(F.col("approx_median") - F.col("exact_median_price"))
                <= F.col("exact_median_price") * 0.05
            ).alias("quantile_sketch_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query("q28_gap_fill")
def q28_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: dense daily spine per event type via
    sequence+explode, zero-filled where no events occurred.

    Reference parity: Seasonal Viewing Pattern Analysis needs dense
    calendars; this is the canonical Spark date-spine pattern.

    Scale: the spine is |types| × |days| (tiny) built from an
    aggregated bounds row — never a per-event explosion.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day"),
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("was_filled"),
        )
        .orderBy("event_type", "day")
    )


@query("q29_scd2_merge")
def q29_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge emulation (MERGE INTO without a lake format):
    deterministic synthetic updates against the customer dimension.

    Updates: every custkey % 10 == 0 moves to segment 'PROMOTED' with
    acctbal + 100, effective 2000-01-01.
    """
    from etl_sql_and_pyspark_developement__spark.operators.scd2 import scd2_apply

    cust = table(spark, sf_dir, "customer")
    dim = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.lit("PROMOTED").alias("segment"),
            F.round(F.col("c_acctbal") + 100, 2).alias("acctbal"),
        )
    )
    return scd2_apply(
        dim, updates, key="custkey", attr_cols=["segment", "acctbal"],
        effective_date="2000-01-01",
    ).orderBy("custkey", "valid_from", "valid_to")


@query("q30_sql_surface")
def q30_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's Spark-SQL text surface (the reference ships every
    workload as SQL text too): TPC-H Q5-shaped regional revenue via
    registered views + spark.sql.

    Catalyst plans this identically to the DataFrame twin — same
    pushdown, same broadcasts — demonstrating both API surfaces hit
    one optimizer.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation_name
        """
    )


@query("s03_ann_ivf")
def s03_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-5 (coarse k-means quantizer +
    n_probe inverted lists) — the second scale path next to s02's LSH.

    One Lloyd iteration: measured recall@5 vs s01 drops only 1.0→0.98
    at sf0.1 while training cost halves — the right trade for a coarse
    quantizer whose misses the n_probe=4 multi-list probing already
    covers. SQL oracle: the whole path (lowest-id seeds → one Lloyd
    step → final assignment → n_probe lists → in-list cosine top-k)
    is unrolled into DuckDB CTEs with literally-mirrored float
    arithmetic — centroid sums are double accumulations whose
    cross-engine order difference is ~1 ulp, orders of magnitude
    below any argmin/rank gap, the same literal-mirror contract the
    s01/s02/d08/d11 oracles rely on. Recall floor additionally
    asserted in tests/test_similarity.py.
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        ann_ivf_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ann_ivf_topk(
        emb, queries_df, k=5, n_clusters=16, n_probe=4, dim=64,
        train_iterations=1,
    ).orderBy("query_id", "rnk")


@query("s04_mmr_diverse_topk")
def s04_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diverse top-10 against the min-id query vector: distributed
    exact-relevance top-50 pool, then the inherently-sequential greedy
    MMR over that pool-sized set on the driver.

    Oracle-verified: k is a small constant, so the DuckDB oracle
    UNROLLS the greedy recurrence into k materialized CTE stages with
    literally-mirrored float arithmetic (lam = 700/1000.0 and
    (1.0 - lam) — the same doubles the driver uses) — the sequential
    selection matches value-for-value. Selection invariants (first
    pick = argmax relevance, diversity ≤ plain top-k, determinism)
    are additionally asserted in tests/test_similarity.py."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        mmr_select,
    )

    emb = table(spark, sf_dir, "embeddings")
    return mmr_select(emb, k=10, pool=50, lambda_x1000=700).orderBy("rank")


@query("s05_knn_graph")
def s05_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph over the whole embedding corpus (every
    vector's top-5 cosine neighbors among LSH-bucket collisions, own
    bucket + hamming-1 probes) — the starting artifact for semantic
    curation: SemDeDup clustering, density scoring, diversity
    sampling.

    The hyperplanes are deterministic literals, so the DuckDB oracle
    mirrors the bucketing, the probe set, the pair dedup, and the
    scoring bit-for-bit — the approximate graph itself is
    value-verified; recall vs the exact graph is additionally tested
    in tests/test_similarity.py. n_bits is ADAPTIVE (None →
    similarity.adaptive_n_bits): it resolves to 8 at every test scale
    (≤ 2k vectors — the oracle mirrors 8), and grows with log2(n)
    beyond so the bucket join stays linear (fixed bits measured 89×
    wall at 10× vectors).
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        knn_graph,
    )

    emb = table(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=5, n_bits=None, dim=64).orderBy("query_id", "rnk")


@query("q31_unpivot")
def q31_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt) via stack(): the inverse of q08's
    pivot, turning per-metric columns into (metric, value) rows.

    Reference parity: Cross-Platform workload's device-mix reshaping.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    wide = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_spend"),
            F.round(F.max("o_totalprice"), 2).alias("max_spend"),
        )
    )
    return (
        wide.unpivot(
            ids=["c_mktsegment"],
            values=["total_spend", "avg_spend", "max_spend"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("c_mktsegment", "metric")
    )


@query("q32_collect_agg")
def q32_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-collection aggregation (collect_set) with deterministic
    ordering, emitted as a joined string for engine-portable equality.

    Reference parity: Content Affinity's per-profile genre lists.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities_seen"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@query("d05_dedup_edit_distance")
def d05_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup screen: CONTENT-blocked candidates
    (MinHash-LSH band collisions — dedup.lsh_candidate_pairs) verified
    with bounded levenshtein on the 64-char prefix.

    Blocking on content, not id ranges: two near-identical docs are
    candidates no matter how far apart their doc_ids are (planted
    distant-id near-dups are recovered — tests/test_dedup.py). The
    threshold arg switches Spark to the banded O(len·k) DP that
    early-exits past 30 (returns -1); the oracle mirrors the LSH
    candidate set literal-for-literal, then applies DuckDB's
    levenshtein with the same bound.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(docs, "doc_id", "text")
    keyed = docs.select("doc_id", F.substring("text", 1, 64).alias("prefix"))
    dist = F.levenshtein(F.col("pa"), F.col("pb"), 30)
    return (
        cand.join(
            keyed.select(
                F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
            ),
            "doc_a",
        )
        .join(
            keyed.select(
                F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
            ),
            "doc_b",
        )
        .filter(dist >= 0)
        .select("doc_a", "doc_b", dist.alias("prefix_dist"))
        .orderBy("doc_a", "doc_b")
    )


@query("q33_data_quality")
def q33_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over lineitem, evaluated
    as one pass of conditional aggregates (operators/quality.py)."""
    from etl_sql_and_pyspark_developement__spark.operators.quality import (
        lineitem_checks,
        validate,
    )

    li = table(spark, sf_dir, "lineitem")
    return validate(li, lineitem_checks()).orderBy("check_name")


@query("q34_interval_attribution")
def q34_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery workload decorrelated Spark-first.

    Reference parity: SQL/Advanced Recommendation System
    Performance.txt builds per-recommendation features from FOUR
    correlated scalar subqueries (EXISTS within a 30-day interval,
    MIN time-to-action, conditional AVG, CORR of score vs outcome).
    Spark's DataFrame API has no correlated subqueries; the idiomatic
    re-expression is ONE join + conditional aggregates — a single
    shuffle instead of four correlated probes.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    in_30d = (F.col("l_shipdate") >= F.col("o_orderdate")) & (
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice")
        .agg(
            F.max(F.when(in_30d, 1).otherwise(0)).alias("shipped_30d"),
            F.min(
                F.when(
                    F.col("l_shipdate") >= F.col("o_orderdate"),
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate")),
                )
            ).alias("days_to_first_ship"),
        )
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("total_orders"),
            F.sum("shipped_30d").alias("shipped_within_30d"),
            F.round(F.avg("shipped_30d") * 100, 4).alias("acceptance_rate"),
            F.round(
                F.avg(
                    F.when(F.col("shipped_30d") == 1, F.col("days_to_first_ship"))
                ),
                4,
            ).alias("avg_days_to_first_ship"),
            (F.round(F.corr("o_totalprice", "shipped_30d"), 4) + 0.0).alias(
                "corr_price_shipped"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query("q35_binge_pipeline")
def q35_binge_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 4-stage pipeline mirroring the reference's marquee
    Binge-Watching workload end-to-end (SQL/Binge-Watching Behavior
    Analysis.txt): gap sessions → binge classification → per-user
    behavior → cohort scoring with a weighted bingeability score.

    Scale: stage 1 is the single user_id shuffle; every later stage
    aggregates strictly smaller data.
    """
    from etl_sql_and_pyspark_developement__spark.operators.sessionize import sessionize

    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id")
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (
            (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")))
            / 60.0
        ).alias("minutes"),
        F.hour(F.min("ts")).alias("start_hour"),
    )
    binges = per_session.filter(F.col("n_events") >= 4).withColumn(
        "intensity",
        F.when(F.col("n_events") >= 8, "High Intensity Binge")
        .when(F.col("n_events") >= 6, "Moderate Binge")
        .otherwise("Casual Binge"),
    )
    user_behavior = binges.groupBy("user_id").agg(
        F.count("*").alias("n_binges"),
        F.round(F.avg("n_events"), 4).alias("avg_binge_events"),
        F.round(F.avg("minutes"), 4).alias("avg_binge_minutes"),
        F.round(
            F.avg(
                F.when(
                    (F.col("start_hour") >= 18) & (F.col("start_hour") <= 23), 1.0
                ).otherwise(0.0)
            ),
            4,
        ).alias("evening_binge_ratio"),
    )
    heavy = user_behavior.filter(F.col("n_binges") >= 2)
    return (
        binges.join(heavy.select("user_id", "n_binges"), "user_id", "left")
        .withColumn("is_heavy_binger", F.when(F.col("n_binges").isNotNull(), 1).otherwise(0))
        .groupBy("intensity")
        .agg(
            F.count("*").alias("n_binge_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.avg("minutes"), 4).alias("avg_minutes"),
            F.sum("is_heavy_binger").alias("heavy_binger_sessions"),
            F.round(
                F.count("*") * 0.3
                + F.avg("n_events") * 0.25
                + F.avg("minutes") * 0.25
                + F.countDistinct("user_id") * 0.2,
                4,
            ).alias("bingeability_score"),
        )
        .orderBy("intensity")
    )


@query("p01_per_group_cap")
def p01_per_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group downsampling (cap over-represented
    strata): at most 30 docs per language, chosen by doc_id order."""
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        per_group_cap,
    )

    docs = table(spark, sf_dir, "documents")
    capped = per_group_cap(docs, "lang", "doc_id", cap=30)
    return (
        capped.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


@query("p02_stratified_sample")
def p02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling per language, via the DETERMINISTIC
    md5-rate form (sampling.stratified_sample_md5): the kept set is a
    pure function of (seed, doc_id, stratum rate), so the DuckDB
    oracle verifies the exact selection — not just its size. (The
    engine-RNG sampleBy form remains available as
    sampling.stratified_sample for Spark-native workflows; its
    rate/stability properties are asserted in tests/test_sampling.py.)
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        stratified_sample_md5,
    )

    docs = table(spark, sf_dir, "documents")
    fractions_ppm = {
        "en": 500_000, "fr": 1_000_000, "es": 1_000_000,
        "de": 1_000_000, "zh": 1_000_000,
    }
    sampled = stratified_sample_md5(docs, "lang", fractions_ppm, "doc_id", seed=42)
    return sampled.groupBy("lang").agg(F.count("*").alias("n_sampled")).orderBy("lang")


@query("m02_frame_sample")
def m02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (video-sampler plumbing,
    stubbed decode), aggregated per doc.

    Oracle-verified like m04: the payload is text's UTF-8 byte stream,
    so the DuckDB oracle replays the chunk/stride/mean-byte arithmetic
    from hex(encode(text)) — frame sums are exact integers and the
    single int/int division is IEEE-identical in both engines. Chunk
    math is additionally verified in tests/test_multimodal.py."""
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(docs), frame_size=32, every_kth=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled_frames"),
            F.round(F.avg("feature"), 4).alias("avg_feature"),
            F.sum("frame_bytes").alias("total_frame_bytes"),
        )
        .orderBy("doc_id")
    )


@query("q36_grouping_sets")
def q36_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of q02's ROLLUP / q24's CUBE:
    exactly the grouping combinations the report needs, one pass."""
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
        ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
        """
    )


@query("q37_full_outer")
def q37_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation of two entity universes
    (customers-with-orders vs event-active users), the classic
    which-side-is-missing audit."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    ev = table(spark, sf_dir, "events")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(F.col("c_custkey").alias("entity_id"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    activity = ev.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.count("*").alias("n_events")
    )
    joined = spend.join(activity, "entity_id", "full_outer").withColumn(
        "presence",
        F.when(F.col("spend").isNotNull() & F.col("n_events").isNotNull(), "both")
        .when(F.col("spend").isNotNull(), "orders_only")
        .otherwise("events_only"),
    )
    return (
        joined.groupBy("presence")
        .agg(
            F.count("*").alias("n_entities"),
            F.round(F.coalesce(F.sum("spend"), F.lit(0.0)), 2).alias("total_spend"),
            F.coalesce(F.sum("n_events"), F.lit(0)).alias("total_events"),
        )
        .orderBy("presence")
    )


@query("q38_window_gallery")
def q38_window_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window family in one pass: FIRST_VALUE /
    LAST_VALUE (full frame), NTH_VALUE(2), CUME_DIST — per-customer
    order sequences, aggregated per priority for a compact result."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pri = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    enriched = (
        orders.withColumn("first_price", F.first("o_totalprice").over(full))
        .withColumn("last_price", F.last("o_totalprice").over(full))
        .withColumn("second_price", F.nth_value("o_totalprice", 2).over(full))
        .withColumn("price_cume", F.cume_dist().over(pri))
    )
    return (
        enriched.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg(F.col("last_price") - F.col("first_price")), 4).alias(
                "avg_first_to_last_delta"
            ),
            F.round(
                F.avg(F.when(F.col("second_price").isNotNull(), 1.0).otherwise(0.0)),
                4,
            ).alias("pct_with_second_order"),
            F.round(F.avg("price_cume"), 6).alias("avg_cume_dist"),
        )
        .orderBy("o_orderpriority")
    )


@query("d06_dedup_components")
def d06_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH pairs → connected
    components → per-component summary (the canonical-doc selection
    step of a dedup pipeline). Oracle-backed end-to-end: the DuckDB
    twin mirrors the md5-based LSH pair generation and runs a
    recursive-CTE min-label walk for the components; graph invariants
    additionally tested in tests/test_dedup.py.

    Pairs come from the SHARED verified-pairs artifact
    (io.minhash_pairs_artifact — built once per corpus snapshot,
    consumed here and by d15's keeper selection, the knn-graph
    pattern applied to the text lane).
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        dedup_components,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        minhash_pairs_artifact,
    )

    pairs = minhash_pairs_artifact(spark, sf_dir, threshold=0.5)
    comps = dedup_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc").alias("canonical_doc"),
            F.max("doc").alias("max_doc"),
        )
        .orderBy("component")
    )


@query("d07_components_exact")
def d07_components_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over EXACT n-gram Jaccard pairs (≥ 0.4) —
    the fully oracle-backed twin of d06 (whose pairs come from
    MinHash-LSH and are therefore rows-only). The DuckDB oracle runs a
    recursive-CTE min-label reachability over the identical pair set,
    so the whole pairs → components → cluster-summary path is verified
    value-for-value, not just via graph invariants.

    Scale: pair generation is the d02 path (shared-shingle equi-join,
    singleton shingles pruned); component propagation is O(log diameter)
    rounds of join+min — near-dup clusters are stars/cliques, so 2-3
    rounds. Swap in minhash_lsh_pairs (d06) when exact pairing is too
    wide; the component step is unchanged.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        dedup_components,
        jaccard_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text").filter(
        (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))) >= 0.4
    )
    comps = dedup_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc").alias("canonical_doc"),
            F.max("doc").alias("max_doc"),
        )
        .orderBy("component")
    )


@query("p03_hash_split")
def p03_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/test split (10% test) summarized
    per lang × split. Engine-portable: both Spark and DuckDB render the
    same md5 hex for the same id string, so the assignment — not just
    the rate — is oracle-verified. xxhash64 (operators/sampling.
    train_test_split) is the faster JVM-side scale path with the same
    stability property; md5 is the cross-engine-checkable variant.

    Scale: narrow (no shuffle before the tiny groupBy); the hash is
    per-row arithmetic inside whole-stage codegen.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        docs.withColumn(
            "split", F.when(bucket < 10, F.lit("test")).otherwise(F.lit("train"))
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "split")
    )


@query("q39_range_join")
def q39_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: for every error event (an
    "incident") find same-user activity within ±30 minutes. Spark OSS
    plans a bare BETWEEN join as a nested loop; operators/rangejoin.py
    rewrites it as bin-bucketed equi-join + residual filter (the
    range-join-hint semantics, open-source). Reference parity: the
    shown→watched interval join in pyspark/Real-time Personalization
    Effectiveness.py:35-36 (start_time BETWEEN event_timestamp AND
    event_timestamp+1d), which the reference executes as a raw
    inequality join.

    Scale: interval side grows ~3× (1h span / 30min bins); the join is
    a shuffled equi-join on (bin, user_id) — distributable, AQE-skew
    capable, never O(n²).
    """
    from etl_sql_and_pyspark_developement__spark.operators.rangejoin import (
        range_join,
    )

    ev = table(spark, sf_dir, "events")
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    points = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_type", "value"
    )
    joined = range_join(
        points, incidents, "ts", "lo", "hi", bin_width=1800, keys=("user_id",)
    )
    return (
        joined.groupBy("incident_id")
        .agg(
            F.count("*").alias("n_nearby"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("incident_id")
    )


@query("q40_json_extract")
def q40_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from a semi-structured props column
    (from_json with an explicit schema — schema-on-read, no inference
    pass), bucketed rollup of the extracted key. Reference parity: the
    reference's event-props handling in R14/R20 (personalization payload
    fields).

    Scale: from_json is JVM-side codegen (no Python); the groupBy is on
    two low-cardinality derived keys — one shuffle, partial-agg friendly.
    """
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json(F.col("props"), "struct<k:int>").getField("k")
    )
    return (
        parsed.groupBy(
            F.floor(F.col("k") / 10).cast("int").alias("k_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("k_bucket", "event_type")
    )


@query("q41_higher_order")
def q41_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column —
    transform / filter / aggregate (fold) / array_max — all JVM-side
    lambda expressions inside whole-stage codegen, zero Python. The
    vector math that feeds s01-s03 ANN, exercised as a first-class
    capability: per-label L2-norm stats, positive-component counts,
    max absolute component.

    Scale: per-row array math is narrow; the only shuffle is the tiny
    per-label groupBy (10 labels).
    """
    emb = table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    per_row = emb.select(
        "label",
        F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.array_max(F.transform(vec, lambda x: F.abs(x))).alias("maxabs"),
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.sum("n_pos").alias("total_pos"),
            F.round(F.max("maxabs"), 6).alias("max_abs_component"),
        )
        .orderBy("label")
    )


@query("q42_salted_agg")
def q42_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically hot key
    (event_type has 5 values — at 100 TB each group is ~20 TB, far
    beyond one executor's partition). groupBy(key, salt) spreads each
    hot group across 16 partials, then a second tiny groupBy merges.
    Semantics-preserving for decomposable aggregates, so the oracle is
    the plain GROUP BY. Reference parity: every reference rollup that
    groups on low-cardinality segments (R1, R11).
    """
    from etl_sql_and_pyspark_developement__spark.operators.salt import (
        two_phase_agg,
    )

    ev = table(spark, sf_dir, "events")
    out = two_phase_agg(
        ev,
        ["event_type"],
        {
            "n_events": "count(*)",
            "sum_value": "sum(value)",
            "max_value": "max(value)",
        },
        salt=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
        F.round(F.col("max_value"), 2).alias("max_value"),
    ).orderBy("event_type")


@query("p05_corpus_mix")
def p05_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus mixing per language (mixture
    weights en 1.0 / fr 0.75 / de 0.5 / zh 0.25 / es 0.125), summarized
    as achieved-vs-target rates. Dyadic rates × md5 buckets make the
    kept SET itself engine-portable, so the oracle verifies the actual
    mix, not just expected proportions.
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        weighted_mix,
    )

    rates = {"en": 1.0, "fr": 0.75, "de": 0.5, "zh": 0.25, "es": 0.125}
    docs = table(spark, sf_dir, "documents")
    kept = weighted_mix(docs, "doc_id", "lang", rates).groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    target = F.lit(None).cast("double")
    for val, r in rates.items():
        target = F.when(F.col("lang") == val, F.lit(r)).otherwise(target)
    return (
        totals.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
            F.round(target, 4).alias("target_rate"),
            F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 4).alias(
                "kept_rate"
            ),
        )
        .orderBy("lang")
    )


@query("p04_pipeline_e2e")
def p04_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE declarative plan:
    quality-score gate (t01) → exact dedup keeping the lowest doc_id
    per normalized fingerprint (d01) → deterministic md5-bucket
    train/test split (p03) → per-(lang, split) corpus stats. What a
    user of this engine actually runs before a training job; every
    stage is the already-verified operator, composed.

    Scale: one narrow pass computes features + fingerprints; the only
    wide stages are the dedup window (one shuffle on the fingerprint —
    uniform hash values, no skew) and the final tiny groupBy. No stage
    materializes intermediate corpora.
    """
    from pyspark.sql import Window

    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        exact_fingerprint,
        quality_features,
        quality_score,
    )

    docs = table(spark, sf_dir, "documents")
    kept = quality_score(quality_features(docs)).filter(
        F.col("quality_score") >= 60
    )
    w = Window.partitionBy(exact_fingerprint()).orderBy("doc_id")
    uniq = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        uniq.withColumn(
            "split", F.when(bucket < 10, F.lit("test")).otherwise(F.lit("train"))
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("quality_score").alias("sum_quality"),
        )
        .orderBy("lang", "split")
    )


@query("q43_time_rollup")
def q43_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: daily AND
    hourly aggregates of the event stream in ONE pass via
    df.groupingSets — the continuous-aggregate pattern (coarse grain
    for dashboards, fine grain for drill-down) without re-scanning per
    grain. Reference parity: the hour-of-day × day splits in
    pyspark/Real-time Personalization Effectiveness.py:64-65 and the
    seasonal day/month grains of R15.

    Scale: grouping sets expand rows 2x pre-shuffle but every
    aggregate stays decomposable (partial agg), and one scan replaces
    one per grain.
    """
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("int").alias("hour"),
        "value",
    )
    return (
        keyed.groupingSets(
            [["day"], ["day", "hour"]],
            F.col("day"),
            F.col("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.grouping("hour").cast("int").alias("g_hour"),
        )
        .orderBy("day", "g_hour", "hour")
    )


@query("d08_embedding_neardup")
def d08_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic tier of the
    dedup ladder, above token-level d01-d07), via the SCALE path:
    same-LSH-bucket candidate pairs (deterministic hyperplanes; the
    bucket count cuts the quadratic pair space ~2^bits-fold) verified
    with one exact dot product over per-row-normalized vectors.
    Because the hyperplanes are fixed literals, the DuckDB oracle
    computes the IDENTICAL bucketing — the approximate path itself is
    value-verified, not just the exact one (the exact all-pairs
    verifier is covered by tests/test_similarity.py's subset test).
    Vector math is zip_with/aggregate codegen — zero Python.

    The bit count is ADAPTIVE (floor 4 — what the oracle mirrors,
    resolved at every test scale ≤ 2k vectors): fixed bits make the
    bucket join quadratic in the corpus (measured 50× wall at 10×
    vectors). More bits trade recall on moderate-cosine pairs; at
    corpus scale recover it with OR-construction (several independent
    plane tables, union of candidates) rather than fewer bits."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        adaptive_n_bits,
        cosine_neardup_pairs,
        lsh_signature,
    )

    emb = table(spark, sf_dir, "embeddings")
    bits = adaptive_n_bits(emb.count(), target_bucket=125, floor_bits=4)
    bucketed = emb.select(
        "vec_id", lsh_signature("embedding", bits, 64).alias("bucket")
    )
    cands = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
    )
    labels = emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"))
    labels_b = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"))
    return (
        cosine_neardup_pairs(emb, threshold=0.45, candidates=cands)
        .join(labels, "id_a")
        .join(labels_b, "id_b")
        .withColumn(
            "same_label",
            (F.col("label_a") == F.col("label_b")).cast("int"),
        )
        .select("id_a", "id_b", "cosine", "same_label")
        .orderBy("id_a", "id_b")
    )


@query("d09_decontaminate")
def d09_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination screen over the p03 train/test split:
    for each test doc overlapping a train doc, the best-matching train
    doc and the asymmetric n-gram CONTAINMENT |shared|/|test shingles|
    (a test doc quoted inside a larger train doc has low Jaccard but
    containment 1.0 — the GPT-3-style screen), plus an exact-hash
    duplicate flag. Split, shingles, and tiebreaks are all
    deterministic md5/count arithmetic, so the DuckDB oracle verifies
    the whole screen value-for-value.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        contamination_check,
    )

    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    keyed = docs.withColumn(
        "split", F.when(bucket < 10, F.lit("test")).otherwise(F.lit("train"))
    )
    return (
        contamination_check(keyed, "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    )


@query("m03_resize")
def m03_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-kernel plumbing over binary payloads (multimodal tier 3:
    decode m01, frame-sample m02, resize m03), aggregated per source.

    Oracle-verified like m02/m04: the nearest-neighbor gather and
    Horner-mod checksum are pure integer/IEEE arithmetic over text's
    UTF-8 bytes, replayed by the DuckDB oracle from hex(encode(text)).
    Determinism and dims are additionally covered in
    tests/test_multimodal.py."""
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        resize_payloads,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    resized = resize_payloads(
        with_binary_payload(docs), dst_width=32, dst_height=32
    )
    # join back to a dimension for a per-source rollup
    src = docs.select("doc_id", "source")
    return (
        resized.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("dst_bytes").alias("total_dst_bytes"),
            F.countDistinct("checksum").alias("n_unique_artifacts"),
        )
        .orderBy("source")
    )


@query("q46_windowed_percentile")
def q46_windowed_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row group-quantile benchmark WITHOUT collapsing rows: the
    exact interpolated percentile as a WINDOW aggregate, so every
    supplier row carries its nation's median/p90 alongside its own
    revenue.

    Reference parity: pyspark/Infrastructure Cost Optimization by
    Content Type.py:74-75 (percentile_approx(...).over(window_spec))
    and SQL/Infrastructure Cost Optimization by Content Type.txt:88-91
    (PERCENTILE_CONT ... WITHIN GROUP over the cohort) — the windowed
    percentile form q14's groupBy variant does not exercise.

    Scale: the window runs over the per-supplier AGGREGATE (bounded by
    entity count, not fact rows); partitions are nations — each
    nation's suppliers fit one window task by construction of the
    dimensional model.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    per_supp = rev.join(
        F.broadcast(supp.join(nation, supp.s_nationkey == nation.n_nationkey)),
        rev.l_suppkey == F.col("s_suppkey"),
    ).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("n_name").alias("nation_name"),
        "revenue",
    )
    w = Window.partitionBy("nation_name")
    med = F.round(F.expr("percentile(revenue, 0.5)").over(w), 2)
    p90 = F.round(F.expr("percentile(revenue, 0.9)").over(w), 2)
    return (
        per_supp.withColumn("nation_median_revenue", med)
        .withColumn("nation_p90_revenue", p90)
        .withColumn(
            "above_median",
            (F.col("revenue") > F.col("nation_median_revenue")).cast("int"),
        )
        .orderBy("suppkey")
    )


@query("q47_sql_rollup")
def q47_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, rollup workload: the reference ships every
    workload as runnable SQL text (SQL/User Engagement Funnel
    Analysis.txt GROUP BY ... WITH ROLLUP + GROUPING); this is the
    q02-shaped rollup expressed through spark.sql over registered
    views — same Catalyst plan as the DataFrame form.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        HAVING count(*) > 0
        ORDER BY g_priority DESC, priority, g_status DESC, status
        """
    )


@query("q48_sql_window")
def q48_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, window workload: named-WINDOW clause with
    LAG/LEAD/FIRST_VALUE/ROW_NUMBER over per-customer order sequences
    (the q38 gallery's SQL-text twin, mirroring the reference's paired
    SQL<->PySpark design for its window workloads, e.g. SQL/Social
    Network Effects on Content Virality.txt).
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey AS custkey,
               o_orderkey AS orderkey,
               round(o_totalprice, 2) AS price,
               round(lag(o_totalprice) OVER w, 2) AS prev_price,
               round(lead(o_totalprice) OVER w, 2) AS next_price,
               round(first_value(o_totalprice) OVER w, 2) AS first_price,
               row_number() OVER w AS seq_no
        FROM orders
        WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY custkey, seq_no
        """
    )


@query("p09_sequence_pack")
def p09_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing (concat-and-chunk): documents in a
    deterministic md5 epoch order are concatenated and cut into
    256-token training sequences; per sequence, how many docs start in
    it, their token mass, and how many straddle the boundary — the
    packing-efficiency audit a training-data pipeline runs before
    materializing examples.

    Oracle-verified exactly: the order key, running token totals, and
    div arithmetic are engine-portable (sampling.sequence_pack).
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        sequence_pack,
    )
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        tokens,
    )

    docs = table(spark, sf_dir, "documents").withColumn(
        "ws_tokens", F.size(tokens(F.col("text")))
    )
    packed = sequence_pack(docs, "doc_id", "ws_tokens", max_len=256)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("seq_start_tokens"),
            F.sum("is_split").alias("n_split_docs"),
        )
        .orderBy("seq_id")
    )


@query("q51_sketch_merge")
def q51_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch maintenance: per-day Datasketches HLL sketches
    of the distinct-user set (hll_sketch_agg), UNION-merged
    (hll_union_agg) into the global estimate — the pattern that makes
    incremental distinct-count maintenance possible at 100 TB: daily
    partials are tiny binary sketches, the merge never rescans
    history, and (unlike q45's decomposable sums) even COUNT DISTINCT
    becomes decomposable. Complements q27 (one-shot approx) with the
    MERGE axis.

    Sketch bytes are engine-specific, so the oracle asserts the
    portable contract: the merged estimate sits within HLL error
    bounds of the exact distinct count (lgConfigK=12 → ~1.6% standard
    error; 5% gate), per-day and merged. Datasketches HLL is
    hash-deterministic — the booleans are stable across runs and
    partitionings.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_day_ok = daily.select(
        F.min(
            (
                F.abs(
                    F.hll_sketch_estimate("sk") - F.col("exact_users")
                )
                <= F.col("exact_users") * 0.05
            ).cast("int")
        ).alias("__all_ok")
    )
    merged = daily.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_total_users"))
    return (
        merged.crossJoin(exact)
        .crossJoin(per_day_ok)
        .select(
            "n_days",
            "exact_total_users",
            (
                F.abs(F.col("__est") - F.col("exact_total_users"))
                <= F.col("exact_total_users") * 0.05
            ).alias("merged_within_5pct"),
            (F.col("__all_ok") == 1).alias("daily_all_within_5pct"),
        )
    )


@query("q50_ranked_concat")
def q50_ranked_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality with a RANK-ORDERED top-3 concat list —
    the reference's favorite reporting garnish, GROUP_CONCAT(x ORDER BY
    score DESC LIMIT 3), which it applies in SEVEN workloads (e.g.
    SQL/Geographic Content Preference Mapping.txt:93, SQL/Seasonal
    Viewing Pattern Analysis.txt:94), plus its DAYOFWEEK axis
    (SQL/Seasonal Viewing Pattern Analysis.txt).

    Spark-first: collect_list has no intra-group order guarantee, so
    the rank-ordered string is built as array_join(transform(
    array_sort(collect_list(struct(rnk, x))))) — deterministic on any
    partitioning. Ranking uses the 2dp-rounded per-type value with a
    name tiebreak so both engines order identically.

    Scale: facts collapse to (dow × event_type) partials first; every
    window/agg after that runs on ≤ 7×|types| rows.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy(
        F.dayofweek("ts").alias("dow"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("tv"),
    )
    w = Window.partitionBy("dow").orderBy(F.desc("tv"), "event_type")
    top3 = (
        per_type.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .groupBy("dow")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("top_types")
        )
    )
    totals = ev.groupBy(F.dayofweek("ts").alias("dow")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return totals.join(top3, "dow").orderBy("dow")


@query("q49_sql_sessionize")
def q49_sql_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, sessionization workload: the reference's
    marquee LAG + gap-flag + running-sum construct (SQL/Binge-Watching
    Behavior Analysis.txt:10-56) as runnable spark.sql text over
    registered views — daily session-level rollup, distinct from q03's
    per-user DataFrame form so both API surfaces of the hardest
    construct are exercised."""
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ordered AS (
            SELECT user_id, event_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR (cast(ts AS double) - cast(prev_ts AS double)) > 1800
                           THEN 1 ELSE 0 END AS is_new
            FROM ordered
        ),
        sess AS (
            SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_seq,
                date_format(min(ts), 'yyyy-MM-dd') AS start_day,
                count(*) AS n_events,
                (max(cast(ts AS double)) - min(cast(ts AS double))) / 60.0
                    AS minutes
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT start_day,
               count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users,
               round(avg(n_events), 4) AS avg_session_events,
               round(avg(minutes), 4) AS avg_session_minutes
        FROM per_session GROUP BY start_day ORDER BY start_day
        """
    )


@query("t11_bigram_surprisal")
def t11_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-conditional surprisal per doc (2-gram LM fluency axis,
    engine-exact BIGINT arithmetic) — see
    textstats.bigram_surprisal_scores."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bigram_surprisal_scores,
    )

    docs = table(spark, sf_dir, "documents")
    return bigram_surprisal_scores(docs).orderBy("doc_id")


@query("m05_image_phash")
def m05_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over binary payloads — the
    multimodal tier joined to the dedup stack: stub-decode each payload
    to an 8x8 thumbnail (same gather as m03), 64-bit average-hash
    signature, chunk-pigeonhole candidates, exact hamming verify,
    top-20 closest pairs (the dedup review queue; this synthetic
    corpus has no pairs under the strict ≤ 3 cutoff, so the query
    surfaces the nearest candidates instead of an empty screen).

    Oracle-verified like m02–m04: thumbnail gather and the aHash bit
    threshold (thumb[j]*64 > sum) are pure integer arithmetic over the
    text's UTF-8 bytes, replayed by the DuckDB oracle from
    hex(encode(text)); candidate losslessness at hamming ≤ 3
    (pigeonhole) and planted near-dup recovery are additionally
    covered in tests/test_multimodal.py."""
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        phash_neardup_pairs,
        phash_signatures,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    sigs = phash_signatures(with_binary_payload(docs))
    return (
        phash_neardup_pairs(sigs, max_hamming=None)
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(20)
    )


@query("p11_temperature_mix")
def p11_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (α = 0.5) language re-balancing of the
    corpus — rates ∝ sqrt(n_lang)/n_lang under a half-corpus budget,
    the mT5/XLM-R mixture rule — summarized per language as the
    actually-kept set (md5-ppm deterministic, not rand()).

    Oracle-verified value-for-value: integer milli-weights make the
    weight sum order-independent, and the rate is one fixed-order
    IEEE double expression both engines compute bit-identically.
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        temperature_mix,
    )

    docs = table(spark, sf_dir, "documents")
    kept = temperature_mix(docs, "doc_id", "lang", budget_divisor=2)
    summary = kept.groupBy("lang", "w_mil", "rate_ppm").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return (
        totals.join(summary, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("w_mil", F.lit(0)).alias("w_mil"),
            F.coalesce("rate_ppm", F.lit(0)).alias("rate_ppm"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
        .orderBy("lang")
    )


@query("p10_curriculum")
def p10_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for a training run: t08's quality scorer →
    4 quality stages (stage 1 = cleanest quartile first) → seeded md5
    shuffle within each stage → one global curriculum_rank.

    Exact oracle: the whole permutation is verified (NTILE staging,
    md5 within-stage order, concatenated rank), not just proportions —
    stage assignment rides quantiles.scalable_ntile (bit-equal to the
    global-window NTILE) and the within-stage order rides
    grouped_prefix_stats, both already parity-tested machinery."""
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        curriculum_order,
    )
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
    )

    docs = table(spark, sf_dir, "documents")
    scored = classifier_score(docs).select("doc_id", "score_ppm")
    return curriculum_order(scored, stages=4, seed=0).orderBy(
        "curriculum_rank"
    )


# Planted boilerplate for d13: segment-aligned PREFIXES so the planted
# segments chunk identically across docs (an appended suffix would
# straddle a chunk boundary at a doc-dependent offset and never
# collide cross-doc). 16 shared words (= segments 0-1 at seg_words=8)
# on every doc; even docs get an extra 8-word promo segment in front
# (3 planted segments). The original word-soup text shifts by a
# doc-dependent multiple of 8, so its chunks stay doc-unique.
_D13_COMMON = (
    "this content is provided under the standard corporate "
    "license agreement all rights reserved worldwide by provider"
)
_D13_PROMO = "subscribe now to our premium newsletter for updates"


@query("d13_boilerplate_scrub")
def d13_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide boilerplate-segment removal (Wenzek et
    al. 2020): 8-word segments occurring in ≥10 distinct docs are
    dropped, surviving segments reassembled in order — the linear-pass
    scrub that runs BEFORE any pairwise dedup. The synthetic corpus has
    no shared chrome, so the query plants deterministic license/promo
    prefixes (all docs / even docs) — both engines build the identical
    augmented text, so removal AND reassembly are value-verified
    (per-doc clean_fp = md5 of the scrubbed text)."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        boilerplate_scrub,
    )

    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.when(F.col("doc_id") % 2 == 0, F.lit(_D13_PROMO)),
            F.lit(_D13_COMMON),
            F.col("text"),
        ).alias("aug_text"),
    )
    return boilerplate_scrub(
        aug, id_col="doc_id", text_col="aug_text", seg_words=8, min_docs=10
    ).orderBy("doc_id")


@query("p12_density_prune")
def p12_density_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style density-based diversification (Tirumala et al. 2023)
    over the embedding corpus: total-neighbor-cosine density from the
    s05 kNN graph, per-label ascending rank, keep the least-dense
    half — the curation stage that prunes over-represented semantic
    modes AFTER near-dup removal (d08/d11). Emits the full per-vector
    artifact (density_ppm, dens_rank, kept), value-verified: integer
    micro-unit density sums + mirrored kNN-graph oracle. Scores
    against the build-once graph ARTIFACT (io.knn_graph_artifact),
    shared with q68/q71 — built by whichever consumer runs first."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        density_prune,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    emb = table(spark, sf_dir, "embeddings")
    return density_prune(
        emb, k=5, n_bits=None, dim=64,
        graph=knn_graph_artifact(spark, sf_dir),
    ).orderBy("label", "dens_rank")


@query("t12_heuristic_rules")
def t12_heuristic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher heuristic rule battery over the corpus: per-doc
    boolean rule flags (word-count bounds, integer mean-word-length
    bounds, ≥2 stop words, unique-token fraction, code/placeholder
    screens) + n_failed + the keep conjunction — the rule gate that
    runs BEFORE the learned classifier (t08). One scan, pure codegen,
    engine-exact integer arithmetic; oracle verifies every flag."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        heuristic_rules,
    )

    docs = table(spark, sf_dir, "documents")
    return heuristic_rules(docs).select(
        "doc_id",
        "n_tokens",
        "r_nwords",
        "r_wordlen",
        "r_stop2",
        "r_unique",
        "r_clean",
        "n_failed",
        "keep",
    ).orderBy("doc_id")


@query("s06_pq_ann")
def s06_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): 4 subspaces × 8
    lowest-id codebook entries, ADC scan over 4 small codes per vector
    (the RAM story for 10⁹-vector indexes), exact cosine re-rank of
    the top-20 ADC candidates. Fully deterministic (seeded codebooks,
    tie-to-lower-code argmin, fixed-order ADC sum), so the DuckDB
    oracle mirrors codebooks → codes → ADC → refine value-for-value."""
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        ann_pq_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_pq_topk(emb, queries, k=5).orderBy("query_id", "rnk")


@query("m06_modality_router")
def m06_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality payload routing: sniff container magic bytes
    (PNG/JPEG/RIFF-WAVE planted by doc_id % 4), split off the body,
    and emit per-modality typed metadata (image stub dims / audio
    duration / quarantine reason) in ONE codegen pass — the dispatch
    stage a mixed crawl runs before any decode fan-out. Full oracle:
    both engines build identical bytes, and the sniff/metadata
    arithmetic is hex/integer-exact."""
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        modality_router,
        with_mixed_payload,
    )

    docs = table(spark, sf_dir, "documents")
    return modality_router(with_mixed_payload(docs)).orderBy("doc_id")


@query("p13_dataset_card")
def p13_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card audit: the per-(source, lang) release artifact a
    curated corpus ships — sizes (docs / whitespace tokens / chars),
    mean quality-classifier score, heuristic-rule pass rate, and
    exact-duplicate rate, computed in ONE scan + one groupBy (every
    measure is a decomposable conditional aggregate; the dup rate is
    countDistinct over the d01 fingerprint). Integer ppm arithmetic
    end to end — bit-exact oracle."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
        exact_fingerprint,
        heuristic_rules,
    )

    docs = table(spark, sf_dir, "documents")
    rules = heuristic_rules(docs).select(
        "doc_id", "text", "source", "lang", "n_chars",
        F.col("n_tokens").cast("long").alias("__toks"),
        F.col("keep").alias("__rule_keep"),
        exact_fingerprint("text").alias("__fp"),
    )
    scored = classifier_score(
        rules,
        carry_cols=(
            "source", "lang", "n_chars", "__toks", "__rule_keep", "__fp",
        ),
    )
    return (
        scored.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("sum(score_ppm) div count(*)").alias("mean_quality_ppm"),
            F.expr(
                "1000000 * sum(case when __rule_keep then 1 else 0 end)"
                " div count(*)"
            ).alias("rule_pass_ppm"),
            F.expr(
                "1000000 * (count(*) - count(distinct __fp)) div count(*)"
            ).alias("exact_dup_ppm"),
        )
        .orderBy("source", "lang")
    )


@query("t13_bpe_merge_counts")
def t13_bpe_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training merge counting (Sennrich et al. 2016):
    word-frequency dictionary → adjacent character pairs weighted by
    word freq → top-20 merge candidates. The inner loop of training a
    tokenizer over the corpus, as a two-shuffle counting job; integer
    arithmetic end to end, bit-exact oracle."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_merge_counts,
    )

    docs = table(spark, sf_dir, "documents")
    return bpe_merge_counts(docs, top_k=20).orderBy("rnk")


@query("d17_cdc_chunk_dedup")
def d17_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (Rabin-style CDC — the storage
    dedup technique): chunk boundaries fall where a rolling 8-byte
    polynomial hash hits a mask (h % 64 == 0), so INSERTIONS SHIFT
    BOUNDARIES ONLY LOCALLY — unlike fixed-size blocks, shared
    content still produces identical chunks. Chunks are fingerprinted
    and deduplicated corpus-wide; per doc: chunk count, cross-doc
    duplicated chunks, dup ppm. Docs are screened on their first 512
    chars (prefix CDC — the screen tier).

    r11 optimization (guide §4.2/§2.4): boundary detection + chunk
    fingerprinting moved from an interpreted ARRAY-LAMBDA filter (8
    unrolled element_at terms per position, evaluated interpreted per
    element — ~20M boxed BIGINT ops at sf0.1, and the plan referenced
    the chunk subtree TWICE) into ONE vectorized Arrow kernel
    (operators/dedup.cdc_chunk_doc_fps): the whole screen is a
    sliding-window numpy product over UTF-32 codepoints, exact int64
    arithmetic, chunk md5 via hashlib on the few chunk substrings.
    This also removes the per-doc lead() WINDOW EXCHANGE outright —
    boundaries and chunk assembly are row-local. The kernel emits one
    (doc, fp, cnt) row per distinct fp within a doc, so the
    cross-doc count is a plain count (no two-phase DISTINCT agg).
    Measured 8.3s → ~1.4s at sf0.1; identical values (same modulus /
    power constants / md5), DuckDB oracle unchanged.

    Scale: per-byte examination is inherent to CDC; the kernel is a
    narrow scan-bound map. The 'copyN'-suffixed near-dup corpus means
    shared prefixes chunk identically — dup_ppm really fires.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        cdc_chunk_doc_fps,
    )

    docs = table(spark, sf_dir, "documents")
    # chunk fps feed the corpus-wide fp rollup AND the per-doc join
    # side — materialize so the kernel executes once (the frame is
    # ~chunks/doc × docs rows of (id, hex, cnt) — tiny).
    chunks = cdc_chunk_doc_fps(docs).localCheckpoint()
    # countDistinct, not count: the kernel emits per-(input row, fp),
    # so this stays exactly count(DISTINCT doc_id) even if an input
    # ever carried duplicate doc_ids (oracle parity under any input).
    fp_docs = chunks.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(fp_docs, "fp")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_chunks"),
            F.sum(
                F.when(F.col("n_docs") > 1, F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.expr("1000000 * n_dup_chunks DIV n_chunks").alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


@query("q62_temporal_join")
def q62_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL dimension lookup — the consumption side of q29's SCD2
    build: each fact joins the dimension version VALID AT ITS OWN
    time (valid_from ≤ o_orderdate < valid_to), so a customer
    promoted mid-history books pre-promotion orders under the old
    segment and post-promotion orders under the new one. The
    point-in-time-correct join every warehouse needs and naive
    current-state joins silently get wrong.

    Scale: SCD2 versions TILE the timeline per key (valid_to of one
    = valid_from of the next, first version covers history start),
    so "the version valid at t" ≡ "the LATEST version with
    valid_from <= t" — an AS-OF join (operators/asof.py): union +
    one key-partitioned window, ONE shuffle, ZERO pre-filter pair
    materialization. The previous equi-join + residual-interval form
    materialized orders × versions pairs per key before filtering —
    fine for bounded chains, but a hot key with deep version history
    and heavy facts goes quadratic at 100×; the as-of form cannot
    (round-3 VERDICT watch item). Each fact matches exactly one
    version (asserted in tests/test_operators.py).
    """
    from etl_sql_and_pyspark_developement__spark.operators.asof import as_of_join
    from etl_sql_and_pyspark_developement__spark.operators.scd2 import scd2_apply

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    dim = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("PROMOTED").alias("segment"),
        F.round(F.col("c_acctbal") + 100, 2).alias("acctbal"),
    )
    # effective mid-history so facts genuinely split across versions
    versions = scd2_apply(
        dim, updates, key="custkey", attr_cols=["segment", "acctbal"],
        effective_date="1996-01-01",
    )
    facts = orders.select(
        F.col("o_custkey").alias("custkey"), "o_orderdate", "o_totalprice"
    )
    j = as_of_join(
        facts,
        versions.withColumn("vf_date", F.to_date("valid_from")),
        key="custkey",
        left_ts="o_orderdate",
        right_ts="vf_date",
        payload={"segment": "segment", "valid_from": "valid_from"},
    )
    return (
        j.groupBy(
            F.col("asof_segment").alias("segment"),
            F.col("asof_valid_from").alias("valid_from"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .orderBy("segment", "valid_from")
    )


@query("q61_capped_running_total")
def q61_capped_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPPED running total per user (loyalty-balance semantics:
    bal = min(cap, bal + value) per purchase, in time order).
    Looks prefix-dependent — each step's input is the previous
    step's clamped output — but purchase values are NON-NEGATIVE,
    and for non-negative adds the fold collapses to
    ``least(cap, running_sum)``: once capped it stays capped, and
    before capping the balance IS the prefix sum. So the default
    plan is pure window codegen (operators/fold.py) — one user-keyed
    shuffle, zero Python — bit-identical to the sequential fold
    (Spark's running-frame sum accumulates in sort order, same IEEE
    add sequence). The DuckDB oracle walks the fold as a recursive
    CTE; the mixed-sign general case keeps an applyInPandas path in
    the operator (assume_nonnegative=False), exercised in tests.

    Reference parity: R19's lifetime-value accumulation with
    promotion caps is exactly this shape.

    Scale: ONE shuffle (hash on user), everything in WholeStageCodegen.
    """
    from etl_sql_and_pyspark_developement__spark.operators.fold import (
        capped_running_total,
    )

    ev = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    out = capped_running_total(
        ev, key="user_id", order=["ts", "event_id"], value_col="value",
        cap=500.0, assume_nonnegative=True,
    )
    return out.withColumnRenamed("n_events", "n_purchases").orderBy("user_id")


@query("t18_langid_eval")
def t18_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVALUATION metrics — per-class precision/recall for
    t02's language-ID against the corpus's ground-truth lang column
    (t02 emits the confusion counts; this is the metric layer every
    shipped gate needs before it filters 100 TB). Integer ppm from
    decomposable counts; classes are the union of true and predicted
    labels (so a predicted-only class like 'und' still gets a
    precision row).

    Scale: one scan scores+predicts (codegen), two tiny groupBys on
    the ≤|langs|+1 label space, one label-keyed outer join.
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        predict_lang,
    )

    docs = table(spark, sf_dir, "documents")
    pred = predict_lang(docs).select(
        F.col("lang").alias("true_lang"), "predicted_lang"
    )
    per_true = pred.groupBy(F.col("true_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            (F.col("predicted_lang") == F.col("true_lang")).cast("bigint")
        ).alias("n_correct"),
    )
    per_pred = pred.groupBy(F.col("predicted_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return (
        per_true.join(per_pred, "cls", "full_outer")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).alias("n_correct"),
            F.expr(
                "CASE WHEN coalesce(n_true, 0) > 0 THEN "
                "1000000 * coalesce(n_correct, 0) DIV n_true END AS recall_ppm"
            ),
            F.expr(
                "CASE WHEN coalesce(n_pred, 0) > 0 THEN "
                "1000000 * coalesce(n_correct, 0) DIV n_pred END "
                "AS precision_ppm"
            ),
        )
        .orderBy("cls")
    )


@query("d16_entity_resolution")
def d16_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over RELATIONAL records — the dedup family's
    structured-data sibling (doc dedup matches text; ER matches dirty
    feed rows to master records). A dirty feed is planted from the
    customer dim (every custkey % 9 == 0 re-keyed with case-mangled
    name, ±0.01 balance drift, case-mangled segment; % 9 == 5 spawns
    genuinely NEW entities that must NOT match). Resolution =
    BLOCKING on (nation, digits-of-name) — a normalization-stable
    key, so case mangling can't escape the block — then field
    scoring (normalized name equality + balance proximity + segment
    equality) on candidates only. Never an all-pairs compare: the
    block join is an equi-join, the classic ER scale pattern.

    Planted ground truth makes precision/recall exact: every variant
    must match, no new entity may (asserted in tests/test_dedup.py).
    """
    cust = table(spark, sf_dir, "customer")
    variants = cust.filter(F.col("c_custkey") % 9 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("d_key"),
        F.upper("c_name").alias("d_name"),
        F.col("c_nationkey").alias("d_nation"),
        F.round(F.col("c_acctbal") + 0.01, 2).alias("d_acctbal"),
        F.lower("c_mktsegment").alias("d_segment"),
    )
    fresh = cust.filter(F.col("c_custkey") % 9 == 5).select(
        (F.col("c_custkey") + 20_000_000).alias("d_key"),
        F.concat(F.lit("Customer#NEW"), F.col("c_custkey").cast("string")).alias(
            "d_name"
        ),
        F.col("c_nationkey").alias("d_nation"),
        F.round(F.col("c_acctbal"), 2).alias("d_acctbal"),
        F.lower("c_mktsegment").alias("d_segment"),
    )
    dirty = variants.unionByName(fresh)
    block = lambda c: F.regexp_replace(c, "[^0-9]", "")
    master = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        block("c_name").alias("blk"),
    )
    dirty_b = dirty.withColumn("d_blk", block(F.col("d_name")))
    cand = dirty_b.join(
        master,
        (F.col("d_nation") == F.col("c_nationkey"))
        & (F.col("d_blk") == F.col("blk")),
    )
    scored = cand.withColumn(
        "matched",
        (
            (F.lower("d_name") == F.lower("c_name"))
            & (F.abs(F.col("d_acctbal") - F.col("c_acctbal")) <= 0.02)
            & (F.lower("d_segment") == F.lower("c_mktsegment"))
        ).cast("int"),
    )
    per_nation = scored.groupBy(
        F.col("d_nation").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("matched").alias("n_matched"),
    )
    dirty_counts = dirty.groupBy(
        F.col("d_nation").alias("nationkey")
    ).agg(F.count(F.lit(1)).alias("n_dirty"))
    return (
        dirty_counts.join(per_nation, "nationkey", "left")
        .select(
            "nationkey",
            "n_dirty",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
        .orderBy("nationkey")
    )


@query("q60_pareto_abc")
def q60_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification (the 80-20 revenue-concentration
    analysis): parts ranked by revenue, EXACT ordered cumulative
    share, classes A (≤70% cumulative), B (≤90%), C (rest). The
    running sum goes through quantiles.grouped_prefix_stats — the
    distributed exact-rank machinery q12/p06/p07 use — NOT a global
    ordered window, so 10⁸ parts never serialize through one task.
    Revenue is integer ten-thousandths (round(price·(1-disc)·1e4)),
    so the distributed partial sums are order-independent and the
    cumulative shares are bit-identical to the oracle's sequential
    window.

    Reference parity: R8's ROI banding and R19's value deciles are
    fixed-band forms of this; ABC is the data-driven band version.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 10000) "
                "AS BIGINT)"
            )
        ).alias("rev_e4")
    )
    pre = grouped_prefix_stats(
        rev.withColumn("__g", F.lit(1)),
        "__g",
        "rev_e4",
        ["rev_e4"],
        "l_partkey",
        rank_out="rnk",
        cum_out="cum_rev",
    )
    total = rev.agg(F.sum("rev_e4").alias("tot"))
    classed = pre.join(F.broadcast(total)).select(
        "l_partkey",
        "rnk",
        "rev_e4",
        F.expr(
            # widen to decimal: 1e6 * cum_rev overflows BIGINT at
            # warehouse revenue scales
            "CAST(CAST(cum_rev AS DECIMAL(38, 0)) * 1000000 DIV tot "
            "AS BIGINT) AS cum_share_ppm"
        ),
    ).withColumn(
        "abc_class",
        F.expr(
            "CASE WHEN cum_share_ppm <= 700000 THEN 'A' "
            "WHEN cum_share_ppm <= 900000 THEN 'B' ELSE 'C' END"
        ),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_e4").alias("class_rev_e4"),
            F.min("rnk").alias("min_rank"),
            F.max("rnk").alias("max_rank"),
        )
        .orderBy("abc_class")
    )


@query("q59_histogram")
def q59_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram profiling via width_bucket — the
    distribution-shape diagnostic alongside q44's skew profile and
    q18's summary stats (a data engineer's first look at a new 100 TB
    column). Bounds come from one tiny min/max aggregate broadcast
    into the bucketing scan; counts are ONE decomposable groupBy over
    ≤ n_buckets+2 keys. Bucket edges are data-derived, so the same
    query profiles any scale.

    Reference parity: R8/R19's value-band segmentation (CASE ladders
    over revenue bands) is this, generalized to data-driven bands.
    """
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucketed = orders.join(F.broadcast(bounds)).select(
        F.expr(
            "width_bucket(o_totalprice, lo, hi, 10) AS bucket"
        ),
        "o_totalprice",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@query("q58_multitouch_attribution")
def q58_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-touch attribution — the marketing-science upgrade of
    q25's last-touch as-of join: every view in the 7 days before a
    purchase shares the conversion credit linearly (credit_ppm =
    1e6/n, remainder to the last touch so each purchase's credit sums
    to EXACTLY 1e6 — integer conservation makes the whole model
    engine-exact), with first-/last-touch position counts per day.

    Reference parity: R14/R20 measure personalization/recommendation
    effectiveness per touchpoint; linear attribution is the standard
    multi-touch baseline.

    Scale: the touch join is keyed on (user_id, 7-day time-bin) via
    operators/rangejoin.py — each purchase's [p_ts-7d, p_ts] window
    explodes to the ≤2 bins it spans and views equi-join on
    (user, bin) with the exact BETWEEN as a residual. A plain
    user-keyed join with a residual time filter is one shuffle too,
    but a hot user (10⁴ views × 10³ purchases) materializes 10⁷
    pre-filter pairs in ONE task at 100× (round-3 VERDICT watch
    item); the bin in the key splits that hot key across time, so
    per-task fan-out is bounded by one week's activity. The
    per-purchase credit windows then ride the same user partitioning.
    """
    from etl_sql_and_pyspark_developement__spark.operators.rangejoin import (
        range_join,
    )

    ev = table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_eid"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr("interval 7 days")).alias("p_lo"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_eid"),
        F.col("ts").alias("v_ts"),
    )
    j = range_join(
        views, purch, point_col="v_ts", lo_col="p_lo", hi_col="p_ts",
        bin_width=7 * 86400, keys=("user_id",),
    )
    wp = Window.partitionBy("user_id", "p_eid")
    wo = wp.orderBy("v_ts", "v_eid")
    touched = (
        j.withColumn("n_touches", F.count(F.lit(1)).over(wp))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "credit_ppm",
            F.expr(
                "1000000 DIV n_touches "
                "+ CASE WHEN rn = n_touches THEN 1000000 % n_touches "
                "ELSE 0 END"
            ),
        )
    )
    return (
        touched.groupBy(F.to_date("v_ts").alias("view_day"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_ppm").alias("credited_ppm"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias(
                "first_touches"
            ),
            F.sum(
                F.when(F.col("rn") == F.col("n_touches"), 1).otherwise(0)
            ).alias("last_touches"),
        )
        .select(
            F.date_format("view_day", "yyyy-MM-dd").alias("view_day"),
            "n_touches",
            "credited_ppm",
            "first_touches",
            "last_touches",
        )
        .orderBy("view_day")
    )


@query("t17_sentiment")
def t17_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AFINN-style lexicon sentiment scoring (the classic large-scale
    Spark text workload — cf. 'Large Scale Sentiment Analysis on
    Twitter with Spark', EDBT 2016): per doc, signed valence sums
    over a term→score lexicon, net-polarity ppm, and a polarity
    class. The demo lexicon maps the corpus's own adjectives
    (fast +2, small +1, big -1, slow -2); a production run swaps in
    AFINN/VADER terms with the identical plan.

    Scale: the lexicon is a CASE map inside the explode projection
    (no join at all — a broadcast join would also work for 10⁵-term
    lexicons); ONE per-doc groupBy of decomposable sums. Integer
    arithmetic end-to-end, bit-exact oracle.
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        tokens,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens(F.col("text"))).alias("term"),
    )
    valence = F.expr(
        "CASE term WHEN 'fast' THEN 2 WHEN 'small' THEN 1 "
        "WHEN 'big' THEN -1 WHEN 'slow' THEN -2 ELSE 0 END"
    )
    scored = toks.select("doc", valence.alias("v"))
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(F.col("v") < 0, 1).otherwise(0)).alias("n_neg"),
            F.sum("v").alias("net_valence"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            "n_tokens",
            "n_pos",
            "n_neg",
            "net_valence",
            F.expr(
                "1000000 * net_valence DIV n_tokens AS sentiment_ppm"
            ),
            F.expr(
                "CASE WHEN net_valence > 0 THEN 'positive' "
                "WHEN net_valence < 0 THEN 'negative' "
                "ELSE 'neutral' END AS polarity"
            ),
        )
        .orderBy("doc_id")
    )


@query("t16_hash_embed")
def t16_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document embeddings (dim 16, L2-normalized) —
    see operators/textstats.hash_embed; one explode + one
    partial-agg-decomposable groupBy, engine-exact md5 arithmetic."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        hash_embed,
    )

    docs = table(spark, sf_dir, "documents")
    return hash_embed(docs, dim=16).orderBy("doc_id")


@query("p14_label_vote")
def p14_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver-label aggregation: majority vote across 3 synthetic
    annotators (weak supervision / LLM-judge ensembles produce exactly
    this shape — N noisy labels per doc, one consensus label out).
    Annotator labels derive deterministically from md5(doc_id, k):
    each annotator flips the base class ~20% of the time, so
    unanimous / 2-1 / 1-1-1 outcomes all occur and the vote logic is
    value-verified.

    Scale: annotations-per-doc is BOUNDED, so the whole vote is
    per-row codegen — vote counts and the tie-broken argmax are CASE
    arithmetic over three columns, ZERO shuffles (a groupBy(doc,
    label) + rank formulation would shuffle twice for nothing).
    """
    docs = table(spark, sf_dir, "documents")

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#" + salt)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    base_idx = h("base") % 3
    lab = docs.select("doc_id", base_idx.alias("__b"))
    for k in range(3):
        hk = h(f"a{k}")
        idx = F.when(
            hk % 5 == 0, (F.col("__b") + 1 + (hk / 5).cast("long") % 2) % 3
        ).otherwise(F.col("__b"))
        lab = lab.withColumn(
            f"label_{k}",
            F.element_at(F.array(F.lit("good"), F.lit("mid"), F.lit("spam")), (idx + 1).cast("int")),
        )
    votes = lab
    for c in ("good", "mid", "spam"):
        votes = votes.withColumn(
            f"__v_{c}",
            sum(
                (F.col(f"label_{k}") == c).cast("int") for k in range(3)
            ),
        )
    return (
        votes.select(
            "doc_id",
            "label_0",
            "label_1",
            "label_2",
            F.expr(
                "CASE WHEN __v_good >= __v_mid AND __v_good >= __v_spam "
                "THEN 'good' WHEN __v_mid >= __v_spam THEN 'mid' "
                "ELSE 'spam' END AS consensus"
            ),
            F.greatest("__v_good", "__v_mid", "__v_spam").alias(
                "consensus_votes"
            ),
            F.expr(
                "1000000 * CAST(greatest(__v_good, __v_mid, __v_spam) "
                "AS BIGINT) DIV 3 AS agreement_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@query("t15_oov_rate")
def t15_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per doc vs the corpus top-20 vocab —
    the tokenizer-shift filter axis; see operators/textstats.oov_rates
    (broadcast vocabulary, TakeOrdered top-N, integer ppm). The
    synthetic corpus has ~31 distinct words, so top-20 leaves the
    rare tail genuinely out-of-vocabulary at every sf (a real corpus
    would use 10⁴–10⁵ with the same plan)."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        oov_rates,
    )

    docs = table(spark, sf_dir, "documents")
    return oov_rates(docs, vocab_size=20).orderBy("doc_id")


@query("q57_sql_cohort")
def q57_sql_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, cohort workload (R7): first-activity cohort +
    month-offset retention as runnable spark.sql text over registered
    views — the EVENTS-side cohort (first-seen month per user,
    retention of users active k months later), distinct from q05's
    orders-side DataFrame matrix so both API surfaces and both fact
    tables exercise the construct. Reference parity: SQL/Content
    Performance with Cohort Analysis.txt's cohort CTE chain.

    Scale: first-touch is one user-keyed aggregation; the activity
    join is user-keyed (broadcast-eligible cohort side at small
    cohort counts, shuffle join at scale); months_between on truncs
    keeps the offset arithmetic in codegen.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH first_touch AS (
            SELECT user_id,
                   date_trunc('month', min(ts)) AS cohort_month
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('month', ts) AS act_month
            FROM events
        ),
        joined AS (
            SELECT f.cohort_month,
                   CAST(months_between(a.act_month, f.cohort_month) AS INT)
                       AS month_offset,
                   a.user_id
            FROM activity a JOIN first_touch f USING (user_id)
        ),
        sizes AS (
            SELECT cohort_month, count(*) AS cohort_size
            FROM first_touch GROUP BY cohort_month
        )
        SELECT date_format(j.cohort_month, 'yyyy-MM') AS cohort_month,
               j.month_offset,
               count(DISTINCT j.user_id) AS n_active,
               s.cohort_size,
               1000000 * count(DISTINCT j.user_id) DIV s.cohort_size
                   AS retention_ppm
        FROM joined j JOIN sizes s ON j.cohort_month = s.cohort_month
        GROUP BY j.cohort_month, j.month_offset, s.cohort_size
        ORDER BY cohort_month, month_offset
        """
    )


@query("q56_trend_regression")
def q56_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares TREND detection with the built-in REGR_* aggregate
    family (regr_slope/intercept/r2/count — JVM-side, partial-agg
    decomposable): per event type, fit value-per-day against day index
    and classify the trend. The reference's virality/performance
    modeling fits exactly this shape (R13's feature modeling, R16's
    growth trajectories).

    Scale: facts collapse to one row per (type, day) FIRST (one
    shuffle, partial-aggregated); the regression then aggregates the
    tiny series per type — REGR_* decompose like sum/count, so the
    same query runs unchanged on 10⁹ rows/day. Slope/intercept are
    rounded at 4dp over day-indexed integer x, keeping both engines'
    float sums representable and hash-stable.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    bounds = daily.agg(F.min("day").alias("d0"))
    series = daily.join(F.broadcast(bounds)).select(
        "event_type",
        F.datediff("day", "d0").cast("double").alias("x"),
        F.col("day_value").alias("y"),
    )
    return (
        series.groupBy("event_type")
        .agg(
            F.round(F.expr("regr_slope(y, x)"), 4).alias("slope"),
            F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
            F.round(F.expr("regr_r2(y, x)"), 4).alias("r2"),
            F.expr("regr_count(y, x)").alias("n_days"),
        )
        .withColumn(
            "trend",
            F.expr(
                "CASE WHEN slope > 1.0 THEN 'rising' "
                "WHEN slope < -1.0 THEN 'falling' "
                "ELSE 'flat' END"
            ),
        )
        .orderBy("event_type")
    )


@query("q55_snapshot_diff")
def q55_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF — the ETL regression tool: compare two versions
    of a table and classify every business key as added / removed /
    changed / unchanged, with a per-row attribute hash so 'changed'
    detection is one comparison, not N column equality checks. The
    new snapshot is derived deterministically (every custkey % 7 == 0
    re-segmented, % 11 == 0 dropped, 3 synthetic keys added) so the
    diff itself is value-verified.

    Scale: ONE full-outer join on the business key (both sides
    pre-projected to key + md5(attrs)), then a codegen CASE; the
    summary rollup is a tiny groupBy. No window, no collect. This is
    how you regression-test a 100 TB nightly rebuild against
    yesterday's: hash-project both sides, join on key, count the
    classes.
    """
    cust = table(spark, sf_dir, "customer")
    old = cust.select(
        F.col("c_custkey").alias("key"),
        F.md5(
            F.concat_ws("|", "c_name", "c_mktsegment", F.round("c_acctbal", 2))
        ).alias("h_old"),
    )
    new_base = cust.filter(F.col("c_custkey") % 11 != 0).select(
        F.col("c_custkey").alias("key"),
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("RESEGMENTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    added = spark.range(3).select(
        (F.col("id") + 9_000_000).alias("key"),
        F.concat(F.lit("Customer#new"), F.col("id")).alias("c_name"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    new = new_base.unionByName(added).select(
        "key",
        F.md5(
            F.concat_ws("|", "c_name", "c_mktsegment", "c_acctbal")
        ).alias("h_new"),
    )
    diff = old.join(new, "key", "full_outer").select(
        "key",
        F.expr(
            "CASE WHEN h_old IS NULL THEN 'added' "
            "WHEN h_new IS NULL THEN 'removed' "
            "WHEN h_old <> h_new THEN 'changed' "
            "ELSE 'unchanged' END AS status"
        ),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
        .orderBy("status")
    )


@query("d15_quality_keeper")
def d15_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (d06's
    LSH pairs → connected components) keep their HIGHEST-t08-score
    member, not the lowest id — a real pipeline keeps the best copy
    of a duplicated page, and 'which copy' changes the training set.
    Emits per cluster the keeper, its score, member count, and chars
    dropped.

    Scale: pairs come from the SHARED verified-pairs artifact
    (io.minhash_pairs_artifact, built once per corpus snapshot with
    d06); the selection itself is ONE shuffle on component
    (row_number + count/sum windows share the same partitioning),
    never a per-cluster collect. Deterministic tiebreak (score desc,
    doc asc) keeps the oracle bit-exact.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        dedup_components,
    )
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        minhash_pairs_artifact,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_pairs_artifact(spark, sf_dir, threshold=0.5)
    comps = dedup_components(pairs)
    scored = classifier_score(
        docs.select("doc_id", "text", "n_chars"), carry_cols=("n_chars",)
    )
    cf = comps.join(scored, F.col("doc") == F.col("doc_id")).select(
        "component", "doc", "score_ppm", "n_chars"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("score_ppm"), F.asc("doc")
    )
    wa = Window.partitionBy("component")
    return (
        cf.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(wa))
        .withColumn("chars_total", F.sum("n_chars").over(wa))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            "n_docs",
            F.col("doc").alias("keeper_doc"),
            F.col("score_ppm").alias("keeper_score_ppm"),
            "chars_total",
            (F.col("chars_total") - F.col("n_chars")).alias("chars_dropped"),
        )
        .orderBy("component")
    )


@query("q54_forward_fill")
def q54_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse time-series repair: LOCF forward-fill AND linear
    interpolation between observations — the imputation tier q28's
    zero-fill spine lacks (a missing sensor day is not a zero). Per
    user: sparse purchase-day series → per-user daily spine →
    last(ignorenulls)/first(ignorenulls) windows carry the previous/
    next observation and its day, then one CASE computes observed /
    locf / backfill / interpolated values.

    Reference parity: R15/R16's dense-calendar seasonality and
    moving-average series assume gap-repaired input; LOCF via
    last(ignorenulls) is the same construct operators/asof.py builds
    the as-of join from.

    Scale: the spine explodes only each user's own [min, max] day
    span (bounded, data-derived); both fill windows partition by
    user_id — one shuffle, no self-joins, no global windows. Values
    use max() per day (order-independent) so doubles are engine-exact.
    """
    ev = table(spark, sf_dir, "events")
    purch = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 20 == 0)
    )
    daily = purch.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.round(F.max("value"), 4).alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = spans.select(
        "user_id",
        # run 2 days before the first observation and 3 past the last
        # so the backfill (no prev neighbor) and LOCF (no next) arms
        # are genuinely exercised, not just declared
        F.explode(
            F.expr(
                "sequence(date_sub(mn, 2), date_add(mx, 3), interval 1 day)"
            )
        ).alias("day"),
    )
    grid = spine.join(daily, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    filled = (
        grid.withColumn("prev_val", F.last("day_value", ignorenulls=True).over(w_prev))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(w_prev))
        .withColumn("next_val", F.first("day_value", ignorenulls=True).over(w_next))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(w_next))
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.expr(
            "CASE WHEN day_value IS NOT NULL THEN day_value "
            "WHEN prev_val IS NULL THEN next_val "
            "WHEN next_val IS NULL THEN prev_val "
            "ELSE round(prev_val + (next_val - prev_val) "
            "* (datediff(day, prev_day) / datediff(next_day, prev_day)), 4) "
            "END AS filled_value"
        ),
        F.expr(
            "CASE WHEN day_value IS NOT NULL THEN 'observed' "
            "WHEN prev_val IS NULL THEN 'backfill' "
            "WHEN next_val IS NULL THEN 'locf' "
            "ELSE 'interp' END AS fill_kind"
        ),
    ).orderBy("user_id", "day")


@query("d14_url_dedup")
def d14_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the crawl-pipeline tier BEFORE content
    dedup (normalize scheme/host/port/path/params/fragment, group on
    the canonical form). URLs are deterministically planted (the
    documents table has none), so the normalizer is value-verified;
    see operators/dedup.url_dedup. One codegen scan + ONE shuffle."""
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        url_dedup,
    )

    docs = table(spark, sf_dir, "documents")
    return url_dedup(docs).orderBy("canonical_url")


@query("t14_char_diversity")
def t14_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity audit (Renyi-2 collision index, ppm) — the
    zero-shuffle spam pre-filter; see operators/textstats.char_stats.
    Log-free integer arithmetic makes the whole audit bit-exact
    against the oracle."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        char_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return char_stats(docs).orderBy("doc_id")


@query("q53_path_pattern")
def q53_path_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered in-session event-SEQUENCE pattern detection — the
    MATCH_RECOGNIZE capability (view ... click ... purchase IN THAT
    ORDER within one session), which q19's funnel does not enforce
    (q19 counts stage presence; a click-before-view session passes
    q19 but not this). Re-expressed Spark-first: sessionize (one
    shuffle on user_id), collapse each session to its ordered
    event-type path via sort_array(struct(ts, event_id, type)) —
    deterministic under ts ties — then a single regexp over the path
    string. No per-pattern self-joins (the naive SQL form is a
    3-way ordered self-join per session); pattern cost is O(path
    length) per session regardless of pattern size.

    Reference parity: R14's impression→click→conversion ordering
    (SQL/Real-time Personalization Effectiveness.txt) and R2's
    ordered binge detection; the path-string trick is the standard
    distributed MATCH_RECOGNIZE fallback.
    """
    from etl_sql_and_pyspark_developement__spark.operators.sessionize import (
        sessionize,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak_col="event_id")
    paths = sess.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.expr(
                "transform(array_sort(collect_list("
                "struct(ts, event_id, event_type))), x -> x.event_type)"
            ),
        ).alias("path"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("start_day"),
    )
    flagged = paths.withColumn(
        "converted",
        F.col("path").rlike("view.*click.*purchase").cast("bigint"),
    )
    return (
        flagged.groupBy("start_day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").alias("ordered_conversions"),
        )
        .withColumn(
            "conversion_ppm",
            F.expr("1000000 * ordered_conversions DIV n_sessions"),
        )
        .orderBy("start_day")
    )


@query("q52_rolling_distinct")
def q52_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT active users per day — the rolling
    distinct count SQL engines express as COUNT(DISTINCT) OVER RANGE
    but Spark's window functions cannot (DistinctAggregate is
    unsupported over windows). Scale-sane re-expression: dedupe to
    (user, active_day) once, EXPLODE each active day into the ≤7
    window days it contributes to (narrow ×7), then one
    countDistinct per window day — two shuffles total, never a
    per-day self-join or a window over raw facts. Window days are
    clipped to the observed [min, max] day span.

    When the id domain is BOUNDED, q103_rolling_bitmap_distinct is
    the cheaper form: per-day 63-bit words OR-merge across the window
    (rows ~ days x id-range/63, independent of membership volume) and
    the same words answer any window length with one more BIT_OR.

    Reference parity: R16's viral-velocity windows count rolling
    reach; R3's churn windows count recently-active users — both are
    this shape.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    bounds = ev.agg(
        F.max(F.to_date("ts")).alias("__max_day"),
    )
    contrib = daily.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    )
    out = (
        contrib.groupBy("wday")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .join(F.broadcast(bounds), F.col("wday") <= F.col("__max_day"))
        .select(
            F.date_format("wday", "yyyy-MM-dd").alias("day"),
            "active_users_7d",
        )
    )
    return out.orderBy("day")


@query("q63_anomaly_mad")
def q63_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust ANOMALY DETECTION on daily event volumes — median /
    MAD (median absolute deviation) thresholds per event type, the
    outlier rule that, unlike mean±3σ, is not dragged by the
    outliers it is trying to find. Flags days where
    |count − median| > 3·MAD.

    Reference parity: R3's churn-risk thresholds and R15's
    seasonal-index deviations are the same robust-baseline shape.

    Scale: daily counts are |types|×|days| rows (tiny after the one
    events groupBy); both medians ride percentile() windows
    PARTITIONED by event_type — parallel across types, never a
    global sort. Counts are integers, so interpolated medians are
    exact binary halves and the 3·MAD comparison is bit-stable
    cross-engine.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wt = Window.partitionBy("event_type")
    scored = daily.withColumn(
        "med", F.expr("percentile(n_events, 0.5)").over(wt)
    ).withColumn("dev", F.abs(F.col("n_events") - F.col("med")))
    scored = scored.withColumn(
        "mad", F.expr("percentile(dev, 0.5)").over(wt)
    )
    return (
        scored.filter(F.col("dev") > 3 * F.col("mad"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round("med", 1).alias("type_median"),
            F.round("mad", 1).alias("type_mad"),
        )
        .orderBy("event_type", "day")
    )


@query("q64_sequence_bigrams")
def q64_sequence_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL PATTERN MINING (support counting for length-2
    patterns): within 30-minute sessions, count consecutive
    event-type transitions (bigrams) corpus-wide and rank the top
    20 — the first ladder rung of PrefixSpan-style mining, and the
    data that seeds next-event prediction.

    Reference parity: R2's binge sequences and R17's state
    transitions both reduce to ordered within-session bigrams.

    Scale: sessionization and the LAG ride ONE user-keyed window
    shuffle (same plan family as q03); bigram support is a tiny
    groupBy; the global top-20 sorts |distinct bigrams| ≈ |types|²
    rows.
    """
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_ts", F.lag("ts").over(wu))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev_ts").cast("long")
                    > 1800
                )
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(wu))
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    grams = (
        sess.withColumn("prev_type", F.lag("event_type").over(ws))
        .filter(F.col("prev_type").isNotNull())
        .select(
            F.concat_ws(">", "prev_type", "event_type").alias("bigram")
        )
    )
    counted = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("support"))
    wr = Window.orderBy(F.desc("support"), "bigram")
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 20)
        .select("rnk", "bigram", "support")
        .orderBy("rnk")
    )


@query("d18_ngram_novelty")
def d18_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM NOVELTY scoring — per document, the fraction of its
    word 5-gram shingles never seen in any EARLIER document (by
    doc_id order): the standard curation signal for prioritizing
    novel content and down-weighting recombined boilerplate, and the
    streaming-ingest complement to d02/d09's overlap measures.

    Scale: 'first doc to contain shingle s' is ONE groupBy-min over
    the exploded distinct shingles — no pairwise comparison, no
    ordering dependency beyond min(doc_id); the re-join to per-doc
    shingles is shingle-keyed. Short docs (<5 tokens) surface with
    n_shingles = 0 via the left join from the full doc list.

    The token array is PROJECTED before the 5-gram lambda reads it:
    codegen subexpression elimination does not reach inside
    higher-order-function arguments (the t02 lesson), so an inline
    split() here is re-evaluated by every element_at — 5 per gram ×
    ~|tokens| grams ≈ 230 regex splits per document per side, which
    turned this linear screen into 35s at sf0.1; with the projection
    it is one split per document.
    """
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    docs = table(spark, sf_dir, "documents")
    # spread before the (deliberately unmaterialized, twice-run)
    # shingling transform — r11, see operators/spread
    tokd = spread_small_scan(docs.select("doc_id", "text")).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
                F.element_at(toks, i + 4),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Shingles ride as md5 KEYS: fixed 32-byte join/shuffle keys
    # instead of ~40-byte-plus raw 5-gram strings, applied inside the
    # transform so array_distinct dedups hashes directly. The frame is
    # deliberately NOT materialized — the shingling transform is cheap
    # codegen and re-running it twice (first-seer aggregate + join
    # probe) costs far less than checkpointing the exploded corpus
    # (measured 18s vs 2s at sf0.1 — the explode is the one frame in
    # this family too big to be worth writing).
    pairs = tokd.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(grams, lambda g: F.md5(g)))
        ).alias("g"),
    )
    first = pairs.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        pairs.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("bigint")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.expr(
                "CASE WHEN coalesce(n_shingles, 0) > 0 THEN "
                "1000000 * coalesce(n_novel, 0) DIV n_shingles "
                "ELSE 1000000 END AS novelty_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@query("t19_readability")
def t19_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READABILITY scoring (Flesch reading-ease with a vowel-group
    syllable proxy) — the classic text-quality gate feature:
    word/sentence/syllable counts and the 206.835 − 1.015·(W/S) −
    84.6·(Sy/W) score, banded for filtering.

    Scale: one codegen scan — tokenization, sentence split, and the
    vowel-group regexp are all JVM expressions; the rollup is a tiny
    per-band groupBy. Same plan family as t01/t12.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
    )
    sents = F.filter(
        F.split(F.col("text"), r"[.!?]+"),
        lambda s: F.trim(s) != "",
    )
    scored = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(sents).alias("n_sents"),
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("n_syll"),
    ).filter((F.col("n_words") > 0) & (F.col("n_sents") > 0))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words") / F.col("n_sents"))
        - F.lit(84.6) * (F.col("n_syll") / F.col("n_words"))
    )
    banded = scored.withColumn("flesch", F.round(flesch, 2)).withColumn(
        "band",
        F.when(F.col("flesch") >= 60, "easy")
        .when(F.col("flesch") >= 30, "medium")
        .otherwise("hard"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
            F.round(F.min("flesch"), 2).alias("min_flesch"),
            F.round(F.max("flesch"), 2).alias("max_flesch"),
        )
        .orderBy("band")
    )


@query("t20_zipf_slope")
def t20_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW fit per source — the log-log slope of term frequency
    vs rank over each source's top-100 terms. Natural corpora slope
    ≈ −1; strong deviation flags templated/generated text, a
    corpus-level quality signal no per-doc metric sees.

    Scale: term counts are one (source, term) groupBy; ranking is
    per-source (partitioned window, never global); the regression
    folds over an at-most-100-element SORTED array per source, so
    the float sums are order-deterministic (a plain covar/var
    aggregate would be partial-agg order-dependent and break
    bit-parity) — same sorted-fold trick at any corpus size since
    the array is rank-bounded.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
    )
    terms = docs.select("source", F.explode(toks).alias("term"))
    counts = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wr = Window.partitionBy("source").orderBy(F.desc("cnt"), "term")
    top = counts.withColumn("rnk", F.row_number().over(wr)).filter(
        F.col("rnk") <= 100
    )
    per_src = top.groupBy("source").agg(
        F.sort_array(
            F.collect_list(F.struct("rnk", "cnt"))
        ).alias("pts")
    )
    xs = F.transform(F.col("pts"), lambda p: F.log(p["rnk"].cast("double")))
    ys = F.transform(F.col("pts"), lambda p: F.log(p["cnt"].cast("double")))
    def fsum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    out = per_src.select(
        "source",
        F.size("pts").alias("n_terms"),
        fsum(xs).alias("sx"),
        fsum(ys).alias("sy"),
        fsum(F.zip_with(xs, ys, lambda a, b: a * b)).alias("sxy"),
        fsum(F.transform(xs, lambda a: a * a)).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        out.select(
            "source",
            "n_terms",
            F.round(slope, 4).alias("zipf_slope"),
        )
        .orderBy("source")
    )


@query("p15_pps_sample")
def p15_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sampling (probability proportional to size) —
    per source, walk the doc_id-ordered cumulative-weight line
    (weight = n_chars) and take every stride-th point, so selection
    probability is exactly proportional to document size and a
    20-doc sample lands per source deterministically. The classic
    survey-sampling / data-mixture primitive: heavy docs can draw
    multiple hits (their token mass is over-represented on the
    line), zero-weight docs never selected.

    Scale: the per-source cumulative weight rides
    quantiles.grouped_prefix_stats (range-bucketed prefix sums — a
    handful of giant sources never serialize through one window task
    each, the same reason p06 uses it) + pure integer arithmetic —
    engine-exact, no RNG. The +stride·10⁶ shift keeps every DIV
    numerator positive (Spark DIV truncates toward zero, DuckDB //
    floors — they disagree only below zero).
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    base = docs.select(
        "source", "doc_id", F.col("n_chars").alias("weight")
    )
    k = 20
    totals = base.groupBy("source").agg(F.sum("weight").alias("total"))
    cum = grouped_prefix_stats(
        base,
        group_col="source",
        sum_col="weight",
        priority_cols=[],
        tiebreak_col="doc_id",
        rank_out="__rnk",
        cum_out="cum",
        descending=False,
    ).join(F.broadcast(totals), "source")
    stride = F.greatest(F.lit(1), F.expr(f"total DIV {k}"))
    # integer DIV throughout: n_hits = #{ sample points in (cum-w, cum] }
    sel = cum.withColumn("stride", stride).withColumn(
        "n_hits",
        F.expr(
            "CAST((cum - 1 - (stride DIV 2) + stride * 1000000) DIV stride "
            " - (cum - weight - 1 - (stride DIV 2) + stride * 1000000) "
            "DIV stride AS BIGINT)"
        ),
    )
    return (
        sel.filter(F.col("n_hits") > 0)
        .select("source", "doc_id", "weight", "n_hits")
        .orderBy("source", "doc_id")
    )


@query("q65_weighted_median")
def q65_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED quantiles (p25 / median / p75) per return flag:
    quantity-weighted price points — "the price at which half the
    UNITS (not half the line items) trade", the aggregate plain
    percentile() cannot express and Spark has no builtin for.

    Lower weighted median: in (price ASC, tiebreak) order, the first
    price whose inclusive cumulative weight reaches half the group's
    total; p25/p75 likewise at the quarter marks. Integer weights
    make every crossing test exact arithmetic.

    Scale: rides quantiles.grouped_weighted_quantiles — monotone
    range-bucket by price, ONE (group, bucket) weight aggregation,
    crossing-BUCKET location on that tiny aggregate, and an in-bucket
    running sum over ONLY the ≤3 crossing buckets per group
    (~3/range_partitions of the data): the full table is never
    windowed and no return flag ever serializes through one task.
    The crossing row per quantile is a pure integer filter (2·cum ≥ W
    and 2·(cum−w) < W picks exactly one row).
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_weighted_quantiles,
    )

    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("tb"),
    )
    qs = grouped_weighted_quantiles(
        base,
        group_col="grp",
        value_col="price",
        weight_col="w",
        tiebreak_col="tb",
        quantiles=[(1, 4), (1, 2), (3, 4)],
    )
    wide = qs.groupBy("grp").agg(
        F.max("total_n").alias("n_lines"),
        F.max("total_w").alias("total_units"),
        F.round(
            F.min(F.when((F.col("num") == 1) & (F.col("den") == 4), F.col("q_value"))),
            2,
        ).alias("w_p25"),
        F.round(
            F.min(F.when((F.col("num") == 1) & (F.col("den") == 2), F.col("q_value"))),
            2,
        ).alias("w_median"),
        F.round(
            F.min(F.when((F.col("num") == 3) & (F.col("den") == 4), F.col("q_value"))),
            2,
        ).alias("w_p75"),
    )
    return (
        wide.select(
            F.col("grp").alias("l_returnflag"),
            "n_lines",
            "total_units",
            "w_p25",
            "w_median",
            "w_p75",
        )
        .orderBy("l_returnflag")
    )


@query("q66_hierarchy_rollup")
def q66_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE hierarchy traversal (the WITH RECURSIVE family —
    org charts, BOM explosions, category trees): every customer's
    parent is c_custkey DIV 7 (custkey 0 is the root), and each
    node's root + depth are resolved by operators/hierarchy's
    pointer doubling — O(log depth) distributed hash-join rounds,
    Spark's scale answer to the recursive CTE it lacks (the CTE
    walks one level per step: O(depth) passes, and a 10⁹-node chain
    never fits one recursion's working set anyway). Rollup: per
    depth level, node count, account-balance mass, and key range.

    Oracle: a genuine DuckDB WITH RECURSIVE walking the same
    parent pointers — engine-exact on counts and 2dp sums.
    """
    from etl_sql_and_pyspark_developement__spark.operators.hierarchy import (
        resolve_hierarchy,
    )

    cust = table(spark, sf_dir, "customer")
    nodes = cust.select(
        F.col("c_custkey").alias("node"),
        F.expr("c_custkey DIV 7").alias("parent"),
        "c_acctbal",
    )
    resolved = resolve_hierarchy(nodes, "node", "parent")
    return (
        resolved.join(nodes.select("node", "c_acctbal"), "node")
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.min("node").alias("min_key"),
            F.max("node").alias("max_key"),
        )
        .orderBy("depth")
    )


@query("q67_rfm_segments")
def q67_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quintiles → 'R-F-M' segment cells): the classic churn/LTV
    marketing rollup sitting between R3's churn risk and R19's LTV
    deciles — three independent axes scored 1–5, concatenated, then
    rolled up per segment.

    Scale: all three quintile assignments ride
    quantiles.scalable_ntile (distributed exact NTILE — sketch cuts,
    per-bucket windows, broadcast offsets), so no axis ever funnels
    10⁹ customers through one window task; the recency anchor is the
    corpus max order date (single-row aggregate, broadcast join, no
    driver collect in the data path).
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        scalable_ntile,
    )

    orders = table(spark, sf_dir, "orders")
    # Monetary is carried as EXACT integer cents (the true per-customer
    # sum is an integer cent count, and float summation error is far
    # below half a cent) — a rounded double here would make both the
    # quintile sort key and the segment average depend on partial-agg
    # order at the last ulp.
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice") * 100)
        .cast("bigint")
        .alias("monetary_cents"),
    )
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    base = per_cust.join(F.broadcast(anchor), F.lit(True)).select(
        "o_custkey",
        F.datediff("ref_day", "last_day").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    scored = scalable_ntile(
        base, "recency_days", 5, "o_custkey", out_col="r_q", descending=False
    )
    scored = scalable_ntile(
        scored, "frequency", 5, "o_custkey", out_col="f_q", descending=True
    )
    scored = scalable_ntile(
        scored, "monetary_cents", 5, "o_custkey", out_col="m_q", descending=True
    )
    return (
        scored.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            F.concat_ws(
                "-",
                F.col("r_q").cast("string"),
                F.col("f_q").cast("string"),
                F.col("m_q").cast("string"),
            ).alias("segment"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("recency_days"), 4).alias("avg_recency"),
            F.round(F.avg("frequency"), 4).alias("avg_frequency"),
            # integer cents DIV n — float-free (a /100.0 average lands
            # on half-cent .xx5 boundaries where engine round() rules
            # disagree; the floor-average in cents is engine-exact)
            F.expr("sum(monetary_cents) DIV count(1)").alias(
                "avg_monetary_cents"
            ),
        )
        .orderBy("segment")
    )


@query("s07_rrf_fusion")
def s07_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval with Reciprocal-Rank Fusion (Cormack et al.
    2009): a vector lane (exact cosine top-20 for query vec_id 0)
    and a lexical lane (integer BM25-core tf·idf top-20 for a fixed
    3-term query) fused by RRF_60 — score(d) = Σ 1e9 DIV (60 +
    rank_lane(d)) — the standard RAG-retrieval merge that needs no
    score calibration between lanes. Integer fusion arithmetic is
    engine-exact; only lane RANKS cross engines, never floats.

    Scale: the vector lane is s01's broadcast-query scan with its
    top-20 as TakeOrderedAndProject (single query — a per-query
    window would funnel the whole scored corpus through one task);
    the lexical lane explodes tokens, keeps only query terms, and
    its top-20 is likewise TakeOrdered; the fusion join is 20×20
    rows.
    """
    TERMS = ("window", "hash", "stream")
    emb = table(spark, sf_dir, "embeddings")
    # Single-query top-20: scored scan + TakeOrderedAndProject.
    # cosine_topk's per-query window is right for BATCHES of queries,
    # but with ONE query its partitionBy(query_id) would funnel every
    # scored corpus row through a single window task at scale; the
    # orderBy().limit() form merges per-partition heads instead. The
    # scoring expression is cosine_topk's, so the oracle mirror and
    # tie behavior are unchanged.
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        _dot,
        _norm,
    )

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    scored_vec = (
        emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_vec"))
        .join(F.broadcast(q), F.lit(True))
        .filter(F.col("cand_id") != 0)
        .withColumn(
            "cosine",
            F.round(
                _dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec")), 6
            ),
        )
    )
    vec_top = scored_vec.orderBy(F.desc("cosine"), "cand_id").limit(20)
    vec_lane = vec_top.select(
        F.col("cand_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), "cand_id"))
        .alias("v_rank"),
    )

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    ).filter(F.col("term").isin(*TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        F.expr(f"(1000000 * ({n_docs} - df)) DIV (df + 1)").alias("idf6"),
    )
    lex_scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf6")).alias("lex_score"))
    )
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # heads merged) — then the rank window runs over only 20 rows.
    lex_top = lex_scored.orderBy(F.desc("lex_score"), "doc_id").limit(20)
    lex_lane = lex_top.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("lex_score"), "doc_id"))
        .alias("l_rank"),
    )

    fused = (
        vec_lane.join(lex_lane, "id", "full_outer")
        .select(
            "id",
            "v_rank",
            "l_rank",
            (
                F.coalesce(
                    F.expr("1000000000 DIV (60 + v_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000000 DIV (60 + l_rank)"), F.lit(0)
                )
            ).alias("rrf_score"),
        )
    )
    w = Window.orderBy(F.desc("rrf_score"), "id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 10)
        .select("fused_rank", "id", "v_rank", "l_rank", "rrf_score")
        .orderBy("fused_rank")
    )


@query("q68_pagerank_centrality")
def q68_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH CENTRALITY via PageRank over the s05 kNN similarity
    graph — the iterative linear-algebra workload class (random-walk
    centrality), applied where a 100 TB curation pipeline actually
    uses it: scoring how 'central' each embedding is in its
    neighborhood graph (central = redundant hub worth down-weighting,
    peripheral = novel; the D4/SemDeDup complement on the SAME graph
    p12 prunes by raw density).

    operators/hierarchy.pagerank runs 5 fixed iterations in EXACT
    integer ppm arithmetic (DIV truncation, order-independent sums),
    so the DuckDB oracle replays the whole recurrence value-for-value
    as 5 unrolled CTE stages over the mirrored kNN edges — the s03
    Lloyd-unroll discipline applied to an iterative graph algorithm.

    Scale: edges come from the bucketed kNN construction (never
    all-pairs), read from the build-once graph ARTIFACT
    (io.knn_graph_artifact — built by whichever graph consumer runs
    first, then a parquet read for q71/p12 and re-runs); each PageRank
    round is two shuffles (src-keyed join, dst-keyed sum); top-20 via
    TakeOrdered.
    """
    from etl_sql_and_pyspark_developement__spark.operators.hierarchy import (
        pagerank,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    edges = knn_graph_artifact(spark, sf_dir).select(
        F.col("query_id").alias("src"), F.col("cand_id").alias("dst")
    )
    pr = pagerank(edges, iterations=5)
    top = pr.orderBy(F.desc("rank_ppm"), "node").limit(20)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("rank_ppm"), "node"))
        .alias("rnk"),
        F.col("node").alias("vec_id"),
        "rank_ppm",
    ).orderBy("rnk")


@query("p16_length_batching")
def p16_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT-BY-LENGTH BATCHING with padding-waste accounting — the
    training-efficiency op between tokenization and the data loader:
    docs are bucketed to the next power-of-two token length, ordered
    by (length, doc_id) WITHIN the bucket (homogeneous batches), cut
    into 8-doc batches, and each batch pads to its own max length.
    The report per bucket — docs, batches, real vs padded tokens,
    waste ppm — is what decides whether bucketing is worth it vs
    p09's concat-and-chunk packing.

    The power-of-two bucket is a pure integer CASE chain (a
    2^ceil(log2 n) formula rides float log and flips at exact powers
    cross-engine). In-bucket ranks ride grouped_prefix_stats — a
    handful of giant buckets never serialize through one window task;
    batch ids are integer DIV on the exact rank; the two rollups are
    decomposable groupBys.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    docs = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), " "), lambda t: t != ""
    )
    sized = docs.select(
        "doc_id", F.size(toks).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    pows = [1 << i for i in range(13)]  # 1 .. 4096
    bucket = F.when(F.col("n_tokens") <= pows[0], pows[0])
    for pw in pows[1:]:
        bucket = bucket.when(F.col("n_tokens") <= pw, pw)
    sized = sized.withColumn("bucket", bucket.otherwise(pows[-1]))
    ranked = grouped_prefix_stats(
        sized,
        group_col="bucket",
        sum_col="n_tokens",
        priority_cols=["n_tokens"],
        tiebreak_col="doc_id",
        rank_out="rnk",
        cum_out="__cum",
        descending=False,
    )
    per_batch = (
        ranked.withColumn("batch", F.expr("(rnk - 1) DIV 8"))
        .groupBy("bucket", "batch")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("n_tokens").alias("bt"),
            F.max("n_tokens").alias("bmax"),
        )
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("bn").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("bt").alias("total_tokens"),
            F.sum(F.col("bn") * F.col("bmax")).alias("padded_tokens"),
        )
        .withColumn(
            "waste_ppm",
            F.expr(
                "1000000 * (padded_tokens - total_tokens) DIV padded_tokens"
            ),
        )
        .orderBy("bucket")
    )


@query("q69_variant_json")
def q69_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type —
    parse_json → variant_get path/type extraction with
    try_variant_get's NULL-on-type-mismatch contract. VARIANT is the
    engine's modern fast path for heterogeneous JSON at scale
    (binary-encoded, shredded access — no per-row string re-parse
    per field the way chained get_json_object pays, no rigid schema
    the way q40's from_json needs); this exercises the API family as
    a first-class surface the way q41 does higher-order lambdas.

    The nested document is deterministically derived from event
    columns, STAGED ONCE per corpus snapshot as a real stored JSON
    column (io.json_docs_artifact — outside the timed plan), so the
    measured work is scan + parse_json + variant_get, not
    format_string document construction; the DuckDB oracle replays
    extraction with its JSON operators value-for-value — including
    the failed typed get (a string field read as int → NULL on both
    engines).

    Scale: parse + both gets are one codegen pass, zero Python; the
    rollup is one low-cardinality groupBy.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        json_docs_artifact,
    )

    ev = json_docs_artifact(spark, sf_dir)
    v = F.parse_json(F.col("doc"))
    parsed = ev.select(
        F.col("event_type"),
        F.variant_get(v, "$.user.id", "bigint").alias("uid"),
        F.variant_get(v, "$.vals[1]", "bigint").alias("val1"),
        F.try_variant_get(v, "$.user.seg", "int").alias("seg_as_int"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("uid").alias("n_users"),
            F.sum("val1").alias("sum_val1"),
            F.sum(F.col("seg_as_int").isNull().cast("bigint")).alias(
                "n_failed_casts"
            ),
        )
        .orderBy("event_type")
    )


@query("q70_zorder_layout")
def q70_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) LAYOUT stats on (l_partkey, l_suppkey)
    — the multi-dimensional clustering pass behind lakehouse
    OPTIMIZE ... ZORDER BY, measured rather than asserted: each
    z-range bin models one output file, and its per-dimension cell
    bounding box is exactly what parquet footer min/max stats expose
    to a pruning scan. bbox_ppm near 1e6/n_bins on BOTH dims is the
    win a single-column sort cannot deliver (it leaves the other
    dim's span at full width).

    The reference's cost scans filter on content_type × region
    (SQL/Infrastructure Cost Optimization by Content Type.txt);
    this is the two-dimension layout those scans want — a single-key
    sort leaves the other dimension's span at full width.

    Scale: the z-value is one whole-stage-codegen integer projection
    (operators/zorder.py — DIV/%/× by power-of-two literals, no
    floats, no UDF); the min/max normalization bounds ride a
    broadcast 1-row aggregate; the only shuffle is the 64-group bin
    aggregate. The actual write path (write_zordered) adds exactly
    the one range shuffle a rewrite pays anyway. Integer arithmetic
    end-to-end: the DuckDB oracle replays the curve bit-for-bit.
    """
    from etl_sql_and_pyspark_developement__spark.operators.zorder import (
        layout_stats,
    )

    li = table(spark, sf_dir, "lineitem")
    return layout_stats(li, "l_partkey", "l_suppkey", bits=10, n_bins=64)


@query("q71_triangle_count")
def q71_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNTING + local clustering coefficients over the s05
    kNN similarity graph, via degree-ordered wedge joins (Suri &
    Vassilvitskii WWW'11) — the structural-redundancy complement to
    q68's PageRank on the same edges: a high-clustering vertex sits
    in a tight near-duplicate pocket (its neighbors also neighbor
    each other), which is exactly the neighborhood a curation pass
    down-weights, where PageRank only says it is well-connected.

    Scale: orientation by (degree, id) bounds the wedge join's
    per-key fan-out by O(√m) regardless of hubs, counts each
    triangle exactly once, and keeps every step an equi-join shuffle
    (operators/graph.py). Counts and the 2e6·tri DIV (d·(d−1))
    coefficient are pure integers — the DuckDB oracle replays the
    whole pipeline value-for-value on the mirrored kNN edges. The
    edges come from the build-once graph artifact
    (io.knn_graph_artifact), shared with q68/p12.
    """
    from etl_sql_and_pyspark_developement__spark.operators.graph import (
        triangle_stats,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    edges = knn_graph_artifact(spark, sf_dir).select(
        F.col("query_id").alias("src"), F.col("cand_id").alias("dst")
    )
    return (
        triangle_stats(edges)
        .select(
            F.col("node").alias("vec_id"),
            "degree",
            "n_triangles",
            "clustering_ppm",
        )
        .orderBy("vec_id")
    )


@query("q72_ewma_smoothing")
def q72_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL SMOOTHING (EWMA) of daily event volumes per type,
    with peak tracking and spike detection (day count > 2x the
    previous smoothed level) — the classic operational baseline
    q63's MAD thresholds complement: s_t = (3·x_t + 7·s_{t−1}) DIV 10
    in EXACT milli-unit integer arithmetic, seeded with day 1.

    A sequential recurrence usually tempts a per-group Python loop
    (the q61 anti-pattern). Here the whole multi-variable state —
    (smoothed, peak, spike count) — rides ONE builtin scalar fold by
    BIT-PACKING the three integers into a single BIGINT accumulator
    (s·2^37 + peak·2^11 + spikes; daily counts bound s and peak under
    2^26 milli-units, documented precondition): `aggregate()` over
    the sorted bounded series, pure JVM codegen, zero Python, zero
    floats — and because every step is truncating integer DIV, the
    DuckDB oracle's list_reduce replays it bit-for-bit. (DuckDB 1.0's
    list_reduce mis-folds STRUCT accumulators — per-field
    inconsistency, found while building this — which is exactly why
    the packed-scalar form is the portable one.)

    Scale: the daily rollup is one decomposable shuffle; per-key
    series are calendar-bounded (|days|, the t20/t20-sorted-fold
    discipline), so collect_list holds ≤ a few thousand elements per
    type regardless of row scale. For UNBOUNDED per-key sequences
    the scale path is per-partition associative composition of the
    affine maps (operators/fold.py's design note), not this collect.
    """
    from etl_sql_and_pyspark_developement__spark.operators.fold import (
        ewma_stats,
    )

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return ewma_stats(daily, "event_type", "day", "cnt").orderBy(
        "event_type"
    )


@query("p17_target_encoding")
def p17_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING with prior smoothing — the
    standard categorical-feature transform for tree/GBM training
    sets: replace c_mktsegment with the smoothed mean spend of the
    OTHER customers in the segment, enc = (seg_sum − own + m·μ) /
    (seg_n − 1 + m), m = 10. Leave-one-out kills the target-leakage
    a plain category mean injects; the prior pulls rare categories
    toward the global mean.

    Scale: one o_custkey groupBy builds per-entity targets; the
    segment and global statistics are TINY aggregates broadcast back
    onto the entity frame (never a per-row window over the category
    — a category is exactly the skewed-key shape a window would
    serialize on); the encode itself is one codegen expression.
    Sums ride exact integer cents (float partial-agg error absorbed
    by the half-cent round, the q67 discipline), so the quotient is
    computed from identical integers in both engines.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100)
        .cast("bigint")
        .alias("spend_cents")
    )
    # base (per-entity targets) feeds both the category statistics
    # and the final encode join — materialize it once rather than
    # re-running the orders rollup + customer join per consumer.
    base = (
        cust.select("c_custkey", "c_mktsegment")
        .join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
        )
        .localCheckpoint()
    )
    seg = base.groupBy("c_mktsegment").agg(
        F.sum("spend_cents").alias("seg_sum"),
        F.count(F.lit(1)).alias("seg_n"),
    )
    # The global prior is the segment table re-aggregated — 5 rows,
    # never a second pass over the entity frame.
    glob = seg.agg(
        F.sum("seg_sum").alias("g_sum"),
        F.sum("seg_n").alias("g_n"),
    )
    return (
        base.join(F.broadcast(seg), "c_mktsegment")
        .join(F.broadcast(glob), F.lit(True))
        .select(
            "c_custkey",
            "c_mktsegment",
            "spend_cents",
            F.round(
                (
                    (F.col("seg_sum") - F.col("spend_cents"))
                    + F.lit(10.0)
                    * (
                        F.col("g_sum").cast("double")
                        / F.col("g_n").cast("double")
                    )
                )
                / (F.col("seg_n") - 1 + 10)
                / F.lit(100.0),
                4,
            ).alias("loo_enc"),
        )
        .orderBy("c_custkey")
    )


@query("q73_drift_psi")
def q73_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION DRIFT detection via the Population Stability
    Index — the standard production-ML monitor for 'did this
    feature's distribution move between two windows': split the event
    stream at its midpoint, bin `value` into 10 equal-width bins from
    the GLOBAL bounds, and per event type compute
    PSI = Σ_bins (p₁−p₂)·ln(p₁/p₂) with Laplace-smoothed proportions
    (pᵢ = (nᵢ+1)/(tᵢ+10), so empty bins stay finite). PSI < 0.1 is
    stable, > 0.25 is actionable drift. The dominant bin (largest
    contribution, first on ties) localizes WHERE the mass moved.

    Scale: bounds and the date anchor ride one broadcast 1-row
    aggregate; binning is codegen; counts are ONE decomposable
    (type, bin) groupBy with conditional sums (never two scans for
    two windows); the 10-bin spine is exploded per type so
    both-empty bins still contribute; the PSI sum folds over the
    bin-SORTED array (t20 discipline — float addition order pinned,
    so the oracle replays it bit-for-bit; a plain SUM over 10 doubles
    would be partial-agg-order dependent).
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    binned = ev.join(F.broadcast(bounds), F.lit(True)).select(
        "event_type",
        F.when(
            F.datediff(F.to_date("ts"), F.col("d0"))
            * 2
            < F.datediff("d1", "d0") + 1,
            F.lit(1),
        )
        .otherwise(F.lit(2))
        .alias("win"),
        # Degenerate bounds (every value identical) put all mass in
        # bin 0 instead of dividing by zero.
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(9),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * 10.0
                    / (F.col("vmax") - F.col("vmin"))
                ).cast("int"),
            )
        )
        .alias("bin"),
    )
    # counts is tiny (|types| x 10) and feeds BOTH the spine and the
    # join probe — materialize it so the full binning scan runs once.
    counts = (
        binned.groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("win") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("win") == 2, 1).otherwise(0)).alias("n2"),
        )
        .localCheckpoint()
    )
    spine = (
        counts.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
        )
    )
    full = spine.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("n1", F.lit(0)).alias("n1"),
        F.coalesce("n2", F.lit(0)).alias("n2"),
    )
    per_type = full.groupBy("event_type").agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.sort_array(F.collect_list(F.struct("bin", "n1", "n2"))).alias(
            "arr"
        ),
    )
    contrib = (
        "transform(arr, e ->"
        " ((CAST(e.n1 + 1 AS DOUBLE) / (t1 + 10))"
        "  - (CAST(e.n2 + 1 AS DOUBLE) / (t2 + 10)))"
        " * ln((CAST(e.n1 + 1 AS DOUBLE) / (t1 + 10))"
        "      / (CAST(e.n2 + 1 AS DOUBLE) / (t2 + 10))))"
    )
    return (
        per_type.withColumn("ct", F.expr(contrib))
        .select(
            "event_type",
            "t1",
            "t2",
            F.round(
                F.expr("aggregate(ct, 0.0d, (a, x) -> a + x)"), 6
            ).alias("psi"),
            F.expr("CAST(array_position(ct, array_max(ct)) AS INT)")
            .alias("top_bin_1idx"),
        )
        .orderBy("event_type")
    )


@query("q74_wilson_ci")
def q74_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON 95% confidence intervals on per-arm USER-level
    conversion — the uncertainty layer q13's point estimates lack
    (is the lift real, or is the CI overlap telling you to keep the
    test running?). Wilson beats the naive Wald interval near 0/1
    and at small n, which is exactly where conversion rates live:
        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    Scale: one conditional countDistinct pair per arm (user-level,
    not event-level — repeat purchasers counted once); the interval
    arithmetic is a fixed float expression over EXACT integer counts,
    and sqrt is IEEE-correctly-rounded in both engines, so the oracle
    matches bit-for-bit with no fold machinery needed.
    """
    ev = table(spark, sf_dir, "events")
    armed = ev.withColumn("arm", (F.col("user_id") % 2).cast("int"))
    counts = armed.groupBy("arm").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("conv_users"),
    )
    z2 = "3.8416e0"  # 1.96^2
    p = "(CAST(conv_users AS DOUBLE) / n_users)"
    denom = f"(1.0e0 + {z2} / n_users)"
    center = f"(({p} + {z2} / (2.0e0 * n_users)) / {denom})"
    half = (
        f"(1.96e0 * sqrt({p} * (1.0e0 - {p}) / n_users"
        f" + {z2} / (4.0e0 * n_users * n_users)) / {denom})"
    )
    return counts.select(
        "arm",
        "n_users",
        "conv_users",
        F.expr(f"round({p}, 6)").alias("conv_rate"),
        F.expr(f"round({center} - {half}, 6)").alias("wilson_lo"),
        F.expr(f"round({center} + {half}, 6)").alias("wilson_hi"),
    ).orderBy("arm")


@query("q75_chi_square")
def q75_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE test of independence on the arm × event-type
    contingency table — "did the experiment change the MIX of
    behavior", the categorical complement to q13's means and q74's
    conversion intervals: observed vs expected (row·col/total) cell
    counts, per-cell contributions (o−e)²/e, and the table-wide χ²
    with its degrees of freedom on every row.

    Scale: ONE decomposable (arm, type) groupBy over the fact scan;
    marginals and expecteds are computed inside a single collected
    cell array (|arms|·|types| ≈ 10 elements), where the χ² sum
    folds over the SORTED cells (t20 discipline — float addition
    order pinned, so the oracle replays it bit-for-bit; a plain SUM
    or an unpartitioned window over the cells would be
    partial-agg-order dependent).
    """
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.withColumn("arm", (F.col("user_id") % 2).cast("int"))
        .groupBy("arm", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    observed = cells.groupBy().agg(
        F.expr(
            "sort_array(collect_list(struct(arm, event_type, o)))"
        ).alias("obs")
    )
    # Complete the table to the FULL arm × type cross product with
    # o = 0 for absent combinations — a chi-square over only the
    # observed cells silently drops each missing cell's (0−e)²/e
    # term and understates the statistic on sparse tables.
    complete = (
        "flatten(transform("
        " array_sort(array_distinct(transform(obs, c -> c.arm))),"
        " a -> transform("
        "   array_sort(array_distinct(transform(obs, c -> c.event_type))),"
        "   t -> named_struct('arm', a, 'event_type', t,"
        "     'o', aggregate("
        "       filter(obs, x -> x.arm = a AND x.event_type = t),"
        "       CAST(0 AS BIGINT), (acc, x) -> acc + x.o)))))"
    )
    packed = observed.select(F.expr(complete).alias("cs"))
    # All marginal arithmetic rides the tiny array: exact integer
    # marginals via filter+aggregate, expecteds as one fixed float
    # expression per cell.
    ex = (
        "transform(cs, c -> named_struct("
        " 'arm', c.arm, 'event_type', c.event_type, 'o', c.o,"
        " 'e', CAST(aggregate(filter(cs, x -> x.arm = c.arm),"
        "           CAST(0 AS BIGINT), (a, x) -> a + x.o) AS DOUBLE)"
        "      * CAST(aggregate(filter(cs, x -> x.event_type = c.event_type),"
        "           CAST(0 AS BIGINT), (a, x) -> a + x.o) AS DOUBLE)"
        "      / CAST(aggregate(cs, CAST(0 AS BIGINT),"
        "           (a, x) -> a + x.o) AS DOUBLE)))"
    )
    contrib = (
        "transform(ec, c -> named_struct("
        " 'arm', c.arm, 'event_type', c.event_type, 'o', c.o, 'e', c.e,"
        " 'contrib', (c.o - c.e) * (c.o - c.e) / c.e))"
    )
    dof = (
        "(CAST(size(array_distinct(transform(cs, c -> c.arm))) AS INT) - 1)"
        " * (CAST(size(array_distinct(transform(cs, c -> c.event_type)))"
        "    AS INT) - 1)"
    )
    return (
        packed.withColumn("ec", F.expr(ex))
        .withColumn("cc", F.expr(contrib))
        .withColumn(
            "chi2",
            F.expr("round(aggregate(cc, 0.0d, (a, x) -> a + x.contrib), 6)"),
        )
        .withColumn("dof", F.expr(dof))
        .select(F.explode("cc").alias("c"), "chi2", "dof")
        .select(
            F.col("c.arm").alias("arm"),
            F.col("c.event_type").alias("event_type"),
            F.col("c.o").alias("observed"),
            F.expr("round(c.e, 4)").alias("expected"),
            F.expr("round(c.contrib, 6)").alias("contrib"),
            "chi2",
            "dof",
        )
        .orderBy("arm", "event_type")
    )


@query("q76_sql_recursive")
def q76_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, RECURSIVE CTE workload: Spark 4.x lands
    native WITH RECURSIVE, so the q66 hierarchy rollup gets its SQL
    twin (like q47/q48/q49 are for rollup/window/sessionize) — the
    same parent-pointer walk (parent = c_custkey DIV 7) expressed as
    a level-at-a-time recursion through spark.sql over registered
    views, verified against the identical DuckDB recursive CTE.

    Crossover vs q66's pointer doubling, MEASURED (local[32]):
    the CTE materializes one LEVEL per step — O(depth) frontier
    joins — while resolve_hierarchy runs O(log depth) whole-set
    self-join rounds. On this DIV-7 tree pointer doubling wins at
    both probed sizes (150k nodes: 4.9s vs 8.5s; 1.5M: 8.2s vs
    10.0s): each CTE level pays a full job round-trip, so log₇ n
    levels cost more wall than log₂ d doubling rounds despite
    touching fewer rows. The native CTE's edge is memory shape
    (frontier-sized intermediates, no whole-set rewrite per round)
    — relevant when n·log d materializations dominate — but it
    carries TWO hard ceilings pointer doubling does not: the
    100-level recursion cap AND a default 1,000,000-row recursion
    row limit (RECURSION_ROW_LIMIT_EXCEEDED at 1.5M nodes with
    stock configs — the 1M+1-th walk row aborts the query). The
    operator of record for hierarchies stays resolve_hierarchy;
    this query is the SQL-surface twin + capability probe.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS node,
                   c_custkey AS root,
                   CAST(0 AS BIGINT) AS depth
            FROM customer
            WHERE c_custkey DIV 7 = c_custkey
            UNION ALL
            SELECT c.c_custkey, w.root, w.depth + 1
            FROM customer c JOIN walk w ON c.c_custkey DIV 7 = w.node
            WHERE c.c_custkey DIV 7 <> c.c_custkey
        )
        SELECT w.depth,
               count(*) AS n_nodes,
               round(sum(c.c_acctbal), 2) AS total_acctbal,
               min(w.node) AS min_key,
               max(w.node) AS max_key
        FROM walk w JOIN customer c ON c.c_custkey = w.node
        GROUP BY w.depth
        ORDER BY w.depth
        """
    )


@query("q77_mann_whitney")
def q77_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U rank-sum test on per-event values across A/B
    arms — the NONPARAMETRIC leg of the A/B suite (q13 means, q74
    conversion CIs, q75 behavior mix): engagement values are heavy-
    tailed, exactly where the t-test's normality assumption breaks
    and the rank test keeps its level. Emits U, the tie-corrected
    normal-approximation z, and the exact integer ingredients.

    Ranks are NEVER materialized per row: average rank of a tied
    value v is (count < v) + (count = v + 1)/2, so the whole test
    decomposes to (1) one decomposable groupBy(value) for per-value
    counts and per-arm counts, (2) a prefix sum over the DISTINCT-
    value frame in value order — quantiles.grouped_prefix_stats, so
    a near-continuous metric (distinct ≈ n) still never funnels
    through one window task — and (3) one scalar aggregate. Doubling
    every rank (2·avg_rank = 2·cum − cnt + 1 is always integer)
    keeps rank sums and U in EXACT BIGINT; the tie term Σ(t³−t)
    rides DECIMAL(38) (a 3e6-deep tie overflows BIGINT cubes); z is
    one fixed float expression over exact integers, identical text
    on both engines — bit-exact.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    ev = table(spark, sf_dir, "events")
    per_val = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
        )
    )
    ranked = grouped_prefix_stats(
        per_val.withColumn("__g", F.lit(1)),
        group_col="__g",
        sum_col="cnt",
        priority_cols=["value"],
        tiebreak_col="value",
        rank_out="__rnk",
        cum_out="cum",
        descending=False,
    )
    stats = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(
            F.col("na") * (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1))
        ).alias("rank_sum_a_x2"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("__tie"),
    )
    return stats.select(
        "n_a",
        "n_b",
        "rank_sum_a_x2",
        F.expr("rank_sum_a_x2 - n_a * (n_a + 1)").alias("u_a_x2"),
        F.col("__tie").cast("bigint").alias("tie_term"),
        F.expr(
            "round((CAST(rank_sum_a_x2 - n_a * (n_a + 1) AS DOUBLE)"
            " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
            " / (2.0 * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)"
            " * (CAST(n_a + n_b + 1 AS DOUBLE)"
            "    - CAST(__tie AS DOUBLE)"
            "      / (CAST(n_a + n_b AS DOUBLE)"
            "         * CAST(n_a + n_b - 1 AS DOUBLE))))), 6)"
        ).alias("z_score"),
    )


@query("q78_kcore")
def q78_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition (k=3) of the cosine-thresholded s05 kNN
    similarity graph — the third graph-cohesion lens on the SAME
    shared edge artifact: q68 scores connectivity (PageRank), q71
    scores closed wedges (clustering), the k-core finds the subgraph
    that stays mutually dense after iterative peeling — on an
    embedding graph, the redundancy backbone a curation pass
    down-samples first. The similarity floor (cosine ≥ 0.15) matters:
    a raw top-k graph is degree-regular BY CONSTRUCTION (everyone has
    k out-edges), so its k-core is all-or-nothing; thresholding
    restores genuine degree variance and the peel becomes selective
    (measured at the true fixpoint: 945/1386 edges survive at
    sf0.001, 806 at sf0.01, converging in ≤ 7 peel rounds — the
    8-round probe that looked non-trivial for k=4 was NOT converged;
    k=4 peels to empty at those scales).

    operators/graph.kcore peels to a FIXPOINT (degree < k vertices
    removed, cascading) in bounded rounds and raises rather than
    return a partial core; because peeling is monotone, the DuckDB
    oracle unrolls the same peel as 8 fixed CTE stages (idempotent
    once converged) and matches the converged core value-for-value.

    Scale: every round is one union-groupBy degree count + two
    semi-join filters on the edge set — no all-pairs step anywhere,
    lineage truncated per round (dedup_components discipline).
    """
    from etl_sql_and_pyspark_developement__spark.operators.graph import kcore
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    edges = (
        knn_graph_artifact(spark, sf_dir)
        .filter(F.col("cosine") >= 0.15)
        .select(F.col("query_id").alias("src"), F.col("cand_id").alias("dst"))
    )
    return (
        kcore(edges, k=3, max_rounds=16)
        .select(F.col("node").alias("vec_id"), "core_degree")
        .orderBy("vec_id")
    )


@query("q79_gini_concentration")
def q79_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer-revenue concentration per market
    segment (the Lorenz-curve statistic behind 'top 1% of customers
    carry X% of revenue') — the inequality summary q60's Pareto/ABC
    classes threshold: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    revenues sorted ascending.

    Revenue rides as EXACT integer cents (q67 discipline) and the
    ascending rank i comes from quantiles.grouped_prefix_stats — a
    segment holding most of the corpus never serializes through one
    window task. Σ i·xᵢ accumulates in DECIMAL(38) (rank × cents
    products overflow BIGINT at 10⁹ customers; the oracle mirrors
    with HUGEINT); within a revenue tie the rank assignment is
    custkey-arbitrary but Σ i·xᵢ over a tie block is invariant, so
    the statistic is deterministic. Final G is one fixed float
    expression over exact integers — bit-exact.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)"
            ).alias("cents")
        )
        .join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    ranked = grouped_prefix_stats(
        per_cust,
        group_col="c_mktsegment",
        sum_col="cents",
        priority_cols=["cents"],
        tiebreak_col="o_custkey",
        rank_out="i",
        cum_out="__cum",
        descending=False,
    )
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("__s1"),
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "total_cents",
        F.expr(
            "round((2.0 * CAST(__s1 AS DOUBLE)"
            " - (CAST(n_customers AS DOUBLE) + 1.0)"
            "   * CAST(total_cents AS DOUBLE))"
            " / (CAST(n_customers AS DOUBLE)"
            "    * CAST(total_cents AS DOUBLE)), 6)"
        ).alias("gini"),
    ).orderBy("c_mktsegment")


@query("s08_ann_recall_eval")
def s08_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN RECALL EVALUATION — recall@5 of the LSH kNN graph (the s05
    artifact every graph consumer rides) against EXACT brute-force
    top-5 on a deterministic 5% query sample: the measurement that
    must exist before an approximate index is trusted at 100 TB (t18
    is this for the language-ID gate). Emits the overlap histogram
    (how many queries found 0..5 of their true neighbors) plus the
    corpus recall in integer ppm.

    Scale: exact scoring is confined to the SAMPLE (broadcast of
    sampled queries against the corpus — the s01 shape, linear in
    corpus size, never all-pairs); the approximate side is a parquet
    read of the shared artifact. Overlap via one left-semi join on
    (query, cand); histogram + one broadcast 1-row total. All-integer
    outputs — the oracle mirrors both graphs and the DIV arithmetic.
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        cosine_topk,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    emb = table(spark, sf_dir, "embeddings")
    # FIXED-SIZE sample (≤ 500 queries): a fixed FRACTION makes the
    # exact ground-truth side quadratic again (0.05·n² — measured:
    # did not finish at 20k vectors); a fixed count keeps it linear
    # in the corpus at any scale, which is how recall eval is run in
    # production (a few hundred queries suffice for a recall CI).
    sample = emb.filter(
        (F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 10000)
    )
    exact = cosine_topk(emb, sample, k=5).select("query_id", "cand_id")
    approx = (
        knn_graph_artifact(spark, sf_dir)
        .filter((F.col("query_id") % 20 == 0) & (F.col("query_id") < 10000))
        .select("query_id", "cand_id")
    )
    hits = (
        approx.join(exact, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_query = (
        sample.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"))
    )
    hist = per_query.groupBy("n_hits").agg(
        F.count(F.lit(1)).alias("n_queries")
    )
    total = per_query.agg(
        F.expr(
            "CAST(1000000 * sum(n_hits) DIV (5 * count(*)) AS BIGINT)"
        ).alias("recall_ppm")
    )
    return (
        hist.join(F.broadcast(total))
        .select("n_hits", "n_queries", "recall_ppm")
        .orderBy("n_hits")
    )


@query("q80_cusum_changepoint")
def q80_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volumes per type —
    the sequential drift alarm beside q63's pointwise MAD outliers and
    q73's windowed PSI: S_t = max(0, S_{t-1} + (x_t − μ − slack))
    accumulates persistent upward shift and alarms when S_t crosses
    4μ, catching slow drifts no single-day threshold sees.

    The clamped fold is ANOTHER sequential recurrence that tempts a
    per-group Python loop — and like q61's least() form it has a
    closed-form window rewrite: with y_t the centered increments and
    P_t their prefix sum, max(0, S_{t-1} + y_t) unrolls to
    S_t = P_t − min(0, min_{j≤t} P_j) — two window aggregates over
    the same per-type day ordering, pure codegen, zero Python. All
    arithmetic in exact milli-unit integers (μ and slack are DIV
    truncations), so the oracle replays it bit-for-bit.

    Scale: the windows run on the per-(type, day) rollup — |types|×
    |days| rows, partitioned by type (q17/q63 discipline) — never on
    raw events.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mu = daily.groupBy("event_type").agg(
        F.expr("(1000 * sum(cnt)) DIV count(*)").alias("mu_milli")
    )
    y = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        "cnt",
        "mu_milli",
        F.expr("1000 * cnt - mu_milli - mu_milli DIV 10").alias("y_milli"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        y.withColumn("__p", F.sum("y_milli").over(wcum))
        .withColumn(
            "cusum_milli",
            F.col("__p") - F.least(F.lit(0), F.min("__p").over(wcum)),
        )
        .select(
            "event_type",
            "day",
            "cnt",
            "cusum_milli",
            (F.col("cusum_milli") > 4 * F.col("mu_milli"))
            .cast("int")
            .alias("alarm"),
        )
    )
    return out.orderBy("event_type", "day")


@query("d19_containment_dedup")
def d19_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-CONTAINMENT dedup (quote/snippet/excerpt
    detection): pairs where the smaller doc's shingle set is ≥ 80%
    inside the larger's — the duplication class symmetric Jaccard
    (d02/d03) systematically misses because a small⊂large pair has
    near-zero Jaccard. Keep-the-superset is the curation action.
    See operators/dedup.containment_pairs for the scale contract.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        containment_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "doc_id", "text", n=3, max_shingle_df=100
    ).orderBy(F.desc("containment_ppm"), "doc_small", "doc_big")


@query("t21_keyness_loglik")
def t21_keyness_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYWORD EXTRACTION by log-likelihood KEYNESS (Dunning's G²,
    1993): for each source, the words most over-represented against
    the REST of the corpus — the 'what is this slice about'
    diagnostic that drives corpus-mix decisions (p05) and mixture
    audits (p13): G² = 2·(o₁·ln(o₁/e₁) + o₂·ln(o₂/e₂)) over the
    word's 2×2 source-vs-rest contingency, top-5 per source. TF-IDF
    (t05) asks 'what characterizes this DOCUMENT'; keyness asks what
    characterizes the SLICE, with a significance-calibrated score.

    Scale: ONE token explode feeds a (source, word) decomposable
    groupBy; word totals and source totals re-aggregate FROM that
    frame (never a second corpus scan); the G² expression is fixed
    float arithmetic over exact integer counts with identical text
    on both engines (q74 discipline — ln is IEEE-correctly-rounded,
    no fold ordering anywhere), and the top-5 window partitions by
    source over vocab-sized input (t07 discipline).
    """
    docs = table(spark, sf_dir, "documents")
    sw = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("o1"))
        .localCheckpoint()
    )
    word_tot = sw.groupBy("word").agg(F.sum("o1").alias("wt"))
    src_tot = sw.groupBy("source").agg(F.sum("o1").alias("st"))
    gtot = src_tot.agg(F.sum("st").alias("gt"))
    scored = (
        sw.join(word_tot, "word")
        .join(F.broadcast(src_tot), "source")
        .join(F.broadcast(gtot))
        .withColumn(
            "g2",
            F.expr(
                "round(2.0 * ("
                " CAST(o1 AS DOUBLE) * ln(CAST(o1 AS DOUBLE)"
                "   / (CAST(st AS DOUBLE) * CAST(wt AS DOUBLE)"
                "      / CAST(gt AS DOUBLE)))"
                " + CASE WHEN wt = o1 THEN 0.0 ELSE"
                "   CAST(wt - o1 AS DOUBLE) * ln(CAST(wt - o1 AS DOUBLE)"
                "     / (CAST(gt - st AS DOUBLE) * CAST(wt AS DOUBLE)"
                "        / CAST(gt AS DOUBLE))) END), 4)"
            ),
        )
        # keyness proper: only OVER-represented words (o1 > e1)
        .filter(
            F.expr(
                "CAST(o1 AS DOUBLE) * CAST(gt AS DOUBLE)"
                " > CAST(st AS DOUBLE) * CAST(wt AS DOUBLE)"
            )
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("g2"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "rnk", "word", "o1", "wt", "g2")
        .orderBy("source", "rnk")
    )


@query("m07_audio_vad")
def m07_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOICE-ACTIVITY-style SEGMENTATION over the m04 window energies
    — the segmentation stage between framing and transcription in an
    audio pipeline: windows whose energy exceeds the doc's mean
    (integer cross-multiply, no float threshold) are 'active', and
    ADJACENT active windows merge into segments via the run-length
    identity (win_idx − row_number() is constant within a
    consecutive run — the q03 sessionize family, no iterative
    merging). Emits per-segment bounds and energy mass.

    Deliberately a COMPOSITION of existing ops (the preferred tier
    for new operators): m04's mapInPandas kernel supplies exact
    integer window energies (byte-replay oracle-able), everything
    after is pure DataFrame codegen — one per-doc broadcast-sized
    rollup and one doc-partitioned window. Real VAD swaps the energy
    rule for a model score; the segmentation plumbing is identical.
    """
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        window_features,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    wins = window_features(with_binary_payload(docs)).select(
        "doc_id", "win_idx", "energy"
    )
    tot = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__nw"), F.sum("energy").alias("__te")
    )
    active = wins.join(tot, "doc_id").filter(
        F.col("energy") * F.col("__nw") > F.col("__te")
    )
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    runs = active.withColumn(
        "__grp", F.col("win_idx") - F.row_number().over(w)
    )
    segs = runs.groupBy("doc_id", "__grp").agg(
        F.min("win_idx").alias("start_win"),
        F.max("win_idx").alias("end_win"),
        F.count(F.lit(1)).alias("n_active_wins"),
        F.sum("energy").alias("seg_energy"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_win")
    return (
        segs.withColumn("seg_idx", F.row_number().over(w2))
        .select(
            "doc_id", "seg_idx", "start_win", "end_win",
            "n_active_wins", "seg_energy",
        )
        .orderBy("doc_id", "seg_idx")
    )


# Poisson(1) inverse-CDF thresholds over 24-bit md5 buckets — the
# deterministic bootstrap weights (round(cdf(k) * 2^24), k = 0..6;
# the tail past k=7 is < 1e-7 and clamps to 7). Shared literal with
# the DuckDB oracle.
_POIS1_CDF24 = (6171993, 12343986, 15429982, 16458648, 16715814,
                16767247, 16775819)


@query("q81_bootstrap_ci")
def q81_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOTSTRAP 95% confidence intervals on per-arm mean user spend
    via the POISSON BOOTSTRAP (Chamandy et al. 2012 — the resampling
    scheme built for map-reduce: instead of drawing n users with
    replacement per replica, which needs global coordination, each
    user independently gets a Poisson(1) weight per replica; replica
    sums are then one decomposable groupBy). Completes the A/B
    inference suite: q13 point estimates, q74 parametric CIs, q75
    mix test, q77 rank test — this is the distribution-free CI for
    a statistic with no closed form.

    Fully DETERMINISTIC: the replica-b weight of user u is the
    Poisson(1) inverse CDF of the 24-bit md5(b:u) bucket (thresholds
    inlined as shared literals), spend rides as exact integer cents,
    and each replica's mean is one integer division — so the 200
    replica means, their order, and the rank-5/rank-196 CI ends are
    engine-exact, no RNG anywhere (the p02/p07 md5 discipline
    applied to resampling).

    Scale: per-user aggregate first (decomposable), THEN the ×200
    replica explode on the small (user, cents) frame — 200n rows of
    three ints through one decomposable (arm, b) groupBy; the CI
    rank runs on the 2×200 replica frame. Never 200× the raw events.
    """
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.expr("CAST(round(sum(value) * 100, 0) AS BIGINT)").alias(
                "cents"
            )
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    thresholds = " ".join(
        f"WHEN __u < {t} THEN {k}" for k, t in enumerate(_POIS1_CDF24)
    )
    reps = (
        per_user.select(
            "arm", "user_id", "cents",
            F.explode(F.expr("sequence(0, 199)")).alias("b"),
        )
        .withColumn(
            "__u",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(b AS STRING), ':',"
                " CAST(user_id AS STRING))), 1, 6), 16, 10) AS BIGINT)"
            ),
        )
        .withColumn("w", F.expr(f"CASE {thresholds} ELSE 7 END"))
    )
    means = (
        reps.groupBy("arm", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("__ws"),
            F.sum("w").alias("__wn"),
        )
        .filter(F.col("__wn") > 0)
        .select(
            "arm", "b",
            F.expr("(1000 * __ws) DIV __wn").alias("mean_milli"),
        )
    )
    w = Window.partitionBy("arm").orderBy("mean_milli", "b")
    ci = (
        means.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").isin(5, 196))
        .groupBy("arm")
        .agg(
            F.min("mean_milli").alias("ci_lo_milli"),
            F.max("mean_milli").alias("ci_hi_milli"),
        )
    )
    point = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("(1000 * sum(cents)) DIV count(*)").alias("mean_milli"),
    )
    return (
        point.join(ci, "arm")
        .select("arm", "n_users", "mean_milli", "ci_lo_milli", "ci_hi_milli")
        .orderBy("arm")
    )


@query("q82_seasonal_decompose")
def q82_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL SEASONAL DECOMPOSITION of daily event volume per
    type — trend / seasonal / residual, the additive decompose
    behind every ops dashboard (q10 reports the seasonal MEANS; this
    separates the components so q63/q80's anomaly rules can run on
    the RESIDUAL instead of raw counts, where weekday rhythm stops
    masquerading as drift):

      trend_t    = centered 7-day moving average (milli, DIV)
      detrended  = 1000·x_t − trend_t   (edge days: no trend → NULL)
      seasonal_d = per-(type, day-of-week) mean of detrended (DIV)
      residual   = detrended − seasonal_d

    Exact integer milli-units end-to-end (the q72/q80 discipline):
    every division is a DIV truncation, so both engines replay the
    decomposition bit-for-bit — no float smoothing anywhere.

    Scale: all three passes run on the |types|×|days| daily rollup
    (q17 discipline) — two windows partitioned by type + one
    (type, dow) groupBy, never raw events.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.withColumn(
        "trend_milli",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.expr("1000 * sum(cnt) OVER ("
                   "PARTITION BY event_type ORDER BY day "
                   "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) DIV 7"),
        ),
    ).withColumn(
        "detrended_milli", F.expr("1000 * cnt - trend_milli")
    ).withColumn(
        "dow", F.dayofweek(F.to_date("day"))
    )
    seas = (
        trended.filter(F.col("detrended_milli").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            F.expr("sum(detrended_milli) DIV count(*)").alias(
                "seasonal_milli"
            )
        )
    )
    return (
        trended.join(F.broadcast(seas), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "day",
            "cnt",
            "trend_milli",
            "seasonal_milli",
            F.expr("detrended_milli - seasonal_milli").alias(
                "residual_milli"
            ),
        )
        .orderBy("event_type", "day")
    )


@query("q83_time_to_convert")
def q83_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution per market segment: exact p50/p90
    of the view→purchase delay — the latency-percentile rollup a
    funnel dashboard puts beside q19's conversion RATES and q25's
    per-user averages (averages hide the slow tail; the p90 is what
    an SLA acts on).

    Pipeline: as-of join (operators/asof — tag+union+window, ONE
    user-keyed shuffle, no range explosion) attaches each purchase's
    latest preceding view; the delay rides as EXACT integer seconds
    (unix_micros difference, one DIV — never float epoch math); the
    percentiles are quantiles.grouped_weighted_quantiles' exact
    LOWER quantiles (bucket-distributed — a segment holding most of
    the corpus never serializes one window task; the oracle mirrors
    the ceil(n·q) rank selection exactly).
    """
    from etl_sql_and_pyspark_developement__spark.operators.asof import (
        as_of_join,
    )
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_weighted_quantiles,
    )

    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    attributed = as_of_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        payload={"vts": "ts"},
    ).filter(F.col("asof_vts").isNotNull())
    delays = (
        attributed.withColumn(
            "delay_s",
            F.expr("(unix_micros(ts) - unix_micros(asof_vts)) DIV 1000000"),
        )
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("user_id"), "c_mktsegment"
                )
            ),
            "user_id",
            "left",
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            "delay_s",
            "event_id",
        )
        .withColumn("__w", F.lit(1))
    )
    q = grouped_weighted_quantiles(
        delays,
        group_col="segment",
        value_col="delay_s",
        weight_col="__w",
        tiebreak_col="event_id",
        quantiles=[(1, 2), (9, 10)],
    )
    return (
        q.groupBy("segment")
        .agg(
            F.max("total_n").alias("n_conversions"),
            F.max(
                F.when(
                    (F.col("num") == 1) & (F.col("den") == 2),
                    F.col("q_value"),
                )
            ).alias("p50_s"),
            F.max(
                F.when(
                    (F.col("num") == 9) & (F.col("den") == 10),
                    F.col("q_value"),
                )
            ).alias("p90_s"),
        )
        .orderBy("segment")
    )


@query("q84_lift_gains")
def q84_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIFT / GAINS TABLE — the model-eval rollup that decides whether
    a score is worth acting on: users deciled by an engagement score
    (view count, highest first), each decile reporting its purchase
    rate's LIFT over the base rate and the cumulative share of all
    purchasers captured (the gains curve). Completes the eval lane
    (t18 classifier precision/recall, s08 ANN recall) for the ranking
    case: 'if we only action the top decile, what fraction of
    converters do we reach'.

    All-integer outputs via cross-multiplied ppm (lift_ppm =
    1e6·pos_d·n_all DIV (n_d·pos_all); capture is a cumulative ppm on
    the 10-row frame) — no float rates anywhere. Deciling rides
    quantiles.scalable_ntile (distributed exact NTILE, q12/q16
    discipline); everything after runs on 10 rows.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        scalable_ntile,
    )

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    tiled = scalable_ntile(
        per_user, "score", 10, tiebreak_col="user_id", out_col="decile",
        descending=True,
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    w = Window.orderBy("decile")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_dec.withColumn("__cum_pos", F.sum("n_converted").over(wcum))
        .withColumn("__pos_all", F.sum("n_converted").over(wall))
        .withColumn("__n_all", F.sum("n_users").over(wall))
        .select(
            "decile",
            "n_users",
            "n_converted",
            F.expr(
                "(1000000 * n_converted * __n_all)"
                " DIV (n_users * __pos_all)"
            ).alias("lift_ppm"),
            F.expr("(1000000 * __cum_pos) DIV __pos_all").alias(
                "cum_capture_ppm"
            ),
        )
        .orderBy("decile")
    )


@query("q85_source_overlap")
def q85_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-level VOCABULARY OVERLAP matrix — pairwise Jaccard and
    overlap coefficient between each source's word set: the corpus-
    mix audit (p05/p13 weight BY source; this measures how redundant
    two sources are BEFORE mixing — near-identical vocabularies mean
    doubled weight buys no diversity). Set similarity lifted from the
    document level (d02) to the GROUP level, where it is exact and
    cheap: |sources|² pairs via one self-join of the (source, word)
    DISTINCT frame on the high-cardinality word key, counts in
    integer ppm.
    """
    docs = table(spark, sf_dir, "documents")
    sw = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
        .localCheckpoint()
    )
    sizes = sw.groupBy("source").agg(F.count(F.lit(1)).alias("n_words"))
    a = sw.alias("a")
    b = sw.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("src_a"),
                    F.col("n_words").alias("n_a"),
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("src_b"),
                    F.col("n_words").alias("n_b"),
                )
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "(1000000 * n_common) DIV (n_a + n_b - n_common)"
            ).alias("jaccard_ppm"),
            F.expr("(1000000 * n_common) DIV least(n_a, n_b)").alias(
                "overlap_ppm"
            ),
        )
        .orderBy("src_a", "src_b")
    )


@query("q86_holt_forecast")
def q86_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT double-exponential FORECASTING of daily event volumes per
    type — level + trend smoothing with a 7-day-ahead projection
    (l + 7b), the capacity-planning number q72's trendless EWMA
    systematically lags on ramping series. operators/fold.holt_stats
    runs the coupled (level, trend) recurrence as ONE builtin
    aggregate() fold with the trend lane BIAS-PACKED (the mixed-sign
    state ewma_stats' non-negative lanes cannot carry — the packing
    trick round 3's fold family stopped short of), budgets enforced
    in-plan, zero Python, zero floats; the oracle's list_reduce
    replays the truncating integer recurrence bit-for-bit.
    """
    from etl_sql_and_pyspark_developement__spark.operators.fold import (
        holt_stats,
    )

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return holt_stats(daily, "event_type", "day", "cnt").orderBy(
        "event_type"
    )


# Benford first-digit expectations, round(log10(1 + 1/d) · 1e6) —
# shared literals with the DuckDB oracle.
_BENFORD_PPM = (301030, 176091, 124939, 96910, 79181,
                66947, 57992, 51153, 45757)


@query("q87_benford_audit")
def q87_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit of order amounts — the
    forensic-accounting screen (fabricated or threshold-gamed
    figures drift from the log10(1+1/d) digit law) that joins the
    data-quality battery (q33 checks FIELDS, this checks the
    DISTRIBUTION): per digit 1-9, observed share vs the Benford
    expectation in integer ppm, plus the digit's contribution to a
    chi-square-style deviation in parts-per-billion.

    Exactness: the first significant digit comes from the EXACT
    integer-cents STRING (money is 2dp — float log10 flips at
    power-of-10 boundaries cross-engine, substring of the exact
    integer cannot); the expectations are shared inline literals; the
    deviation contribution (obs−exp)²·1e9 DIV (exp·1e6) is one
    integer cross-multiply. One decomposable 9-group groupBy over a
    single scan — nothing else.
    """
    orders = table(spark, sf_dir, "orders")
    digits = orders.select(
        F.expr(
            "CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)"
            " AS BIGINT) AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    bppm = ", ".join(
        f"({d}, {p})" for d, p in enumerate(_BENFORD_PPM, start=1)
    )
    expect = F.expr(
        f"CASE digit {' '.join(f'WHEN {d} THEN {p}' for d, p in enumerate(_BENFORD_PPM, start=1))} END"
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn("__tot", F.sum("n_orders").over(w_all))
        .withColumn("obs_ppm", F.expr("(1000000 * n_orders) DIV __tot"))
        .withColumn("benford_ppm", expect.cast("bigint"))
        .select(
            "digit",
            "n_orders",
            "obs_ppm",
            "benford_ppm",
            F.expr(
                "((obs_ppm - benford_ppm) * (obs_ppm - benford_ppm)"
                " * 1000) DIV benford_ppm"
            ).alias("dev_ppb"),
        )
        .orderBy("digit")
    )


@query("p18_shard_manifest")
def p18_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-SHARD MANIFEST — the deterministic doc→shard
    assignment a distributed dataloader consumes (every worker must
    independently compute the same mapping, so it is md5 arithmetic,
    not partitioner state): 16 shards by md5 bucket of doc_id, each
    shard reporting docs, whitespace tokens, byte mass, and its
    token-balance deviation from the ideal 1/16 share in integer ppm
    (the number that decides whether hash sharding suffices or p16's
    length-aware batching must rebalance).

    One scan → one 16-group decomposable groupBy; the balance check
    is a cross-multiply against the window total. The md5 bucket is
    the house p03/p07 discipline — engine-portable, split-invariant,
    reshuffle-free on re-runs.
    """
    docs = table(spark, sf_dir, "documents")
    sharded = docs.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT) % 16"
        ).alias("shard"),
        F.expr(
            "CASE WHEN text IS NULL OR text = '' THEN 0"
            " ELSE size(split(text, ' ')) END"
        ).alias("ws_tokens"),
        F.expr(
            "CASE WHEN text IS NULL THEN 0"
            " ELSE octet_length(text) END"
        ).alias("n_bytes"),
    )
    per_shard = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.sum("n_bytes").alias("total_bytes"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_shard.withColumn("__tt", F.sum("total_tokens").over(w_all))
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "total_bytes",
            F.expr(
                "(1000000 * 16 * total_tokens) DIV __tt - 1000000"
            ).alias("imbalance_ppm"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Round 5: survival / concentration / distribution-test / coverage lanes
# ---------------------------------------------------------------------------


@query("q88_survival_km")
def q88_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival estimate of user lifetime — the censoring-
    aware retention curve (q05's cohort grid assumes everyone's fate is
    known; KM is what you report when the observation window cuts users
    off mid-life). A user's lifetime is first→last event in days.

    The censoring horizon is DATA-DERIVED, not a fixed constant: a user
    is a churn event when their recency gap (days from last event to
    corpus end) exceeds the population's MEAN gap; at-or-below-mean
    users are censored (still active at the window edge). A fixed
    "inactive ≥ 14 days" rule silently classifies EVERYONE censored
    when the corpus span is short relative to the constant (this lane's
    round-5 defect: 0 churn events at every shipped scale, so the
    parity row verified nothing); the mean splits any population whose
    gaps are not all identical — and an in-plan assert_true guard
    RAISES if it ever fails to, rather than emitting a vacuous frame.

    The KM table itself (suffix-sum risk set, exact integer hazard
    d·1e6 DIV n, log-space ordered product over the bounded
    distinct-lifetime frame, terminal d=n bucket pinned to 0.0 instead
    of log(0)) lives in operators/survival.km_curve, where a
    planted-data unit test asserts a hand-computed curve.

    Reference parity: extends the churn lens of
    pyspark/Churn Prediction and Risk Analysis.py (binary churn flags) to the
    full time-to-event distribution.
    """
    from etl_sql_and_pyspark_developement__spark.operators.survival import (
        km_curve,
    )

    ev = table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    gaps = users.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias(
            "t_days"
        ),
        F.datediff(F.col("max_day"), F.to_date("last_ts")).alias("gap_days"),
    )
    # Mean recency gap as the churn threshold: exact integer sum/count,
    # one IEEE double division — bit-identical in any engine.
    thresh = gaps.agg(
        (
            F.sum("gap_days").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_gap")
    )
    lives = gaps.crossJoin(F.broadcast(thresh)).select(
        "t_days",
        (F.col("gap_days").cast("double") > F.col("avg_gap"))
        .cast("int")
        .alias("churned"),
    )
    # In-plan population-split guard (q61's discipline): churned AND
    # censored users must BOTH exist, else the KM frame is vacuous —
    # raise loudly instead. assert_true yields NULL on pass; the
    # isNull filter forces its evaluation (column pruning cannot drop
    # a filter input), then the helper column is dropped.
    split_ok = (
        lives.agg(
            F.sum("churned").alias("__nc"), F.count(F.lit(1)).alias("__nu")
        )
        .select(
            F.assert_true(
                (F.col("__nc") > 0) & (F.col("__nc") < F.col("__nu")),
                F.lit(
                    "q88: mean-gap censoring horizon failed to split the "
                    "population into churned and censored users"
                ),
            ).alias("__split_ok")
        )
    )
    guarded = (
        lives.crossJoin(F.broadcast(split_ok))
        .filter(F.col("__split_ok").isNull())
        .drop("__split_ok")
    )
    return km_curve(guarded)


@query("q89_hhi_concentration")
def q89_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN supplier-concentration index per nation —
    the antitrust/supply-risk metric (sum of squared market shares):
    a nation whose parts revenue concentrates in two suppliers scores
    near 500000 ppm; perfectly split across k suppliers scores 1e6/k.

    Exactness: revenue terms are exact 4-decimal values → one
    round(·1e4) per line gives integer ten-thousandths summed as
    BIGINT; shares are integer ppm cross-divides; HHI is the integer
    sum of squared ppm shares DIV 1e6. One fact scan, one broadcast
    each for supplier and nation, two decomposable groupBys.

    Reference parity: the market-share rollups of
    SQL/Competitive Content Benchmarking.txt, hardened to an exact
    concentration statistic.
    """
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    per_sup = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "s_nationkey",
            "l_suppkey",
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)"
                " AS BIGINT)"
            ).alias("rev_e4"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rev_e4").alias("sup_rev"))
    )
    # DECIMAL(38,0) on the cross-multiplied terms AND the window
    # denominator (t22's discipline): 1e6 x a nation's revenue
    # ten-thousandths exceeds 2^63 at large scale factors — and the
    # nation-total sum itself passes 2^63 two orders of magnitude
    # later still — where non-ANSI Spark would wrap silently while
    # the oracle's HUGEINT sum stays exact. DIV returns BIGINT; the
    # quotients are small.
    shared = per_sup.withColumn(
        "share_ppm",
        F.expr(
            "(1000000 * CAST(sup_rev AS DECIMAL(38,0)))"
            " DIV sum(CAST(sup_rev AS DECIMAL(38,0)))"
            " OVER (PARTITION BY s_nationkey)"
        ),
    )
    per_nation = shared.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("share_ppm").alias("top_share_ppm"),
        F.expr(
            "sum(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)"
            " DIV 1000000"
        ).alias("hhi_ppm"),
    )
    return (
        per_nation.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            per_nation.s_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "top_share_ppm",
            "hhi_ppm",
        )
        .orderBy("nation")
    )


@query("q90_lateral_topk")
def q90_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL-join surface: per customer, the top-3 orders by
    price via a correlated LATERAL subquery with ORDER BY + LIMIT —
    the SQL-text twin of q21's window top-k (like q47/q48/q49 are for
    rollup/window/sessionize). Catalyst rewrites the correlated
    LATERAL into the same join + ranking machinery; the point is the
    SURFACE parity: a reference user's LATERAL query runs verbatim.

    Spark 4 supports correlated ORDER BY/LIMIT in LATERAL subqueries
    (probed live on this runtime); DuckDB runs the identical text.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
               t.o_totalprice, t.rnk
        FROM customer c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rnk
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.rnk
        """
    )


@query("q91_interval_union")
def q91_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION (sweep-line) — total covered time per user when
    every event opens a 5-minute activity window and overlaps must not
    double-count: the classic "merge overlapping intervals" operator,
    done as one per-user ordered window instead of a self-join. The
    running max of interval ends over PRECEDING rows detects island
    starts (start > max end so far); islands are the running sum of
    start flags; each island's coverage is max(end) − min(start),
    exact epoch-second integers end to end.

    Scale: one shuffle on user_id; the window is per-user (bounded
    partitions), the island groupBy is decomposable. The self-join
    formulation this replaces is quadratic per user.

    Reference parity: the session-coverage arithmetic behind
    pyspark/Binge-Watching Behavior Analysis.py's viewing sessions,
    without its event-pair join.
    """
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("s"),
        (F.expr("CAST(unix_timestamp(ts) AS BIGINT)") + F.lit(300)).alias(
            "e"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "__new",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("covered").alias("covered_seconds"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query("q92_autocorr_daily")
def q92_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-k AUTOCORRELATION of the daily event series per event type
    — the seasonality screen run before q82's decomposition is worth
    its cost: ac_lag7 near 1 says "weekly cycle", ac_lag1 near 0 says
    "noise, don't bother". Daily counts (exact ints) self-correlate
    against their 1-day and 7-day lags via per-type ordered windows;
    Pearson corr rounds at 4dp with the q15 −0.0 collapse.

    Scale: daily-grain frame (types × days), window partitioned per
    type — the heavy groupBy from raw events is the only fact-scale
    stage and it is decomposable.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("cnt").cast("double").alias("c0"),
        F.lag("cnt", 1).over(w).cast("double").alias("c1"),
        F.lag("cnt", 7).over(w).cast("double").alias("c7"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.round(F.corr("c0", "c1"), 4) + 0.0).alias("ac_lag1"),
            (F.round(F.corr("c0", "c7"), 4) + 0.0).alias("ac_lag7"),
        )
        .orderBy("event_type")
    )


@query("q93_ks_two_sample")
def q93_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV statistic comparing the order-
    price distributions of two market segments — the distribution-
    level A/B check (q13 compares means; KS catches shape drift a
    t-test misses, the same statistic drift monitors threshold).

    Exact integers end to end: prices become cents; the ECDF gap at
    each distinct price is |cum1·n2 − cum2·n1| (cross-multiplied to
    avoid division); D is the max gap reported in integer ppm with
    the smallest achieving price as the tie-break witness. The
    cumulative windows run over the DISTINCT-cents frame — bounded by
    the price domain (≤ ~1e6 values at any corpus size), never by
    order count, so the unpartitioned window is safe.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    segged = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    per_cents = segged.groupBy(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        )
    ).agg(
        F.sum(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        ).alias("n1"),
        F.sum(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0)
        ).alias("n2"),
    )
    w_ord = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gaps = per_cents.select(
        "cents",
        F.sum("n1").over(w_ord).alias("cum1"),
        F.sum("n2").over(w_ord).alias("cum2"),
        F.sum("n1").over(w_all).alias("n1t"),
        F.sum("n2").over(w_all).alias("n2t"),
    ).select(
        "cents",
        "n1t",
        "n2t",
        # DECIMAL(38,0) cross-multiplies (t22's discipline): cum x n
        # exceeds 2^63 once both samples pass ~3e9 rows, where
        # non-ANSI Spark wraps silently while the oracle errors.
        F.abs(
            F.col("cum1").cast("decimal(38,0)") * F.col("n2t")
            - F.col("cum2").cast("decimal(38,0)") * F.col("n1t")
        ).alias("d_num"),
    )
    return (
        gaps.orderBy(F.desc("d_num"), F.asc("cents"))
        .limit(1)
        .select(
            F.col("n1t").alias("n_building"),
            F.col("n2t").alias("n_automobile"),
            F.expr(
                "(1000000 * d_num)"
                " DIV (CAST(n1t AS DECIMAL(38,0)) * n2t)"
            ).alias("ks_ppm"),
            F.col("cents").alias("at_cents"),
        )
    )


@query("d20_dup_inflation_audit")
def d20_dup_inflation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATION-INFLATION audit per source — the number a corpus
    owner reads BEFORE spending on MinHash machinery: how many bytes/
    tokens/docs does each source inflate versus its exact-distinct
    content? doc inflation = docs per distinct text (ppm), token
    inflation weights the same ratio by whitespace tokens (a source
    whose duplicates are its LONGEST docs wastes more budget than the
    doc ratio shows). Drives the d01→d03 tiering decision: sources at
    ~1e6 ppm skip dedup entirely.

    Two decomposable groupBys (text-hash, then source); exact BIGINT
    ratios. The md5 keyed first pass is the same shape the d01 exact
    tier runs, so this audit's cost is a strict prefix of the dedup
    it gates.
    """
    docs = table(spark, sf_dir, "documents")
    per_text = (
        docs.select(
            "source",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
            F.expr(
                "CASE WHEN text IS NULL OR text = '' THEN 0"
                " ELSE size(split(text, ' ')) END"
            ).alias("ws_tokens"),
        )
        .groupBy("source", "h")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            # all copies share the text, hence the token count
            F.max("ws_tokens").alias("toks"),
        )
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("n_copies").alias("n_docs"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("n_copies") * F.col("toks")).alias("total_tokens"),
            F.sum("toks").alias("distinct_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr("(1000000 * n_docs) DIV n_distinct").alias(
                "doc_inflation_ppm"
            ),
            F.expr(
                "CASE WHEN distinct_tokens = 0 THEN 1000000"
                " ELSE (1000000 * total_tokens) DIV distinct_tokens END"
            ).alias("token_inflation_ppm"),
        )
        .orderBy("source")
    )


@query("t22_term_burstiness")
def t22_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TERM BURSTINESS (variance-to-mean ratio) for the corpus's top
    40 terms — the signal separating topical terms (bursty: absent
    from most docs, dense where present — good dedup shingles, good
    quality features) from function words (Poisson-like: VMR ≈ 1).
    Complements t20's Zipf slope (rank-frequency SHAPE) with per-term
    dispersion.

    Zero-count docs are handled WITHOUT materializing them: over N
    docs with per-doc counts x (zero for docs lacking the term),
    Σx² is the sum over docs-containing only, so
    VMR = (N·Σx² − (Σx)²) / (Σx · (N−1)) in exact integer ppm
    (DECIMAL(38) cross-multiplies — N·Σx² overflows BIGINT at corpus
    scale). One explode + two decomposable groupBys + a 40-row
    TakeOrdered; the t05 tokenizer discipline (split-once, len ≥ 3).
    """
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = (
        docs.select(
            "doc_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("__toks")
        )
        .select("doc_id", F.explode("__toks").alias("term"))
        .filter(F.length("term") >= 3)
    )
    per_doc = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_term = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("cnt").alias("total_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
    )
    top = per_term.orderBy(F.desc("total_cnt"), F.asc("term")).limit(40)
    return (
        top.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            "total_cnt",
            F.expr(
                "CAST((1000000 * (CAST(n_docs AS DECIMAL(38,0))"
                " * sumsq - CAST(total_cnt AS DECIMAL(38,0))"
                " * total_cnt))"
                " DIV (CAST(total_cnt AS DECIMAL(38,0)) * (n_docs - 1))"
                " AS BIGINT)"
            ).alias("vmr_ppm"),
        )
        .orderBy(F.desc("total_cnt"), F.asc("term"))
    )


@query("p19_privacy_noise")
def p19_privacy_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEEDED-NOISE count release per (source, lang) — the plumbing of
    a differential-privacy release (perturb small-cell counts before
    publishing a dataset card) with a DETERMINISTIC md5-seeded noise
    draw standing in for the calibrated Laplace sampler: noise is
    uniform on [−10, 10] keyed by the cell, released = max(0, n +
    noise). Deterministic so every worker/re-run/oracle agrees — the
    same md5-arithmetic discipline as p03/p07/p18; swapping in a real
    discrete-Laplace inverse-CDF on the same md5 uniform is a one-line
    change and the plumbing (cell keying, clamping, exact replay) is
    what this query pins.

    One decomposable groupBy over a single scan; noise is codegen md5
    arithmetic, no Python.
    """
    docs = table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    noise = F.expr(
        "CAST(conv(substring(md5(concat('dp:', source, ':', lang)),"
        " 1, 6), 16, 10) AS BIGINT) % 21 - 10"
    )
    return (
        cells.withColumn("noise", noise)
        .select(
            "source",
            "lang",
            "n_docs",
            "noise",
            F.greatest(F.lit(0), F.col("n_docs") + F.col("noise")).alias(
                "released_count"
            ),
        )
        .orderBy("source", "lang")
    )


@query("s09_knn_label_vote")
def s09_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN LABEL-VOTE classifier evaluation over the shared graph
    artifact — the fourth eval lane (t18 classifier PR, s08 ANN
    recall, q84 ranking gains; this one scores the NEAREST-NEIGHBOR
    rule itself): each vector's label is predicted by majority vote
    of its kNN-graph neighbors (ties break to the smallest label —
    deterministic), scored per true class. The number that says
    whether the embedding space is label-coherent enough for s-lane
    semantic dedup to respect class boundaries.

    Consumes io.knn_graph_artifact (build-once, q68/q71/q78/p12's
    graph); everything downstream is two equi-joins on vec ids + a
    per-query tally window (≤ #distinct-labels rows per query) + one
    per-class groupBy. Vectors with no graph neighbors are reported
    in coverage, not silently dropped from the denominator.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        knn_graph_artifact,
    )

    edges = knn_graph_artifact(spark, sf_dir).select("query_id", "cand_id")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    tally = (
        edges.join(
            emb.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("cand_label"),
            ),
            "cand_id",
        )
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("cand_label")
    )
    pred = (
        tally.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("query_id", F.col("cand_label").alias("pred_label"))
    )
    scored = emb.join(
        pred, emb.vec_id == pred.query_id, "left"
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_class"),
            F.sum(
                F.when(F.col("pred_label").isNotNull(), 1).otherwise(0)
            ).alias("n_predicted"),
            F.sum(
                F.when(F.col("pred_label") == F.col("label"), 1).otherwise(
                    0
                )
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n_class",
            "n_predicted",
            "n_correct",
            F.expr(
                "CASE WHEN n_predicted = 0 THEN 0"
                " ELSE (1000000 * n_correct) DIV n_predicted END"
            ).alias("accuracy_ppm"),
        )
        .orderBy("label")
    )


@query("q94_sql_pipe")
def q94_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE-SYNTAX surface (Spark 4's `|>` operator chain,
    SPARK-49555): the linear FROM → WHERE → AGGREGATE → ORDER BY
    pipeline a reference user migrating from dataframe-style thinking
    writes — each stage reads top-to-bottom instead of inside-out.
    Catalyst lowers it to the identical logical plan as the nested
    form, so it is pure surface parity (the q30/q47 family extended
    to Spark 4's newest dialect). The oracle is the equivalent
    classic SQL — DuckDB has no pipe dialect, and value equality IS
    the demonstration that `|>` adds no semantics.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total_price,
                     min(o_orderdate) AS first_order
           GROUP BY o_orderpriority
        |> WHERE n_orders > 1
        |> SELECT o_orderpriority, n_orders, total_price,
                  date_format(first_order, 'yyyy-MM-dd') AS first_day
        |> ORDER BY o_orderpriority
        """
    )


@query("q95_sql_udf")
def q95_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF surface (Spark 4 `CREATE FUNCTION ... RETURN
    <expr>`): business logic packaged as a catalog function instead of
    a copy-pasted expression — the governed-semantics pattern (one
    blessed `disc_price`, not N slightly-different inline formulas).
    Because the body is a SQL EXPRESSION, Catalyst inlines it into the
    calling plan (full codegen, pushdown through it — a Python UDF
    here would wall off the optimizer). Oracle inlines the identical
    expression, which is exactly what Spark's analyzer does.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge(p DOUBLE, d DOUBLE, "
        "t DOUBLE) RETURNS DOUBLE RETURN disc_price(p, d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_lines,
               round(sum(disc_price(l_extendedprice, l_discount)), 4)
                   AS revenue,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 4)
                   AS charged
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query("q96_sql_variables")
def q96_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-VARIABLE surface (Spark 4 `DECLARE VARIABLE` /
    `SET VAR`): the parameterized-report pattern — thresholds live in
    typed session variables, the query text stays fixed, and the
    analyzer folds the variable's VALUE into the plan as a literal
    (so pushdown still reaches the scan; string-interpolating
    parameters into SQL text — the injection-prone alternative — buys
    nothing over this). Oracle carries the same values as literals,
    which is precisely the analyzed form.
    """
    from etl_sql_and_pyspark_developement__spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE seg STRING DEFAULT 'BUILDING'")
    spark.sql("SET VAR price_floor = 50000.0")
    spark.sql("SET VAR seg = 'MACHINERY'")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > price_floor AND c.c_mktsegment = seg
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


@query("q97_partition_pruned_rollup")
def q97_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-PRUNED day-range rollup over the Hive-layout events
    artifact (io.partitioned_events_artifact) — the scan shape a
    100 TB event lake lives or dies by: the day predicate resolves
    against partition DIRECTORIES (PartitionFilters in-plan,
    asserted), so pruned days cost zero IO — on the flat testdata
    parquet the same predicate is a row filter over the full scan.
    Static pruning here; the same layout is what runtime dynamic
    partition pruning (spark.sql.optimizer.dynamicPartitionPruning,
    on by default) keys on when the days come from a joined dim
    filter instead of literals.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        partitioned_events_artifact,
    )

    ev = partitioned_events_artifact(spark, sf_dir)
    return (
        ev.filter(
            (F.col("event_day") >= "2024-01-08")
            & (F.col("event_day") <= "2024-01-14")
        )
        # partition-type inference may read the directory values back
        # as DATE; the output contract (and the oracle) is the string
        .withColumn("event_day", F.col("event_day").cast("string"))
        .groupBy("event_day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_day", "event_type")
    )


@query("d21_lsh_recall_eval")
def d21_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH DEDUP-TUNING evaluation — recall AND precision of d03's
    MinHash-LSH band candidates against EXACT threshold-Jaccard ground
    truth (the s08 discipline applied to the dedup lane: measure the
    band/row trade before trusting it on 100 TB). Ground truth is the
    exact threshold-Jaccard pair set (jaccard_pairs; identical to the
    prefix-filtered AllPairs form — see the r12 note below) computed
    on a deterministic fixed-COUNT sample (2000 docs by md5 order —
    fixed-count, not fixed-fraction, so the exact pair work stays
    bounded at any corpus size; the s08 lesson), candidates run the
    identical d03 machinery on the same sample, and hits are the
    candidates that verify ≥ τ. recall < 1e6 ppm quantifies pairs the
    band collision misses; precision says how much verify work each
    candidate costs.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        shingle_df,
    )

    docs = table(spark, sf_dir, "documents")
    # The sample is NOT localCheckpointed (r12): since the r11 sh=
    # threading, its only real consumer is the shingle pass below
    # (truth and candidates both ride `sh`) — the old LC paid an
    # eager job for a frame read exactly once.
    sample = (
        docs.select("doc_id", "text")
        .orderBy(F.md5(F.col("doc_id").cast("string")))
        .limit(2000)
    )
    # r11: ONE shingle pass shared by the exact-truth and candidate
    # pipelines (each used to pay its own tokenize+explode over the
    # sample), and the truth set is materialized ONCE for its two
    # consumers; candidate volume + hit count ride one broadcast-left
    # join + one aggregate instead of a count plus a semi-join count
    # (three jobs → one). Values identical — same machinery, same
    # pair sets (both distinct), count(__true) == |truth ∩ cand|.
    # r12: ground truth via the PLAIN shared-shingle all-pairs join —
    # on the FIXED 2000-doc sample (bounded at any corpus size) the
    # prefix filter's extra rank/window passes cost more than they
    # save (interleaved A/B 1.70s vs 1.05s at sf0.1; identical pair
    # sets, asserted at three thresholds in tests/test_dedup.py).
    # jaccard_pairs_prefix remains the corpus-WIDE exact form.
    sh = shingle_df(sample, "doc_id", "text", 3).localCheckpoint()
    truth = (
        jaccard_pairs(sample, "doc_id", "text", n=3, sh=sh)
        .filter(
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            >= 0.5
        )
        .select("doc_a", "doc_b")
        .withColumn("__true", F.lit(1))
        .localCheckpoint()
    )
    cand = lsh_candidate_pairs(sample, "doc_id", "text", n=3, sh=sh)
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    # truth is sample-bounded (≤ C(2000,2) pairs at ANY corpus size),
    # so the broadcast hint is safe by construction — see the same
    # note in operators/dedup.lsh_band_sweep (r11 advice item)
    cand_hits = cand.join(
        F.broadcast(truth), ["doc_a", "doc_b"], "left"
    ).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count("__true").alias("n_hits"),
    )
    return (
        n_true.crossJoin(F.broadcast(cand_hits))
        .select(
            F.lit(50).cast("bigint").alias("threshold_pct"),
            "n_true_pairs",
            "n_candidates",
            "n_hits",
            F.expr(
                "CASE WHEN n_true_pairs = 0 THEN 1000000"
                " ELSE (1000000 * n_hits) DIV n_true_pairs END"
            ).alias("recall_ppm"),
            F.expr(
                "CASE WHEN n_candidates = 0 THEN 1000000"
                " ELSE (1000000 * n_hits) DIV n_candidates END"
            ).alias("precision_ppm"),
        )
    )


@query("m08_frame_dedup")
def m08_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME-LEVEL exact dedup per video — the multimodal twin of
    d01's text tier (a screen recording or slideshow is mostly
    REPEATED frames; its storage/training value is its distinct-frame
    count): sample every 2nd 32-byte "frame" (m02's stub-decode
    contract — payload is text's UTF-8 here, real codecs swap in),
    content-address each frame (md5 over the uppercase-hex form so the
    DuckDB oracle replays byte-exact substring arithmetic), and report
    per doc the frame dup inflation plus its hottest frame's copy
    count — what a video-curation pass reads before paying for
    per-frame feature extraction.

    Scale: the kernel is narrow mapInPandas (the only Python — same
    lane as m02/m05); dedup is one decomposable (doc, hash) groupBy
    then a per-doc rollup. No pairwise machinery anywhere.
    """
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        frame_hex_samples,
        with_binary_payload,
    )

    docs = table(spark, sf_dir, "documents")
    frames = frame_hex_samples(
        with_binary_payload(docs), frame_size=32, every_kth=2
    )
    per_hash = frames.groupBy(
        "doc_id", F.md5("frame_hex").alias("fh")
    ).agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        per_hash.groupBy("doc_id")
        .agg(
            F.sum("n_copies").alias("n_frames"),
            F.count(F.lit(1)).alias("n_distinct_frames"),
            F.max("n_copies").alias("max_frame_copies"),
        )
        .select(
            "doc_id",
            "n_frames",
            "n_distinct_frames",
            "max_frame_copies",
            F.expr(
                "(1000000 * n_frames) DIV n_distinct_frames"
            ).alias("frame_dup_ppm"),
        )
        .orderBy("doc_id")
    )


@query("q98_bitmap_exact_distinct")
def q98_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per day via MERGEABLE BITMAPS — the
    production alternative when q27's HLL error is unacceptable but
    countDistinct's planner shape hurts: ids bucket into 64-bit words
    (bucket = id DIV 63, bit = id MOD 63 — 63-bit words keep the
    BIGINT sign bit clear on both engines), per (day, bucket) the words
    BIT_OR together — an associative, partial-aggregable merge (a
    re-aggregation over days reuses the same words, the roaring-bitmap
    idea in its flat form) — and popcount sums recover exact counts.
    Also emits the pairwise-day arithmetic this representation buys:
    distinct users seen on BOTH the day and its predecessor via
    bit_count(a AND b), an intersection countDistinct cannot express
    without a self-join.

    Scale: two decomposable groupBys + one 1-day lag join on the
    (day, bucket) frame (bounded by days × active-id-range/64);
    everything is integer codegen.
    """
    ev = table(spark, sf_dir, "events")
    words = (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            # 63-bit words: bit 63 is the BIGINT sign bit — Spark's
            # shiftleft silently wraps into it and DuckDB refuses the
            # shift outright, so ids pack 63 per word on both engines
            F.expr("user_id DIV 63").alias("bucket"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
                " AS BIGINT)"
            ).alias("bit"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    prev = words.select(
        F.date_format(
            F.date_add(F.to_date("day"), 1), "yyyy-MM-dd"
        ).alias("day"),
        F.col("bucket"),
        F.col("word").alias("prev_word"),
    )
    joined = words.join(prev, ["day", "bucket"], "left")
    return (
        joined.groupBy("day")
        .agg(
            F.sum(F.expr("bit_count(word)")).alias("n_distinct_users"),
            F.sum(
                F.expr(
                    "bit_count(word & coalesce(prev_word, CAST(0 AS BIGINT)))"
                )
            ).alias("n_retained_from_prev_day"),
        )
        .orderBy("day")
    )


@query("p20_group_kfold")
def p20_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE K-FOLD assignment with a leakage audit — the CV
    split a training pipeline must get right: all of an entity's
    events land in ONE fold (fold = md5 bucket of user_id, never of
    event_id — splitting by row leaks a user's behavior across
    train/validation), deterministic so every worker and every re-run
    agrees (p03/p07 discipline). Emits per fold the event/user mass
    and the audit numbers: users_spanning_folds MUST be 0 (asserted
    in-contract by construction, surfaced as a column so a pipeline
    can gate on it) and the fold's event-share deviation from the
    ideal 1/5 in integer ppm.
    """
    ev = table(spark, sf_dir, "events")
    folded = ev.select(
        "event_id",
        "user_id",
        F.expr(
            "CAST(conv(substring(md5(concat('fold:', CAST(user_id AS"
            " STRING))), 1, 6), 16, 10) AS BIGINT) % 5"
        ).alias("fold"),
    )
    per_user = folded.groupBy("user_id").agg(
        F.countDistinct("fold").alias("n_folds"),
        F.first("fold").alias("fold"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spanning = per_user.agg(
        F.sum(F.when(F.col("n_folds") > 1, 1).otherwise(0)).alias(
            "users_spanning_folds"
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_user.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(F.broadcast(spanning))
        .withColumn("__tot", F.sum("n_events").over(w_all))
        .select(
            "fold",
            "n_users",
            "n_events",
            "users_spanning_folds",
            F.expr(
                "(1000000 * 5 * n_events) DIV __tot - 1000000"
            ).alias("imbalance_ppm"),
        )
        .orderBy("fold")
    )


@query("q99_asof_directions")
def q99_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTIONAL AS-OF joins — pandas merge_asof's full direction
    switch (backward / forward / nearest) as two one-shuffle window
    passes: each purchase gets its user's latest view AT-OR-BEFORE
    (backward, q25's op now with a deterministic event-id tiebreak)
    and earliest view AT-OR-AFTER (forward, the new mirror operator);
    nearest picks the smaller integer-second delta, ties to backward.
    The attribution question q25 answers with one direction ("which
    view caused this purchase") becomes symmetric ("or did the view
    follow it — post-purchase browsing"), per-event.

    Exactness: deltas are unix-second integers; the nearest CASE is
    pure integer comparison. Scale: two tag+union+window passes, each
    ONE hash shuffle on user_id; no range join, no explosion.
    """
    from etl_sql_and_pyspark_developement__spark.operators.asof import (
        as_of_join,
        as_of_join_forward,
    )

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    back = as_of_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"view_ts": "ts"},
        tiebreak="event_id",
    )
    both = as_of_join_forward(
        back,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"view_ts": "ts"},
        tiebreak="event_id",
    )
    sec = "CAST(unix_timestamp({}) AS BIGINT)"
    return (
        both.select(
            "event_id",
            F.expr(
                f"{sec.format('ts')} - {sec.format('asof_view_ts')}"
            ).alias("back_delta_s"),
            F.expr(
                f"{sec.format('asof_fwd_view_ts')} - {sec.format('ts')}"
            ).alias("fwd_delta_s"),
        )
        .select(
            "event_id",
            "back_delta_s",
            "fwd_delta_s",
            F.expr(
                "CASE WHEN back_delta_s IS NULL AND fwd_delta_s IS NULL"
                " THEN NULL"
                " WHEN fwd_delta_s IS NULL THEN back_delta_s"
                " WHEN back_delta_s IS NULL THEN fwd_delta_s"
                " WHEN back_delta_s <= fwd_delta_s THEN back_delta_s"
                " ELSE fwd_delta_s END"
            ).alias("nearest_delta_s"),
            F.expr(
                "CASE WHEN back_delta_s IS NULL AND fwd_delta_s IS NULL"
                " THEN 'none'"
                " WHEN fwd_delta_s IS NULL THEN 'back'"
                " WHEN back_delta_s IS NULL THEN 'fwd'"
                " WHEN back_delta_s <= fwd_delta_s THEN 'back'"
                " ELSE 'fwd' END"
            ).alias("nearest_side"),
        )
        .orderBy("event_id")
    )


@query("q101_aqe_skew_join")
def q101_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE SKEW-JOIN demonstration lane — the third 100 TB join
    defense, completing the set (q42 salts hot-key AGGREGATIONS, q100
    co-locates repeat joins via bucketing; this lane shows Spark's
    RUNTIME answer for a hot-key fact join you didn't pre-layout for):
    a deliberately skewed key routes ~90% of events to one join
    partition, and AQE's OptimizeSkewedJoin splits that partition by
    map-output ranges at runtime, replicating the matching right rows
    — no salting code, no relayout.

    Plan-shape requirements the test pins (each one learned the hard
    way): (1) the skewed side must have REAL map-side parallelism —
    a single-row-group parquet file reads as ONE map task no matter
    what maxPartitionBytes says, and a one-mapper hot partition
    cannot be split by map ranges, so the fact side repartitions
    first (standing in for the thousands of scan tasks a 100 TB scan
    has naturally); (2) the dim side is materialized (localCheckpoint
    — at the lake, a staged table) because OptimizeSkewedJoin only
    matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) and a final
    HashAggregate between Sort and stage breaks the pattern; (3) the
    merge hint keeps the tiny local dim from broadcasting so the
    demonstrated plan is the one a 100 TB run (unbroadcastable dim)
    would produce. The skew split itself fires when partition sizes
    exceed the session thresholds (production: 256 MB / 5x median —
    right for real data; the plan test scales them to the local
    corpus and asserts skew=true in the final adaptive plan).

    The oracle is the plain join rollup — layout and runtime
    re-planning change the PLAN, never the result (q100's
    discipline). max (not sum) aggregates over the joined dim
    metrics keep every output bounded at any corpus size.
    """
    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    hot = "CASE WHEN pmod({c}, 10) < 9 THEN 0 ELSE {c} END"
    left = ev.repartition(16).select(
        F.expr(hot.format(c="user_id")).alias("k"), "event_type"
    )
    right = (
        orders.select(
            F.expr(hot.format(c="o_custkey")).alias("k"), "o_totalprice"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_cents"),
        )
        .localCheckpoint()
    )
    joined = left.join(right.hint("merge"), "k", "inner")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("n_orders").alias("max_key_orders"),
            F.max("rev_cents").alias("max_key_rev_cents"),
        )
        .orderBy("event_type")
    )


@query("q100_bucketed_colocated_join")
def q100_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-FREE CO-LOCATED JOIN over bucketed tables — the 100 TB
    join strategy the flat-parquet queries can only describe: orders
    and customer staged once as catalog tables bucketed 16-way on the
    customer key (io.bucketed_join_tables), so the fact-side join
    reads bucket i against bucket i with ZERO Exchange on either side
    (plan-asserted — the scan's reported output partitioning satisfies
    the join's distribution requirement). The per-segment rollup
    after the join is the only shuffle in the plan, and it moves
    5 rows' worth of aggregate state per task.

    At the lake this contract is Iceberg bucket transforms / Delta
    clustering; the values are the oracle's plain-join answer — the
    layout changes the PLAN, never the result.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        bucketed_join_tables,
    )

    orders_t, cust_t = bucketed_join_tables(spark, sf_dir, n_buckets=16)
    o = spark.table(orders_t)
    c = spark.table(cust_t)
    joined = o.join(
        c.hint("merge"), o.o_custkey == c.c_custkey
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@query("t23_bpe_train_iterations")
def t23_bpe_train_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATED BPE merge training over the corpus — t13 counts ONE
    merge round; real tokenizer training iterates merge -> re-segment
    k times, and the merge TABLE (step, lhs, rhs, merged, pair_count)
    is the artifact a tokenizer ships. Four rounds here, each one
    pair-keyed shuffle over the distinct-word dictionary + a
    TakeOrdered(1) + one codegen replace (operators/textstats.
    bpe_train — the kcore iterative discipline: fixed budget, raise
    on a dry corpus, per-round localCheckpoint).

    The DuckDB oracle unrolls the same four rounds as staged
    MATERIALIZED CTEs (q78's pattern): the count/pick/re-segment
    algebra is identical, so the merge table matches bit-for-bit.

    Reference parity: extends the tokenizer-training inner loop of
    t13's one-round merge counting (itself a corpus-pipeline
    extension beyond the reference's 20 workloads) to the full
    iterated trainer.
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_train,
    )

    docs = table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=4).orderBy("step")


@query("q102_observed_quality")
def q102_observed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-FLIGHT data-quality observation riding a business rollup —
    q33 runs validation as its own pass; at 100 TB you can't afford a
    second scan just to count violations, so this lane attaches q33's
    SIX expectation counters to the rollup's own scan via
    df.observe() (CollectMetrics: a handful of longs per task, zero
    extra jobs). The query's RESULT is the per-returnflag revenue
    rollup (oracle-verified); the observed counters are asserted
    equal to q33's validate() output in pytest — same predicates,
    same counts, one pass.

    Exact integers in the rollup (quantity and 4-decimal revenue ride
    BIGINT) so the oracle matches bit-for-bit.

    Reference parity: the reference's analytics (e.g.
    pyspark/User Engagement Funnel Analysis.py) aggregate raw event
    tables and implicitly assume clean inputs — this lane is that
    assumption made checkable without a second scan.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quality import (
        lineitem_checks,
        observe_checks,
    )

    li = observe_checks(
        table(spark, sf_dir, "lineitem"), lineitem_checks()
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                "CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)"
            ).alias("sum_qty"),
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
                " * 10000, 0) AS BIGINT)) AS BIGINT)"
            ).alias("revenue_e4"),
        )
        .orderBy("l_returnflag")
    )


@query("q103_rolling_bitmap_distinct")
def q103_rolling_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAILING-7-DAY exact distinct users per day via MERGEABLE
    bitmap words — the cheaper form of q52's rolling distinct when the
    id domain is bounded: q52 explodes every (user, day) membership
    across its window days (rows ~ users x days x 7), while here the
    per-day words q98 already builds are simply OR-merged across the
    window (rows ~ days x id-range/63 x 7, INDEPENDENT of how many
    users repeat). Re-aggregation reuses words — the mergeable
    property IS the point: the same per-day frame answers 1-day,
    7-day, 28-day windows with one more BIT_OR each.

    Plan: one (day, bucket) groupBy builds the words, a 7-way
    sequence explode re-keys each word to the target days it covers,
    one more BIT_OR + popcount per target day. All integer codegen;
    the explode factor is the window length, applied to the BOUNDED
    words frame, never to events.
    """
    ev = table(spark, sf_dir, "events")
    words = (
        ev.select(
            F.to_date("ts").alias("d"),
            F.expr("user_id DIV 63").alias("bucket"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(user_id % 63 AS INT)) AS BIGINT)"
            ).alias("bit"),
        )
        .groupBy("d", "bucket")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    days = words.select("d").distinct()
    fanout = words.select(
        F.expr("explode(sequence(0, 6))").alias("off"),
        "d",
        "bucket",
        "word",
    ).select(F.expr("date_add(d, off)").alias("d"), "bucket", "word")
    rolled = (
        fanout.join(days, "d", "semi")  # windows ending on REAL days only
        .groupBy("d", "bucket")
        .agg(F.expr("bit_or(word)").alias("word7"))
        .groupBy("d")
        .agg(F.sum(F.expr("bit_count(word7)")).alias("n_distinct_7d"))
    )
    daily = words.groupBy("d").agg(
        F.sum(F.expr("bit_count(word)")).alias("n_distinct_1d")
    )
    return (
        rolled.join(daily, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_distinct_1d",
            "n_distinct_7d",
        )
        .orderBy("day")
    )


@query("q104_dynamic_partition_pruning")
def q104_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING over the day-partitioned events lake
    — q97 prunes on a LITERAL day predicate; the production query
    selects days by ATTRIBUTE ("the busy days") through a dim join,
    and only a RUNTIME subquery can turn that into partition pruning:
    Spark evaluates the dim side first (reusing its broadcast) and
    skips the fact partitions whose event_day never joins — zero IO
    for quiet days, no literal day list anywhere.

    Shape requirements (measured, each pinned by the plan test): the
    dim filter must be a plain column COMPARISON over one scanned
    relation (io.day_dim_artifact denormalizes the corpus max so
    '10*n_users >= 8*max_users' is scale-free AND likely-selective —
    a bare boolean column or a cross-relation comparison makes DPP
    decline), and the join key must be the fact's PARTITION column.

    The oracle is the plain join rollup over flat events — pruning
    changes IO, never values (q97/q100/q101's discipline).
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        day_dim_artifact,
        partitioned_events_artifact,
    )

    fact = partitioned_events_artifact(spark, sf_dir)
    busy = day_dim_artifact(spark, sf_dir).filter(
        F.expr("10 * n_users >= 8 * max_users")
    )
    return (
        fact.join(busy.select("event_day", "n_users"), "event_day")
        .groupBy("event_day")
        .agg(
            F.count(F.lit(1)).alias("n_events_on_day"),
            F.max("n_users").alias("n_users"),
        )
        .orderBy("event_day")
    )


@query("p21_weighted_reservoir")
def p21_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED corpus sample (50 docs, probability ~ length) via the
    A-Res order statistic (operators/sampling.weighted_reservoir) —
    the one-pass weighted-without-replacement draw a curation
    pipeline uses to eyeball or evaluate a corpus without loading it:
    p15's PPS fixes per-stratum counts; this draws one global sample
    whose k smallest exponential-race scores are provably
    weight-proportional, and whose top-k MERGES across partitions
    (split-invariance pytest-asserted) — at 100 TB it is
    per-partition TakeOrdered + a k-row driver merge, no shuffle.

    Scores emitted as exact floor-ppb integers (floor is
    rounding-mode-free on both engines; both compute ln on the SAME
    md5-rational doubles).
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        weighted_reservoir,
    )

    docs = table(spark, sf_dir, "documents")
    return weighted_reservoir(
        docs, "n_chars", 50, id_col="doc_id", seed=7
    ).select(
        "doc_id",
        "weight",
        F.expr("CAST(floor(score * 1000000000) AS BIGINT)").alias(
            "score_ppb"
        ),
    )


_DOC_COUNT_CACHE: dict[tuple[str, int, int], int] = {}


def _corpus_doc_count(spark: SparkSession, sf_dir: str) -> int:
    """documents row count, cached on the file's identity (realpath,
    mtime, size) — a regenerated corpus misses the cache."""
    import os

    f = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(f)
    key = (os.path.realpath(f), st.st_mtime_ns, st.st_size)
    if key not in _DOC_COUNT_CACHE:
        _DOC_COUNT_CACHE[key] = table(spark, sf_dir, "documents").count()
    return _DOC_COUNT_CACHE[key]


@query("q105_python_datasource")
def q105_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM PYTHON DATA SOURCE surface (Spark 4 Python Data Source
    API, sources/pyds.py): a deterministic synthetic-documents
    generator registered as a real format and read with PARTITIONED
    parallelism (8 generator slices scheduled like any scan) — the
    "bespoke connector without a JVM jar" capability, sized to the
    corpus (n = 2x the documents table so the lane scales with sf).
    Every generated field is md5 arithmetic on the row index, so the
    DuckDB oracle replays the entire table from generate_series and
    the rollup matches bit-for-bit — the source is VERIFIED, not just
    demonstrated.

    Integration surface, not a hot path (rows cross the Python
    worker boundary — right for simulation/backfill/prototyping,
    wrong for a 100 TB scan; the parquet lanes are the hot path).
    """
    from etl_sql_and_pyspark_developement__spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    # Cached per source identity: the sizing count is one parquet
    # metadata job, but the lane reruns in every bench pass and the
    # corpus never changes under it (round-6 review note).
    n = _corpus_doc_count(spark, sf_dir) * 2
    synth = (
        spark.read.format("graft_synth_docs")
        .option("n", str(n))
        .option("parts", "8")
        .load()
    )
    return (
        synth.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("score_ppm").alias("max_score_ppm"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


@query("d22_incremental_dedup")
def d22_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ingestion dedup — the production question d03
    cannot answer: "which of TODAY'S documents are near-dups of
    anything ALREADY INGESTED", without re-signing the corpus. The
    base corpus's LSH band index is a build-once artifact
    (io.minhash_index_artifact); the delta batch (doc_id % 10 = 7 —
    the held-out tenth standing in for today's crawl) is signed
    fresh, candidates are ONE equi-join of delta bands against the
    committed index, and the exact-Jaccard verify shingles ONLY the
    base docs that matched a band (semi-join first) — verify work
    proportional to candidates, never to corpus size
    (operators/dedup.delta_dedup_matches).

    Emits each rejected delta doc with its BEST base match (max
    jaccard, min base id tie-break) — the admission decision + the
    evidence. At 100 TB this is the daily-crawl gate: index amortized
    across every batch, per-batch cost ~ batch size.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        delta_dedup_matches,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        minhash_index_artifact,
    )

    docs = table(spark, sf_dir, "documents")
    base = docs.filter("doc_id % 10 != 7")
    delta = docs.filter("doc_id % 10 = 7")
    matches = delta_dedup_matches(
        base,
        delta,
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        base_bands=minhash_index_artifact(spark, sf_dir),
    )
    w = Window.partitionBy("delta_doc").orderBy(
        F.desc("jaccard"), F.asc("base_doc")
    )
    return (
        matches.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("delta_doc", "base_doc", "jaccard")
        .orderBy("delta_doc")
    )


@query("t24_bpe_compression")
def t24_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAIN -> APPLY -> MEASURE: the compression number (merged
    symbols per corpus char, ppm — lower = better compression) that
    decides whether a merge budget is worth its vocab slots — t23
    ships the merge table; this lane
    applies it back to the dictionary as ONE chained codegen replace
    projection and aggregates corpus-weighted chars vs symbols into a
    single exact-integer row (operators/textstats.bpe_compression;
    DECIMAL(38)/HUGEINT on the ppm cross-multiply). The DuckDB oracle
    extends t23's staged unroll with the applied-dictionary aggregate,
    so train AND apply are value-verified end to end.
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_compression,
    )

    return bpe_compression(table(spark, sf_dir, "documents"), n_merges=4)


@query("q107_salted_join")
def q107_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT SALTED JOIN driver lane — the fourth 100 TB join
    defense as a value-verified surface (q42 salts AGGREGATIONS, q100
    buckets, q101 lets AQE split at runtime; this is the pre-planned
    answer for a KNOWN pathological key joining a dim too big to
    broadcast): ~40% of orders are attributed to one house-account
    customer (the classic null-key/megacity shape), and
    operators/salt.salted_join scatters that hot key across 8
    sub-partitions by replicating the dim row 8x — the salt rides IN
    the join key, so no single shuffle partition receives the hot
    key's full 40%.

    The merge hint keeps the local 1.5k-row customer dim from
    broadcasting, so the demonstrated plan is the one a 100 TB run
    (15M-row dim, hot fact key) would produce; the plan test asserts
    a SortMergeJoin whose keys include __salt and no broadcast on
    this join. The oracle is the plain unsalted join — salting
    changes the PLAN, never the result (q100/q101's discipline).

    Reference parity: every reference workload joins the fact to
    3-6 dims (pyspark/User Engagement Funnel Analysis.py:8-13);
    at 100 TB a hot customer key makes that join's shuffle the
    bottleneck — this is the lane that shows the repair.
    """
    from etl_sql_and_pyspark_developement__spark.operators.salt import (
        salted_join,
    )

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    fact = orders.select(
        F.expr(
            "CASE WHEN pmod(o_custkey, 10) < 4 THEN 1"
            " ELSE o_custkey END"
        ).alias("acct_key"),
        "o_totalprice",
    )
    dim = customer.select(
        F.col("c_custkey").alias("acct_key"), "c_mktsegment"
    ).hint("merge")
    joined = salted_join(fact, dim, "acct_key", salt=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("c_mktsegment")
    )


@query("q109_session_window")
def q109_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE BATCH session_window twin of q03's LAG+cumsum
    sessionization — the same SQL-surface-completion move q76 made
    for recursive CTEs: Spark's session_window() works in plain batch
    groupBy (not just streaming), and this lane value-verifies it
    against a LAG-based oracle so a user can pick either form.

    Boundary semantics MATCH q03 exactly, including at the gap:
    session_window coalesces TOUCHING windows, so an event landing
    exactly at the previous event's ts + 30min merges into the same
    session — the same strict `diff > 1800` break q03 uses (measured
    and pinned by a planted pytest; a half-open reading of the window
    interval would predict a split, and would be wrong).

    Plan note (measured, PLANS.md): session_window plans as ONE
    shuffle on user_id + a sort-based merging aggregate
    (UpdatingSessionsExec); the LAG+cumsum form pays the same single
    shuffle but TWO window passes + a final hash aggregate over the
    exploded per-event frame. Same exchange count, fewer passes —
    session_window wins modestly and reads better; both hold at
    100 TB because the shuffle key is the user, never the session.

    Reference parity: pyspark/Binge-Watching Behavior Analysis.py:5-17
    (gap-based session grouping), re-expressed through the native
    operator.
    """
    ev = table(spark, sf_dir, "events")
    per_session = (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (
                    F.max(F.col("ts").cast("double"))
                    - F.min(F.col("ts").cast("double"))
                )
                / 60.0
            ).alias("minutes"),
            F.sum("value").alias("sess_value"),
        )
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_session_events"),
            F.round(F.avg("minutes"), 4).alias("avg_session_minutes"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("sess_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@query("q106_cbo_stats_join")
def q106_cbo_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATISTICS-DRIVEN PLANNING lane — the last 100 TB plan lever
    after AQE skew (q101), runtime DPP (q104), and bucketing (q100):
    every broadcast decision so far rode FILE-SIZE heuristics, which
    cannot see through a filter — the default stats visitor passes a
    Filter's size through unchanged, so a 2 TB dim filtered to a 2 MB
    sliver still plans as a shuffle join. With `ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS` on the dim (io.analyzed_part_table)
    and spark.sql.cbo.enabled, FilterEstimation prices `p_size <= 3`
    from min/max/ndv and the planner broadcasts the sliver BEFORE any
    shuffle is planned — AQE's runtime SMJ->BHJ conversion only kicks
    in after the map-side shuffle files are already written, so the
    static, stats-driven call is strictly cheaper (measured + plan
    contract in tests/test_plans.py: CBO on + stats => initial-plan
    BroadcastHashJoin under a threshold the RAW dim size exceeds; CBO
    off, same threshold => SortMergeJoin).

    The lane itself runs under production confs and its VALUES are
    conf-invariant (q100/q101/q104's discipline — the oracle is the
    plain join); what the stats change is only WHEN the planner can
    make the right call. PLANS.md records what CBO did and did not
    change under AQE.

    Reference parity: every reference workload joins 3-6 tables
    behind selective filters (pyspark/User Engagement Funnel
    Analysis.py:8-13 filters users on signup_date before a 4-table
    join) — at 100 TB, join ORDER and STRATEGY on the filtered dims
    are the entire cost, and only statistics let the planner see
    post-filter cardinalities.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        analyzed_part_table,
    )

    dim_name = analyzed_part_table(spark, sf_dir)
    small_parts = (
        spark.table(dim_name)
        .filter(F.col("p_size") <= 3)
        .select("p_partkey", "p_brand")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(small_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("CAST(sum(l_quantity) AS BIGINT)").alias("sum_qty"),
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
                " * 10000, 0) AS BIGINT)) AS BIGINT)"
            ).alias("rev_e4"),
        )
        .orderBy("p_brand")
    )


@query("q108_rowgroup_skipping")
def q108_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZONE-MAP / ROW-GROUP SKIPPING measurement lane — the min/max-
    stats complement of q97's directory pruning and q104's runtime
    pruning: q70 lays out Z-ordered files and reports bbox tightness,
    but nothing yet MEASURED that a selective predicate over a
    clustered layout decodes fewer row groups. This lane reads the
    range-clustered orders twin (io.orders_layout_twins — each file
    packs a tight o_totalprice span) behind a narrow pushed predicate;
    the metrics contract in tests/test_plans.py runs a decile band
    (wide enough that every round-robin file must contain matches)
    against both twins and asserts the clustered scan's numOutputRows
    collapses to ~2/n_files of the corpus while the unclustered twin
    decodes every row (parquet skips a row group when the pushed
    range misses its footer min/max — the reader never touches the
    pages; Spark's Filter re-evaluates survivors, so VALUES are
    layout-invariant, which is what the plain-orders oracle proves).

    At 100 TB: the predicate is the query, the layout is the DBA's
    CLUSTER BY — a 0.1% totalprice band over a clustered table costs
    ~0.1% of the IO; over an unclustered one it costs a full decode.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        orders_layout_twins,
    )

    clustered, _ = orders_layout_twins(spark, sf_dir)
    return (
        cached_parquet(spark, clustered)
        .filter(F.col("o_totalprice") < 2000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query("q110_bloom_filter_join")
def q110_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME BLOOM-FILTER JOIN PRUNING promoted to a driver-verified
    lane (the q107 move applied to the last session-helper-only join
    defense): for a shuffle join whose build side carries a selective
    filter, Catalyst's InjectRuntimeFilter plants a bloom_filter_agg
    subquery on the build keys and a might_contain predicate on the
    probe side — fact rows that cannot match die AT THE SCAN, before
    paying the shuffle. At 100 TB this turns "shuffle all of lineitem"
    into "shuffle the ~20% whose orders survive the priority filter",
    with no bucketing, no manual broadcast, no relayout.

    The lane's shape is the one the rule wants: a filtered dim
    (orders at 1-URGENT) equi-joined to the big fact on the fact's
    key. Locally the filtered dim broadcasts (the rule only fires for
    shuffle joins, and only past size thresholds tuned for
    warehouse-scale scans), so the firing contract lives in
    tests/test_plans.py: with session.enable_runtime_bloom_filters
    armed, broadcast off, and the application-side threshold scaled
    to the local corpus, THIS query's plan carries might_contain +
    bloom_filter_agg; disabled, neither appears. Values are
    conf-invariant (q101/q106's discipline) — the oracle is the
    plain filtered join.

    Reference parity: pyspark/User Engagement Funnel Analysis.py:8-13
    (facts joined behind selective dim filters) — the shape whose
    shuffle volume the runtime filter collapses at scale.
    """
    li = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
    )
    return (
        li.join(dim, li.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("CAST(sum(l_quantity) AS BIGINT)").alias("sum_qty"),
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
                " * 10000, 0) AS BIGINT)) AS BIGINT)"
            ).alias("rev_e4"),
        )
        .orderBy("l_returnflag")
    )


@query("q111_window_group_limit")
def q111_window_group_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOW GROUP LIMIT pushdown lane — the optimizer lever behind
    every "top-k per group" query (q21's shape): a rank()-filter over
    a per-customer window would naively shuffle EVERY order, sort each
    customer's full history, rank it, and only then discard rank > 3.
    Spark's InferWindowGroupLimit instead plants a WindowGroupLimit
    node on BOTH sides of the exchange: the map side keeps at most k
    rows per group per partition BEFORE the shuffle, so the exchange
    moves O(k · groups) rows instead of the whole fact table — at
    100 TB the difference between shuffling every order ever placed
    and shuffling three per customer.

    The plan contract (tests/test_plans.py) asserts the node appears
    twice (partial below the exchange, final above) and disappears
    when spark.sql.optimizer.windowGroupLimitThreshold is -1 — the
    flip isolates the rule the same way q106 isolates CBO. rank()
    (not row_number) exercises the with-ties variant: orders tied on
    cents share a rank and ALL survive the filter, deterministically.

    Reference parity: pyspark/Geographic Content Preference Mapping.py
    (RANK-per-region top content) — the reference's top-k-per-group
    workloads all compile to exactly this shape.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("cents"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
                "cents"
            ),
        )
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "cents")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@query("q112_exchange_reuse")
def q112_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCHANGE REUSE lane — Catalyst's answer to "one derived frame,
    many consumers" INSIDE a single plan: the daily rollup below feeds
    three join branches (today, yesterday via date_sub 1, last week
    via date_sub 7), and ReuseExchange collapses plan-identical
    shuffle subtrees so the events scan + partial aggregate execute
    ONCE for the shifted branches instead of once per branch
    (ReusedExchange asserted in the final adaptive plan in
    tests/test_plans.py). At 100 TB the reused subtree is a full fact
    scan + shuffle — reuse is the difference between one pass and N.

    Measured boundaries of the rule (PLANS.md): reuse requires
    CANONICALLY IDENTICAL subtrees — the two shifted consumers (whose
    only difference, the date_sub constant, sits ABOVE the exchange
    in the join key) share one exchange, while the probe branch's
    inferred IsNotNull(date_sub(day, k)) constraints sink BELOW its
    exchange and break identity with them; and UNION arms do not
    stage-share under AQE at all (the round-6 finding that keeps
    localCheckpoint for multi-branch frames). Self-joins get reuse
    for free; unions need explicit materialization.

    q17 covers the pure adjacent-day LAG (strictly better when a
    window CAN express the comparison); this lane is the general
    mechanism for self-join shapes a window can't express. Inner
    joins by design: emitted days are exactly those with both a
    yesterday and a week-ago row (the oracle mirrors this).

    Reference parity: SQL/Social Network Effects on Content
    Virality.txt (day-over-day AND week-over-week growth baselines).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)"
        ).alias("cents"),
    )
    cur, prev, wk = daily.alias("cur"), daily.alias("prev"), daily.alias("wk")
    return (
        cur.join(prev, F.expr("prev.day = date_sub(cur.day, 1)"), "inner")
        .join(wk, F.expr("wk.day = date_sub(cur.day, 7)"), "inner")
        .select(
            F.date_format(F.col("cur.day"), "yyyy-MM-dd").alias("day"),
            F.col("cur.n").alias("n"),
            F.col("cur.cents").alias("cents"),
            F.col("prev.n").alias("prev_n"),
            F.col("wk.n").alias("wow_n"),
        )
        .orderBy("day")
    )


@query("t25_heldout_perplexity")
def t25_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT perplexity-proxy evaluation — the leakage-free
    measurement the LM-filter lanes were missing: t10/t11 score every
    document against corpus counts that INCLUDE it, so thresholds
    tuned on those scores have seen their own test set. This lane
    splits on the p03 md5 bucket (test = 10%), trains an add-one-
    smoothed bigram LM on the train half only, and scores each test
    doc's mean integer smoothed surprisal + unseen-transition count —
    exactly the quantity a perplexity gate thresholds, evaluated the
    way a gate will actually meet data it has never counted
    (operators/textstats.heldout_bigram_eval; the calibration
    discipline of t18/s08/d21 applied to the t10/t11 axis).

    Reference parity: the reference's train/score separation shape —
    pyspark/Predictive Content Performance Modeling.py builds features
    on historical windows and scores forward; here the split is by
    content identity instead of time.
    """
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        heldout_bigram_eval,
    )

    docs = table(spark, sf_dir, "documents")
    return heldout_bigram_eval(docs).orderBy("doc_id")


@query("q113_python_ds_pushdown")
def q113_python_ds_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PYTHON DATA SOURCE FILTER PUSHDOWN (Spark 4.1, SPARK-50556) —
    q105's connector surface grown the capability that makes a real
    connector usable at scale: the planner hands the reader the
    conjunctive filters, the reader KEEPS what the backing source can
    evaluate natively and yields back the rest. Two tiers, mirroring
    a database connector (sources/pyds.SynthDocsPushReader):
    doc_id range predicates prune generator PARTITIONS (pruned slices
    are never scheduled — 4 of 8 here, asserted via getNumPartitions),
    and the lang equality applies inside read(), so filtered rows
    never cross the Python->JVM boundary. Consumed filters land in
    the scan's PushedFilters (plan-asserted); Spark re-evaluates only
    what the reader yielded back.

    spark.sql.python.filterPushdown.enabled is an ENGINE DEFAULT
    (session.get_spark/configure_existing) — Spark refuses to plan a
    pushFilters-implementing reader while it is off (gate pinned in
    tests/test_io.py), planning is lazy so a per-lane set/restore
    would flip it back before the caller's action plans, and it is a
    no-op for readers without pushFilters. The set below is an
    idempotent guard for bare sessions; the baseline source
    (q105/st33) deliberately does NOT implement pushFilters so it
    stays plannable even under non-engine confs.

    Generation is md5-on-index (the q105 contract), so the DuckDB
    oracle replays the filtered table from generate_series and the
    pushdown path is value-verified: pushing filters must change
    WHERE rows die, never which survive. Fixed n=1000 — a connector
    demo lane, corpus-size-independent by design.
    """
    from etl_sql_and_pyspark_developement__spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    synth = (
        spark.read.format("graft_synth_docs_push")
        .option("n", "1000")
        .option("parts", "8")
        .load()
    )
    return (
        synth.filter(
            (F.col("lang") == "de")
            & (F.col("doc_id") >= 250)
            & (F.col("doc_id") < 750)
        )
        .groupBy(F.expr("doc_id div 250").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("score_ppm").alias("max_score_ppm"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("band")
    )


@query("q114_insert_overwrite_dynamic")
def q114_insert_overwrite_dynamic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL INSERT OVERWRITE with DYNAMIC PARTITION scoping — the WRITE
    side of the SQL-text surface family (q30/q47-q49/q94-q96 cover
    reads; the reference is an ETL project, and its output layer is
    exactly this statement): a day-partitioned rollup table is
    maintained by rerunning ONLY the trailing 7-day window — INSERT
    OVERWRITE under partitionOverwriteMode=dynamic replaces exactly
    the partitions the SELECT produces and leaves history untouched
    (static mode, the default, would TRUNCATE the whole table first
    — the classic production data-loss foot-gun, pinned in
    tests/test_io.py). Rerunning is idempotent; a corrupted trailing
    partition is repaired by the next run; out-of-window partitions
    are provably not rewritten (file mtimes asserted).

    The conf flips around the eagerly-executed INSERT only (SQL DML
    runs at spark.sql time, not lazily), so nothing leaks into other
    lanes' planning. Values are maintenance-invariant: the oracle is
    the plain full-history rollup — refresh changes WHICH FILES hold
    the rows, never the rows (q100/q108's discipline applied to the
    write path).

    At 100 TB: the nightly job rewrites 7 partitions of a 3000-day
    lake instead of 3000 — dynamic overwrite is why backfill cost
    tracks the late-data window, not table size.

    Reference parity: every reference workload materializes a final
    rollup; SQL/Seasonal Viewing Pattern Analysis.txt's monthly
    aggregates are the shape that gets maintained this way.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        maintained_daily_table,
    )

    name, cutoff = maintained_daily_table(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    (
        ev.filter(F.date_format("ts", "yyyy-MM-dd") >= F.lit(cutoff))
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(sum(CAST(round(value * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents"),
        )
        .createOrReplaceTempView("q114_refresh_window")
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(mode_key)
    cols = ", ".join(spark.table(name).columns)
    try:
        spark.conf.set(mode_key, "dynamic")
        spark.sql(
            f"INSERT OVERWRITE TABLE {name}"
            f" SELECT {cols} FROM q114_refresh_window"
        )
    finally:
        spark.conf.set(mode_key, old)
    return spark.table(name).orderBy("day", "event_type")


@query("d23_lsh_band_sweep")
def d23_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BANDING SWEEP — the r x b trade measured on real data
    (operators/dedup.lsh_band_sweep): d21 scores THE shipped banding
    (4 rows x 32 bands); this re-bands the same 128 minhash values as
    2x64 / 4x32 / 8x16 and reports each configuration's candidate
    volume, recall, and precision against the same exact
    threshold-Jaccard ground truth on the same deterministic
    2000-doc sample (fixed-COUNT, d21's bounded-work discipline).
    The output is the tuning table a dedup owner reads before
    committing a 100 TB pass: 2 rows/band buys recall with verify
    work, 8 rows/band buys precision with misses — and the measured
    curve, not the textbook formula, is what the corpus actually
    pays. Signatures build once; each config is a narrow re-banding
    + one bucketed self-join on the sample.
    """
    from etl_sql_and_pyspark_developement__spark.operators.dedup import (
        lsh_band_sweep,
    )

    docs = table(spark, sf_dir, "documents")
    # sample NOT localCheckpointed (r12): lsh_band_sweep's signature
    # and truth pipelines both ride its internally-shared shingle
    # frame, so the sample has exactly one consumer — the old LC was
    # one eager job for nothing.
    sample = (
        docs.select("doc_id", "text")
        .orderBy(F.md5(F.col("doc_id").cast("string")))
        .limit(2000)
    )
    return lsh_band_sweep(sample)


@query("q115_quarantine_ingest")
def q115_quarantine_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRUPT-RECORD QUARANTINE INGEST as a driver-verified lane —
    the never-fail / never-silently-null crawl-ingest contract
    (io.read_jsonl_quarantine, until now pytest-only): a JSONL feed
    with deterministically planted type violations (every 97th
    event_id carries a string where the schema declares DOUBLE) is
    read PERMISSIVE with a _corrupt_record marker; malformed lines
    route whole to the quarantine side (raw text preserved for
    replay), clean lines roll up per event type with the quarantine
    count riding every row — the ingest health readout an operator
    alerts on. One parse serves both sides: the reader
    localCheckpoints the parsed frame before splitting, which both
    sidesteps Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN refusal (the
    quarantine count would otherwise be a corrupt-column-only file
    query) and makes this lane's returned plan cache-lifetime-
    independent — spark.catalog.clearCache() cannot resurrect the
    analysis error because the lineage is cut at a materialized RDD.

    The corruption rule is a pure function of event_id, so the
    oracle replays clean/quarantine membership exactly from the
    events table — the quarantine PATH is value-verified, not just
    exercised.

    Reference parity: the reference ingests viewing_history from
    exports (pyspark/* all start from spark.read) — at 100 TB feed
    scale, malformed lines are a WHEN, and a job that dies or
    silently nulls them is the difference between a late dashboard
    and silent data loss.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_sql_and_pyspark_developement__spark.sources.io import (
        jsonl_feed_fixture,
        read_jsonl_quarantine,
    )

    path = jsonl_feed_fixture(spark, sf_dir)
    schema = StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    clean, quarantine = read_jsonl_quarantine(spark, path, schema)
    qn = quarantine.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quarantined")
    )
    return (
        clean.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(sum(CAST(round(value * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents"),
        )
        .crossJoin(F.broadcast(qn))
        .orderBy("event_type")
    )


@query("q116_orc_interop")
def q116_orc_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC FORMAT INTEROP driver-verified — the io.read_orc/write_orc
    path (until now unit-tested only) promoted to an oracle-backed
    lane: orders re-staged ONCE as ORC (io.orc_orders_fixture), then
    read back behind a pushed date-range + priority rollup. Values
    are format-invariant — the oracle reads the parquet truth — so
    the ORC round-trip (writer encoding, reader decoding, predicate
    pushdown through the ORC scan, asserted in tests/test_plans.py)
    is value-verified, not just exercised. The lane a reference user
    on an ORC-standardized warehouse (Hive heritage) checks first.

    Reference parity: the reference reads exported viewing-history
    tables; warehouses that grew out of Hive ship them as ORC.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        orc_orders_fixture,
        read_orc,
    )

    path = orc_orders_fixture(spark, sf_dir)
    orders = read_orc(spark, path)
    return (
        orders.filter(F.col("o_orderdate") >= "1996-01-01")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query("s10_ivf_pq_ann")
def s10_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ COMPOSED ANN — the production billion-vector index
    shape (FAISS IVFPQ), built by composing the two already-verified
    stages: the IVF coarse quantizer (s03's machinery) prunes the
    SEARCH SPACE to 4 of 16 inverted lists per query; inside the
    probed lists the PQ codes (s06's machinery) prune the MEMORY —
    the ADC scan reads 4 small codes per candidate instead of 64
    floats, then an exact cosine re-rank of the ADC top-20. Neither
    stage alone carries 10⁹ vectors (IVF still reads full vectors in
    probed lists; PQ alone still scans every code); composed, scan
    cost is ~(n_probe/n_clusters) of the corpus at m_sub bytes per
    vector — the RAM story AND the scan story at once
    (operators/similarity.ann_ivf_pq_topk).

    Both quantizers are deterministic (lowest-id seeds, argmin ties
    to lower id/code, fixed-order ADC sum), so the DuckDB oracle
    CHAINS the s03 and s06 mirrors value-for-value — the composition
    is verified, not just each part.
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        ann_ivf_pq_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ann_ivf_pq_topk(
        emb, queries_df, k=5, n_clusters=16, n_probe=4, dim=64,
        train_iterations=1, m_sub=4, k_codes=8, refine_n=20,
    ).orderBy("query_id", "rnk")


@query("p22_leakage_safe_split")
def p22_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/test split — the near-dup analogue of p20's
    group-aware folds, closing the loop d09 opens: d09 MEASURES
    benchmark contamination after a doc-keyed split; this lane splits
    by near-dup COMPONENT (operators/sampling.leakage_safe_split over
    the shared verified-pairs artifact) so paraphrase clusters land
    whole in one split and ZERO verified pairs can cross by
    construction. Output: per-split doc/component/char mass plus two
    audit constants riding every row — pairs crossing under the
    grouped rule (0, the guarantee) and under the naive doc-keyed
    rule (what p03 WOULD have leaked into the eval set).

    At 100 TB: the components are d06's pointer-jumping rounds over
    PAIRS only, labeling is one id-keyed join, buckets are per-row
    codegen — the split costs one dedup pass the pipeline already
    runs.
    """
    from etl_sql_and_pyspark_developement__spark.operators.sampling import (
        leakage_safe_split,
    )
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        minhash_pairs_artifact,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_pairs_artifact(spark, sf_dir, threshold=0.5)
    labeled = leakage_safe_split(
        docs.select("doc_id", "n_chars"), pairs
    ).localCheckpoint()
    sides = labeled.select("doc_id", "split", "split_naive")
    pa = pairs.select("doc_a", "doc_b").join(
        sides.select(
            F.col("doc_id").alias("doc_a"),
            F.col("split").alias("ga"),
            F.col("split_naive").alias("na"),
        ),
        "doc_a",
    ).join(
        sides.select(
            F.col("doc_id").alias("doc_b"),
            F.col("split").alias("gb"),
            F.col("split_naive").alias("nb"),
        ),
        "doc_b",
    )
    audit = pa.agg(
        F.expr(
            "CAST(sum(CASE WHEN ga != gb THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("cross_pairs_grouped"),
        F.expr(
            "CAST(sum(CASE WHEN na != nb THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("cross_pairs_naive"),
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("component").alias("n_components"),
            F.expr("CAST(sum(n_chars) AS BIGINT)").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(audit))
        .orderBy("split")
    )


@query("q117_compaction_maintenance")
def q117_compaction_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION driver-verified — the third lake
    MAINTENANCE surface beside q70's Z-order layout and q114's
    partition rebuild (io.compact_parquet, until now unit-tested
    only): a deliberately fragmented events dataset (64 per-batch-
    sink-sized files) is rewritten ONCE into few ts-range-clustered
    files, and this lane reads the COMPACTED result behind a pushed
    ts-range predicate. Values are layout-invariant (the oracle reads
    the original events), which is exactly the compaction contract:
    the rewrite changes file count, file stats, and scan cost — never
    rows. The file-count collapse (64 -> few) and the clustered twin
    skipping files under the pushed range are asserted in
    tests/test_io.py.

    At 100 TB: streaming sinks leave thousands of KB files per
    partition and scan cost becomes file-OPEN cost (driver listing +
    a footer read per file); the periodic compaction pass is what
    keeps the q108 zone-map story true over time.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        compacted_events_fixture,
    )

    _, compacted = compacted_events_fixture(spark, sf_dir)
    ev = cached_parquet(spark, compacted)
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr(
                "CAST(sum(CAST(round(value * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents"),
        )
        .orderBy("event_type")
    )


@query("q118_udtf_lateral")
def q118_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PYTHON UDTF + LATERAL correlation — the user-extensible
    row-expansion surface (functions/udtfs.SplitInstallments): each
    final-year order's total cents split into n = (o_orderkey % 3) + 1
    installments by an Arrow-optimized `@udtf`, invoked
    LATERAL-correlated in SQL (`FROM orders, LATERAL
    split_installments(o_orderkey, cents)`) so Catalyst plans the
    expansion as a generator stage over the pruned scan; the rollup
    then audits the schedule per installment slot. Every output value
    is integer arithmetic on the inputs, so the DuckDB oracle replays
    the expansion exactly via unnest(generate_series(1, n)) — the
    UDTF path is value-verified end to end (conservation:
    sum(total_cents) over slots == sum(cents) of the input).

    The plan contract (tests/test_plans.py) pins the generator node
    ([Arrow]EvalPythonUDTF) AND that the date filter still reaches
    the parquet scan below it.

    Reference parity: pyspark/Content Affinity and Cross-Genre
    Analysis.py expands each viewing row into genre pairs by hand;
    a UDTF is that expansion as a reusable, schema-declared operator.

    At 100 TB: a generator pipelines per-partition (no shuffle of its
    own) and Arrow batches amortize the Python boundary; output size
    is input x expansion factor, independent of corpus layout. Priced
    honestly: UDTF eval is still per-ROW Python (~65us/row measured,
    plus ~3s fixed Python-stage cost per action) — the surface is for
    expansions no expression can say; a split this regular would ship
    as the q41 higher-order-function shape in production, so the lane
    runs it over the bounded final year, not the full fact table.
    """
    from etl_sql_and_pyspark_developement__spark.functions.udtfs import (
        SplitInstallments,
    )

    spark.udtf.register("split_installments", SplitInstallments)
    (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-08-01")
        .select(
            "o_orderkey",
            F.expr(
                "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
            ).alias("cents"),
        )
        .createOrReplaceTempView("q118_orders")
    )
    return spark.sql(
        """
        SELECT s.inst_no,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(s.inst_cents) AS BIGINT) AS total_cents,
               CAST(min(s.inst_cents) AS BIGINT) AS min_cents,
               CAST(max(s.inst_cents) AS BIGINT) AS max_cents
        FROM q118_orders o,
             LATERAL split_installments(o.o_orderkey, o.cents) s
        GROUP BY s.inst_no
        ORDER BY s.inst_no
        """
    )


@query("q121_approx_top_k")
def q121_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAVY-HITTERS SKETCH lane — Spark 4's `approx_top_k` aggregate
    beside q44's single-top-key profile and st26's streaming
    Misra-Gries: one pass, one partial-aggregable sketch, top items
    with estimated counts. The q27/q51 sketch discipline applies:
    report the ESTIMATE next to the EXACT count so the gap is
    measured, not assumed — here maxItemsTracked (10000) exceeds
    c_nationkey's cardinality (25), the regime where the sketch is
    provably exact (no evictions ever fire), so est_gap == 0 on every
    row and the DuckDB oracle replays the whole frame from plain
    counts. The genuinely-approximate regime (capacity << distinct)
    is bounds-tested in tests/test_functions.py, where exactness
    can't be promised row-for-row.

    At 100 TB: the sketch is a fixed-size partial aggregate (map-side
    combine, one small state per partition), vs the exact groupBy's
    full shuffle of every distinct key — the point of carrying both
    here is knowing WHEN the cheap one is safe.

    Reference parity: every "top genres / top devices" rollup in the
    reference (pyspark/Cross-Platform User Behavior Analysis.py) is a
    heavy-hitters query at heart.
    """
    cust = table(spark, sf_dir, "customer")
    sketch = (
        cust.agg(F.expr("approx_top_k(c_nationkey, 30, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").cast("long").alias("nationkey"),
            F.col("e.count").cast("long").alias("est_n"),
        )
    )
    exact = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return (
        sketch.join(exact, "nationkey")
        .select(
            "nationkey",
            "est_n",
            "exact_n",
            (F.col("est_n") - F.col("exact_n")).alias("est_gap"),
        )
        .orderBy("nationkey")
    )


@query("q120_sql_scripting")
def q120_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING surface (SPARK-48338, GA in Spark 4) — the
    control-flow axis of the SQL-text family the way q76 covered
    recursion and q96 covered session variables: one BEGIN...END
    script DECLAREs a threshold, WHILE-loops a doubling search until
    fewer than 1000 orders exceed it (the loop condition is a scalar
    subquery re-evaluated per iteration), IF-classifies the resulting
    tier, and returns the rollup of the orders above thr/2 — the last
    threshold that kept >= 1000 orders, so the output is non-empty by
    construction — with the converged threshold riding every row (an
    empty result would make the value comparison vacuous). The search
    is a pure
    function of the data (start 100, x2 steps, data-derived stop), so
    the DuckDB oracle replays it SET-BASED: min k in 0..60 with
    count(o_totalprice > 100*2^k) < 1000 — the script's iterative
    answer and the oracle's closed form must agree exactly
    (powers of two are exact doubles; no rounding drift possible).

    Scale note: the WHILE loop is DRIVER-side control flow — each
    iteration is one full aggregate, and the iteration count is
    log2(price range) ~ 12, not data size. At 100 TB you'd replace
    the search with one approx_percentile pass (q14's machinery);
    the lane's point is the scripting SURFACE a migrating SQL
    warehouse user expects (procedural refreshes like q114's, batch
    maintenance, backfill loops), with its cost model stated.

    Reference parity: SQL/*.txt are single statements only because
    the warehouse running them lacked procedures; every reference
    pipeline that reruns a query at escalating thresholds (churn risk
    tiers in SQL/Churn Prediction and Risk Analysis.txt) is this
    shape.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("q120_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 100.0;
          DECLARE tier STRING DEFAULT 'low';
          WHILE (SELECT count(*) FROM q120_orders
                 WHERE o_totalprice > thr) >= 1000 DO
            SET thr = thr * 2;
          END WHILE;
          IF thr >= 102400.0 THEN
            SET tier = 'high';
          END IF;
          -- filter on thr/2 (the LAST threshold that kept >= 1000
          -- orders), not thr: thr itself overshoots by construction,
          -- which left this SELECT empty at every tested scale — and
          -- an empty frame hash-matches an empty oracle no matter
          -- what threshold the loop converged to. thr/2 guarantees
          -- >= 1000 surviving rows, so the converged threshold and
          -- tier riding every row are ACTUALLY value-compared.
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) AS rev_cents,
                 CAST(round(thr, 2) AS DOUBLE) AS threshold,
                 tier
          FROM q120_orders
          WHERE o_totalprice > thr / 2
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority;
        END
        """
    )


@query("q119_cbo_join_reorder")
def q119_cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO JOIN REORDERING lane — the second statistics lever after
    q106's broadcast-through-filter: the SQL is written in the
    pessimal left-deep order (fact ⋈ fact first — lineitem ⋈ orders —
    with the selective customer filter LAST), the shape every
    hand-migrated warehouse query arrives in. With table + column
    stats on all three relations (io.analyzed_star_tables) and
    spark.sql.cbo.joinReorder.enabled, JoinReorderDP re-prices the
    join tree from cardinality estimates and rotates the filtered
    customer ⋈ orders join FIRST, so lineitem joins a pre-shrunk
    build side instead of the full orders table. The flip is isolated
    in tests/test_plans.py on the optimized logical plan (reorder on
    vs off, q106's flip-isolation discipline); the lane's VALUES are
    join-order-invariant, so the oracle is the plain 3-table join.

    At 100 TB: a mis-ordered 3-6 table chain shuffles the fact table
    against UNFILTERED intermediates — join order is the single
    largest cost decision the planner makes, and only statistics let
    it see post-filter cardinalities before any shuffle runs.

    Reference parity: every reference workload chains 3-6 joins
    behind selective filters in hand-chosen order (pyspark/User
    Engagement Funnel Analysis.py:8-13); reordering is what makes
    that order a non-decision for the migrating user.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        analyzed_star_tables,
    )

    li_name, ord_name, cust_name = analyzed_star_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM {li_name} l
        JOIN {ord_name} o ON l.l_orderkey = o.o_orderkey
        JOIN {cust_name} c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@query("q122_xml_interop")
def q122_xml_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML FORMAT INTEROP driver-verified — Spark 4's NATIVE xml
    source (SPARK-44265; q116's ORC discipline applied to the third
    interchange format): orders re-staged once as <order> elements
    (io.xml_orders_fixture), read back with an EXPLICIT schema (no
    inference pass) into a monthly status rollup. Values are
    format-invariant — the oracle reads the parquet truth — so the
    XML round-trip (writer element encoding, reader decode, timestamp
    string parsing under the session UTC timezone) is value-verified.

    Costed honestly (PLANS.md): XML is an EXCHANGE format — the scan
    decodes every element, no predicate pushdown, no column skipping
    inside a document. The production shape is land-XML → convert to
    parquet at the edge → query the parquet; this lane is the landing
    step a reference user with XML feed partners needs to trust.

    Reference parity: the reference ingests exported viewing-history
    tables; media-metadata feeds (EPG, MRSS) ship as XML in exactly
    this element-per-record shape.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from etl_sql_and_pyspark_developement__spark.sources.io import (
        read_xml,
        xml_orders_fixture,
    )

    path = xml_orders_fixture(spark, sf_dir)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    orders = read_xml(spark, path, "order", schema)
    return (
        orders.filter(F.col("o_orderdate") >= "1995-07-01")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).cast("long").alias("n_open"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("month")
    )


@query("s11_arrow_vector_features")
def s11_arrow_vector_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-NATIVE KERNEL lane — mapInArrow (RecordBatch in/out, no
    pandas materialization) computing the int8-quantizer pre-pass
    over the embedding corpus: per-vector integer micro-unit moments
    (operators/similarity.vector_features_arrow) that calibrate the
    scale for vector compression (s06/s10's PQ family stores codes;
    a production pipeline first needs exactly these moments to pick
    the quantization range). All outputs are exact integers (float32
    widens to float64 losslessly, floor lands on integers, integer
    sums commute), so the DuckDB oracle replays every value from
    list_transform/list_sum with NO tolerance — the strongest parity
    an embedding kernel can carry.

    This completes the engine's Python-boundary ladder as driver-
    verified surfaces: q118 UDTF (generator), m-lanes mapInPandas
    (byte wrangling), q105/q113/st33/st41 data sources (connectors),
    and now mapInArrow (columnar numeric kernels) — each with the
    same determinism discipline.
    """
    from etl_sql_and_pyspark_developement__spark.operators.similarity import (
        vector_features_arrow,
    )

    emb = table(spark, sf_dir, "embeddings")
    # NULL embeddings / NULL elements are filtered BEFORE the kernel
    # (which fails loudly on them by contract — integer moments of a
    # missing vector have no meaning); the oracle applies the same
    # membership filter, so the boundary is value-verified.
    clean = emb.filter(
        F.col("embedding").isNotNull()
        & ~F.exists("embedding", lambda x: x.isNull())
    )
    return vector_features_arrow(clean).orderBy("vec_id")


@query("q123_modern_sql")
def q123_modern_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODERN SQL ERGONOMICS lane — the four post-ANSI surfaces a
    migrating warehouse user reaches for first, composed in one
    query and all value-verified:

    - PARAMETERIZED execution: spark.sql(sql, args={...}) with named
      `:param` markers — the injection-safe templating API (string
      interpolation is the anti-pattern this retires);
    - IDENTIFIER(:tbl): dynamic table targeting that stays a resolved
      identifier, never string-spliced SQL;
    - LATERAL COLUMN ALIAS: `length(text) AS n_chars, n_chars DIV 100
      AS hecto` in one SELECT — no wrapper subquery;
    - listagg(DISTINCT ... , '|') WITHIN GROUP (ORDER BY ...): the
      SQL:2023 ordered string aggregate (q50's ranked concat via
      collect_list is the DataFrame spelling; this is the standard's);
    - try_cast: error-safe coercion that yields NULL on REAL failures
      (docs whose first char is not a digit), never a job abort —
      q115's never-fail contract at expression granularity.

    DuckDB mirrors every one (string_agg DISTINCT ORDER BY, try_cast,
    lateral aliases), so the oracle is bit-exact.
    """
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "q123_documents"
    )
    return spark.sql(
        """
        WITH base AS (
            SELECT source, lang,
                   length(text) AS len_chars,
                   len_chars DIV 100 AS hecto,
                   try_cast(substr(text, 1, 1) AS INT) AS lead_digit
            FROM IDENTIFIER(:tbl)
            WHERE length(text) >= :min_chars
        )
        SELECT source,
               listagg(DISTINCT lang, '|')
                   WITHIN GROUP (ORDER BY lang) AS langs,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(hecto) AS BIGINT) AS hecto_sum,
               CAST(count(lead_digit) AS BIGINT) AS n_digit_led,
               CAST(coalesce(sum(lead_digit), 0) AS BIGINT) AS digit_sum
        FROM base
        GROUP BY source
        ORDER BY source
        """,
        args={"tbl": "q123_documents", "min_chars": 10},
    )


@query("q124_agg_pushdown")
def q124_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET AGGREGATE PUSHDOWN lane — the metadata-only aggregate
    tier below q108's row-group skipping: with the DS v2 parquet path
    and spark.sql.parquet.aggregatePushdown, MIN/MAX/COUNT compile
    INTO the scan (`PushedAggregation` on the BatchScan) and are
    answered from row-group FOOTER statistics — zero data pages
    decoded. At 100 TB, "how many rows / what's the price range /
    what's the freshest date" becomes a footer-listing job instead of
    a full-table scan — the difference between seconds and hours for
    the monitoring queries every pipeline runs most often.

    The lane computes the SAME aggregate twice — once footer-only
    (v2 + pushdown, conf-scoped and restored), once through the
    production scan path — and returns both rows, so the driver
    value-verifies that footer statistics EQUAL the scan truth (the
    q121 estimate-beside-exact discipline; for min/max/count the
    footer tier is exact by construction, and this lane proves it on
    real files). Both sides are materialized eagerly inside the lane
    (q114's discipline) because planning is lazy: a set/restore
    around a RETURNED lazy frame would flip the conf back before the
    driver's action plans. Supported-surface boundary (documented):
    pushdown covers ungrouped MIN/MAX/COUNT (+ GROUP BY partition
    columns only), never SUM/AVG — which is why q01's rollups keep
    their scans.

    Reference parity: every reference workload opens with exactly
    these freshness/extent probes before the real query (pyspark/*
    scripts' head-of-file sanity counts).
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        v2_parquet_pushdown,
    )

    path = f"{sf_dir.rstrip('/')}/orders.parquet"

    def probe() -> list:
        # count(*) (not count(1): only the star form translates to
        # CountStar for pushdown) + min/max on numeric columns only:
        # pushdown is ALL-OR-NOTHING per aggregate list, and one
        # non-pushable member (e.g. a timestamp min under rebase
        # rules) silently reverts the whole probe to a scan
        return (
            cached_parquet(spark, path)
            .agg(
                F.expr("count(*)").alias("n_orders"),
                F.min("o_totalprice").alias("min_price"),
                F.max("o_totalprice").alias("max_price"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
            )
            .collect()
        )

    with v2_parquet_pushdown(spark):
        footer = probe()[0]
    scan = probe()[0]
    rows = [
        ("footer", *footer),
        ("scan", *scan),
    ]
    return spark.createDataFrame(
        rows,
        "via string, n_orders bigint, min_price double, "
        "max_price double, min_key bigint, max_key bigint",
    ).orderBy("via")


@query("p23_k_anonymity")
def p23_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY SUPPRESSION release — the third privacy tier
    beside t09's PII scrubbing (value level) and p19's noisy counts
    (aggregate level): before publishing a per-(lang, source) slice
    of the corpus card, every quasi-identifier cell with fewer than
    k=5 members is SUPPRESSED — its rows re-keyed to a single
    '__redacted__' bucket rather than dropped, so the release still
    adds up to the corpus total (an auditor can verify nothing was
    silently discarded) while no published cell isolates fewer than
    k individuals. The suppressed-cell count rides every row — the
    release's own health metric.

    Two decomposable aggregations over one scan (cell counts, then
    the redacted rollup) — no windows, no joins; at 100 TB this is
    two cheap shuffles on low-cardinality quasi-identifier keys.
    The oracle replays suppression exactly (the rule is a pure
    predicate on the cell count).

    Reference parity: SQL/Multi-Profile Family Usage Patterns.txt
    publishes per-household slices — exactly the release shape that
    needs a k floor before it leaves the warehouse.
    """
    docs = table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(n_chars) AS BIGINT)").alias("chars"),
    )
    k = 5
    keyed = cells.select(
        F.when(F.col("n") >= k, F.col("lang"))
        .otherwise(F.lit("__redacted__"))
        .alias("lang"),
        F.when(F.col("n") >= k, F.col("source"))
        .otherwise(F.lit("__redacted__"))
        .alias("source"),
        "n",
        "chars",
        F.when(F.col("n") < k, 1).otherwise(0).alias("supp"),
    )
    released = keyed.groupBy("lang", "source").agg(
        F.expr("CAST(sum(n) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(sum(chars) AS BIGINT)").alias("n_chars"),
        F.expr("CAST(sum(supp) AS BIGINT)").alias("cells_merged"),
    )
    total_supp = keyed.agg(
        F.expr("CAST(sum(supp) AS BIGINT)").alias("n_suppressed_cells")
    )
    return (
        released.crossJoin(F.broadcast(total_supp))
        .orderBy("lang", "source")
    )


@query("q125_groupby_pushdown")
def q125_groupby_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-BY-PARTITION-COLUMN AGGREGATE PUSHDOWN — q124's second
    half: over the Hive-partitioned events artifact (q97's fixture),
    `GROUP BY event_day` with count(*) compiles ENTIRELY into the
    DS v2 scan (`PushedGroupBy` + `PushedAggregation` on the
    BatchScan) — per-partition counts come from each directory's
    row-group footers, zero data pages decoded. At 100 TB this is the
    "rows per day for the last 3 years" panel query answered from
    metadata in seconds — the one every ingest dashboard refreshes
    on a timer against the biggest table in the lake.

    Same discipline as q124: the per-day counts are computed
    footer-only (conf-scoped, eagerly materialized — planning is
    lazy) AND through the production scan path, both returned, so
    footer==scan is value-verified per day. Boundary: group-by
    pushdown works for PARTITION columns only — a data-column
    group-by keeps its scan, which is exactly why the lake lays the
    table out by day in the first place.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        partitioned_events_path,
        v2_parquet_pushdown,
    )

    path, schema = partitioned_events_path(spark, sf_dir)

    def probe() -> list:
        return (
            spark.read.schema(schema)
            .parquet(path)
            .groupBy("event_day")
            .agg(F.expr("count(*)").alias("n_events"))
            .collect()
        )

    with v2_parquet_pushdown(spark):
        footer = probe()
    scan = probe()
    rows = [("footer", r["event_day"], r["n_events"]) for r in footer]
    rows += [("scan", r["event_day"], r["n_events"]) for r in scan]
    return spark.createDataFrame(
        rows, "via string, event_day string, n_events bigint"
    ).orderBy("via", "event_day")


@query("q126_aqe_coalesce")
def q126_aqe_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE PARTITION COALESCING — the third adaptive lever, completing
    the AQE set (q101 splits skewed partitions, q104 prunes partitions
    dynamically; this one COLLAPSES over-provisioned ones): shuffle
    partition count must be sized for the BIGGEST stage of a job, so
    every small-output stage downstream inherits far more partitions
    than its data fills — at the session's 32 (production: 100,000 for
    a 100 TB input) the per-user aggregate here leaves dozens of
    near-empty post-shuffle partitions, and AQE's coalescePartitions
    merges them to the advisory size at RUNTIME, from the actual map
    output statistics. The tests pin the flip (AQEShuffleRead
    "coalesced" present with the conf on, absent off — DataFrame
    REBUILT around the flip, plans are cached) and that the VALUES are
    conf-invariant; the oracle is the plain two-level rollup.

    This is the default-on lever every 100 TB job leans on hardest:
    without it, either every stage pays 100k tasks' scheduling
    overhead, or someone hand-tunes shuffle.partitions per stage —
    the exact knob AQE retired.

    Reference parity: pyspark/User Engagement Funnel Analysis.py
    chains per-user aggregates into small rollups — the shape whose
    intermediate stages over-partition worst.
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_users"),
            F.expr("CAST(sum(n) AS BIGINT)").alias("n_events"),
            F.expr("CAST(max(n) AS BIGINT)").alias("max_per_user"),
        )
        .orderBy("event_type")
    )


@query("q127_arrow_scalar_udf")
def q127_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICED Arrow-vectorized SCALAR UDF exhibit — the repo's "no
    row-at-a-time Python in hot paths" policy, given its measured
    counterpart the way q118 priced the UDTF surface: ONE pandas_udf
    (Arrow batch in / Arrow batch out, pandas str kernels vectorized
    across the batch) computes a deterministic INTEGER quality
    micro-score per document — 1000*n_chars + 7*n_spaces +
    3*n_digits — and the SAME score is computed a second time as a
    pure builtin expression (length/translate/regexp_replace, JVM
    codegen). Both ride every output row (sum_score_udf ==
    sum_score_expr, value-verified in-row, q124's footer==scan
    discipline), so the lane proves the Arrow path bit-agrees with
    codegen while PLANS.md records what the Python hop costs over the
    expression twin. Integer outputs make the DuckDB oracle exact —
    no float tolerance anywhere.

    The plan shows ArrowEvalPython (asserted in tests/test_plans.py)
    — batch-granular Python: a serialization hop + a pinned-thread
    stage that breaks whole-stage codegen. PLANS.md carries the r10
    REVISED pricing (fresh-frame interleaved methodology): on the
    isolated boundary (pure-arithmetic kernel) the expression wins
    the ladder order (0.54s < Arrow 0.66s < row-Python 0.81s at 500k
    docs); on THIS regex-bound kernel pandas' C regex engine beats
    JVM regexp_replace (1.37s vs 3.0s) — the boundary is not the
    whole price, so regex-heavy hot paths get measured, not assumed.

    Reference parity: pyspark/Content Performance Analytics.py builds
    weighted engagement scores as chained withColumn arithmetic — the
    shape users reflexively write as a Python UDF; this lane is the
    measured argument for keeping it in expressions.
    """
    # Defined in functions/arrow_udfs.py, NOT inline: this module's
    # `from __future__ import annotations` stringifies type hints,
    # which pandas_udf's signature resolution rejects — and module-
    # level definitions are what Spark's Python workers can re-import.
    from etl_sql_and_pyspark_developement__spark.functions.arrow_udfs import (
        quality_score_udf as score_udf,
    )

    docs = table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_ws = n_chars - F.length(F.translate("text", " ", ""))
    n_dg = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    expr_score = (
        F.lit(1000) * n_chars + F.lit(7) * n_ws + F.lit(3) * n_dg
    ).cast("bigint")
    scored = docs.select(
        "lang",
        score_udf(F.col("text")).alias("udf_score"),
        expr_score.alias("expr_score"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(udf_score) AS BIGINT)").alias(
                "sum_score_udf"
            ),
            F.expr("CAST(sum(expr_score) AS BIGINT)").alias(
                "sum_score_expr"
            ),
        )
        .orderBy("lang")
    )


@query("q128_retention_delete")
def q128_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION / TTL PARTITION DELETE — the third write/maintenance
    lane (q114 refreshes trailing partitions, q117 compacts small
    files; this AGES OUT old ones): io.retention_swept_path holds a
    day-partitioned rollup table with every partition older than
    cutoff = max(day) - 13 dropped atomically (rename-aside per
    partition, marker-committed sweep, idempotent heal after a crash
    — the commit protocol is pinned in tests/test_io.py). The lane
    returns the per-day survivor rollup with the cutoff riding every
    row; the oracle replays the SAME data-derived cutoff from the
    flat events truth, so the sweep's membership boundary is
    value-verified, not just exercised. Dropped days cost ZERO IO
    afterwards — they no longer exist to list, which
    tests/test_plans.py pins by asserting the post-sweep scan reads
    exactly the survivor partitions.

    At 100 TB: the nightly TTL/GDPR pass. Partition drop is the only
    delete that doesn't rewrite data — O(dropped dirs) metadata work,
    survivors' files untouched (their mtimes prove it), and every
    future scan is smaller by construction rather than by filter.

    Reference parity: the reference's warehouse scripts query
    trailing windows (SQL/Seasonal Viewing Pattern Analysis.txt);
    retention is the maintenance job that makes "the table IS the
    window" true.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        retention_swept_path,
    )

    path, cutoff = retention_swept_path(spark, sf_dir, keep_days=14)
    swept = spark.read.schema(
        "event_type string, n_events bigint, cents bigint, day string"
    ).parquet(path)
    return (
        swept.groupBy("day")
        .agg(
            F.expr("CAST(sum(n_events) AS BIGINT)").alias("n_events"),
            F.expr("CAST(sum(cents) AS BIGINT)").alias("cents"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .withColumn("cutoff", F.lit(cutoff))
        .orderBy("day")
    )


@query("q129_file_metadata_audit")
def q129_file_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN _metadata COLUMN file-lineage audit — the per-FILE
    forensics surface (which physical file holds which rows, how big,
    written when): Spark exposes _metadata.file_name / file_path /
    file_size / row_index on every file-source scan with zero extra
    IO (the values come from the scan's own split bookkeeping — no
    filesystem round trip, no UDF). Over io.bucketed_files_path's
    one-file-per-bucket layout the audit is VALUE-verifiable: per-file
    row counts and key extents equal per-bucket truth replayable from
    the flat table, and countDistinct(file_name) == 1 per bucket
    rides every row — the file<->content correspondence is the lane's
    subject matter, not an assumption. file_size/row_index/file_path
    sanity is pytest-pinned (engine-generated values no oracle can
    know).

    At 100 TB this is the ingest-forensics query: "which landed file
    produced these corrupt rows" (pair with q115's quarantine),
    "which files does partition X actually hold" (pair with q117's
    compaction) — answered by the scan itself, no catalog round trip.

    Reference parity: the reference's warehouse loads land files it
    can never trace back (SQL/*.txt query tables, not lineage); this
    is the surface that closes that gap in a lake.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        bucketed_files_path,
    )

    import os

    path = bucketed_files_path(spark, sf_dir, n_buckets=4)
    # explicit read schema (source schema + the bucket partition col):
    # schema inference over partition dirs fails outright on an
    # empty-corpus fixture, and production readers pin schemas anyway
    schema = cached_parquet(
        spark, os.path.join(sf_dir, "orders.parquet")
    ).schema.add("bucket", "integer")
    df = spark.read.schema(schema).parquet(path)
    return (
        df.select(
            "bucket",
            F.col("_metadata.file_name").alias("fname"),
            "o_orderkey",
        )
        .groupBy("bucket")
        .agg(
            F.countDistinct("fname").alias("n_files"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_rows"),
            F.expr("CAST(min(o_orderkey) AS BIGINT)").alias("min_key"),
            F.expr("CAST(max(o_orderkey) AS BIGINT)").alias("max_key"),
        )
        .withColumn("bucket", F.col("bucket").cast("int"))
        .orderBy("bucket")
    )


@query("q130_schema_evolution_read")
def q130_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-DRIFT-TOLERANT READ (mergeSchema) — the layout every
    long-lived lake table has after a column is added: generation-1
    files (even doc_id) predate source/n_chars, generation-2 files
    carry them, ONE directory holds both
    (io.two_generation_docs_path). A default read plans whichever
    schema it samples and silently drops or fails on the other
    generation's columns; option("mergeSchema", "true") unions the
    file schemas — old rows surface with NULLs exactly where the
    columns didn't exist yet. The rollup counts per-lang totals,
    gen-2 coverage (count(source) skips the NULL-filled gen-1 rows),
    and gen-2 chars; membership is a pure function of doc_id so the
    oracle replays the NULL-fill from the flat truth — the union
    semantics are value-verified, not just exercised.

    At 100 TB: schema evolution is additive-by-contract (the probe in
    tests/test_streaming.py pins the STATE-side version of the same
    rule); mergeSchema is the read-side half — it pays a per-file
    footer read at planning, so production tables pin the merged
    schema in the catalog and readers pass it explicitly (q125's
    explicit-schema discipline). The lane demonstrates the drift
    boundary itself.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        two_generation_docs_path,
    )

    path = two_generation_docs_path(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        df.groupBy("lang")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(count(source) AS BIGINT)").alias("n_gen2"),
            F.expr("CAST(sum(n_chars) AS BIGINT)").alias("gen2_chars"),
            F.expr("CAST(min(gen) AS INT)").alias("min_gen"),
            F.expr("CAST(max(gen) AS INT)").alias("max_gen"),
        )
        .orderBy("lang")
    )


@query("p24_temporal_embargo_split")
def p24_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL TRAIN/TEST SPLIT WITH EMBARGO — the time-series
    leakage defense (p22 guards NEAR-DUP leakage across a random
    split; this guards TEMPORAL leakage across a chronological one):
    a model whose features look back 48h must not train on rows whose
    lookback window overlaps the test period, so the split drops an
    embargo band — train = first 21 days, embargo = next 2 (>= the
    48h feature horizon, EXCLUDED from both sides), test = the rest.
    All boundaries derive from the data's own day span (min day + 21
    / + 23), never current_date.

    The lane ships its own audit, p22's audited-naive discipline:
    riding every row are the same-user cross-boundary pair counts
    within the 48h horizon for the NAIVE no-embargo split (train
    touching test across the cut — the leakage a random-date split
    silently accepts) and for the embargo split (ZERO BY CONSTRUCTION
    — the 2-day band is wider than the 48h window, and the count
    proves it rather than asserts it). Both pair joins pre-filter to
    the boundary band (only rows within 48h of the cut can qualify),
    so the audit join touches O(band), not O(corpus) — at 100 TB the
    crossing audit reads two days of data, not three years.

    Reference parity: every reference model eval (R13's MAPE/MAE
    rollups, R18's A/B lanes) trains on history and scores forward;
    this is the split those evals need to not grade on leaked future.
    """
    import datetime

    ev = table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d")).collect()[0]["d"]
    if d0 is None:  # empty corpus: any anchor yields the empty split
        d0 = datetime.date(1970, 1, 1)
    cut1 = (d0 + datetime.timedelta(days=21)).isoformat()
    cut2 = (d0 + datetime.timedelta(days=23)).isoformat()
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    split = (
        F.when(F.col("day") < cut1, F.lit("train"))
        .when(F.col("day") < cut2, F.lit("embargo"))
        .otherwise(F.lit("test"))
    )
    per_split = (
        base.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )

    def cross_pairs(test_start: str):
        """Same-user (train, test) pairs with test.ts - train.ts
        < 48h — pre-filtered to the boundary band on BOTH sides so
        the join is O(band)."""
        tr = base.filter(
            (F.col("day") < cut1)
            & (
                F.col("ts")
                >= F.to_timestamp(F.lit(test_start))
                - F.expr("INTERVAL 48 HOURS")
            )
        ).select(F.col("user_id").alias("tu"), F.col("ts").alias("tts"))
        te = base.filter(
            (F.col("day") >= test_start)
            & (
                F.col("ts")
                < F.to_timestamp(F.lit(cut1)) + F.expr("INTERVAL 48 HOURS")
            )
        ).select(F.col("user_id").alias("eu"), F.col("ts").alias("ets"))
        return tr.join(
            te,
            (F.col("tu") == F.col("eu"))
            & (F.col("ets") < F.col("tts") + F.expr("INTERVAL 48 HOURS")),
        ).agg(F.expr("CAST(count(*) AS BIGINT)").alias("n"))

    naive = cross_pairs(cut1).withColumnRenamed("n", "naive_cross_pairs")
    embargoed = cross_pairs(cut2).withColumnRenamed(
        "n", "embargo_cross_pairs"
    )
    return (
        per_split.crossJoin(F.broadcast(naive))
        .crossJoin(F.broadcast(embargoed))
        .orderBy("split")
    )


@query("q131_aqe_runtime_broadcast")
def q131_aqe_runtime_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE RUNTIME SMJ->BHJ CONVERSION — the fourth adaptive lever,
    completing the quartet (q101 skew split, q104 DPP, q126
    coalescing, this): the statistics-free twin of q106. There, ANALYZE
    stats let the STATIC planner see through `p_size <= 3` and
    broadcast the sliver; here no stats exist (plain parquet, the cold
    lake table every migration starts with), the static planner prices
    the dim at file size and plans a SortMergeJoin — and AQE converts
    it to a BroadcastHashJoin at RUNTIME from the shuffle's actual map
    output sizes. The price of rescue-at-runtime vs plan-time
    knowledge: the dim's map-side shuffle write still happens (q106's
    docstring prices the same asymmetry) — stats buy you out of it,
    AQE only refunds the reduce side.

    Conf scoping: the static broadcast path is disabled and the
    ADAPTIVE threshold armed around an EAGER execution (q124's
    discipline — planning is lazy, a set/restore around a returned
    frame would unwind before the driver acts); the small rollup is
    re-emitted via createDataFrame. Values are join-strategy-invariant
    (oracle = plain join); the SMJ-initial/BHJ-final plan flip is
    asserted in tests/test_plans.py.

    Reference parity: every reference join chain starts life on
    stats-less staged files; this lever is why they broadcast anyway.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    confs = {
        # static broadcast OFF: force the stats-less planner into SMJ
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # runtime conversion ON at the session's production threshold
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
    }
    # the adaptive threshold is UNSET by default (falls back to the
    # static one) — a None restore must unset, never set(None)
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        rows = (
            li.join(
                part.filter(F.col("p_size") <= 3),
                li.l_partkey == F.col("p_partkey"),
            )
            .groupBy("p_brand")
            .agg(
                F.expr("CAST(count(*) AS BIGINT)").alias("n_items"),
                F.expr("CAST(sum(l_quantity) AS BIGINT)").alias("sum_qty"),
                F.expr(
                    "CAST(sum(CAST(round(l_extendedprice * 100, 0)"
                    " AS BIGINT)) AS BIGINT)"
                ).alias("price_cents"),
            )
            .collect()  # EAGER: the conversion must happen in-scope
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        rows,
        "p_brand string, n_items bigint, sum_qty bigint,"
        " price_cents bigint",
    ).orderBy("p_brand")


@query("q132_script_transform")
def q132_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIVE-STYLE SCRIPT TRANSFORM (SELECT ... TRANSFORM ... USING) —
    the legacy-ETL migration surface: decades of Hive pipelines pipe
    rows through external processes, and Spark runs the same
    statement WITHOUT Hive (no-serde mode: rows serialize to
    tab-separated text on the child's stdin, the declared AS schema
    re-parses its stdout with type coercion). The external program
    here ('tr a-z A-Z') genuinely transforms the data OUTSIDE the
    JVM — the uppercased event types come back through the typed
    re-parse, and the rollup on top is value-verified against upper()
    in the oracle, so the serialize -> child process -> re-parse loop
    is proven, not just exercised.

    Priced honestly (the q118/q127 discipline): this is a per-row
    PROCESS PIPE — one fork per task plus line-at-a-time text IO,
    the slowest boundary the engine offers (below even row-Python).
    It exists for PORTING: run the Hive statement unchanged on day
    one, then rewrite as expressions (upper() here — the lane's own
    oracle is the rewrite). Never in a hot path by policy.

    Reference parity: the reference's SQL/*.txt assume a warehouse
    where TRANSFORM-era pipelines live; this is the bridge statement
    a migration runs before the rewrite to q01-style expressions.
    """
    ev = table(spark, sf_dir, "events")
    ev.selectExpr(
        "event_type",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    ).createOrReplaceTempView("q132_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM (
          SELECT TRANSFORM(event_type, cents)
            USING 'tr a-z A-Z' AS (event_type STRING, cents BIGINT)
          FROM q132_events
        )
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@query("q133_histogram_stats")
def q133_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-HEIGHT HISTOGRAM STATISTICS — the stats lever that sees
    through SKEW, completing the CBO story (q106 proved min/max/ndv
    drive the broadcast decision through a filter, q119 proved
    rowCount+ndv drive join ORDER; both price an equality predicate
    as rowCount/ndv — the UNIFORM assumption, and the exact mistake
    on skewed data). `ANALYZE ... FOR COLUMNS` under
    spark.sql.statistics.histogram.enabled=true records 254
    equi-height bins, and FilterEstimation prices each VALUE from its
    bin heights instead: on documents.lang (genuinely skewed — en
    ~44% vs ~13% per tail lang, dictionary-coded to the numeric
    lang_code histograms require), the measured estimates at sf0.01
    are uniform 100/100 rows for en/fr (blind, identical) vs
    histogram 221/65 against actuals 218/64 — near-exact and
    value-specific. The plan test (tests/test_plans.py) turns that
    gap into the decision that matters: a broadcast threshold between
    the two estimates makes the ndv-only twin UNDER-provision the
    dominant-language sliver onto the broadcast bus (the classic
    driver-OOM postmortem) while the histogram twin correctly keeps
    it on the shuffle path — plus estimate-vs-actual assertions on
    both twins (io.analyzed_docs_hist_tables).

    The lane itself runs under production confs and its VALUES are
    conf-invariant (q106's discipline — the oracle is the plain
    filter+join on documents/embeddings): filter the histogram twin
    to the data-derived dominant language, enrich with embedding
    coverage, roll up per source.

    At 100 TB: the nightly ANALYZE pays one extra percentile pass per
    histogram column; in exchange every skewed-dimension predicate —
    the event-type, the country, the product tier that holds half the
    fact — is priced from its real frequency, which is the difference
    between planning for 100 rows and receiving 100 million.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        analyzed_docs_hist_tables,
    )

    hist_name, _ = analyzed_docs_hist_tables(spark, sf_dir)
    d = spark.table(hist_name)
    # dominant language, data-derived (max doc count, tie-break lang);
    # empty corpus -> sentinel code that matches nothing (the rollup
    # is empty either way — the empty-input contract)
    top = (
        d.groupBy("lang_code")
        .agg(F.count(F.lit(1)).alias("n"), F.min("lang").alias("lang"))
        .orderBy(F.desc("n"), "lang")
        .limit(1)
        .collect()
    )
    dom = top[0]["lang_code"] if top else -1
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(1).alias("has_vec")
    )
    return (
        d.filter(F.col("lang_code") == dom)
        .join(emb, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(n_chars) AS BIGINT)").alias("sum_chars"),
            F.expr("CAST(count(has_vec) AS BIGINT)").alias("n_vecs"),
        )
        .orderBy("source")
    )


@query("q134_multi_output_etl")
def q134_multi_output_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-OUTPUT SINGLE-SCAN ETL — the "one fact scan -> N output
    tables" production topology (io.multi_output_etl_path): the
    nightly job that lands by-flag, by-month, and by-supplier-band
    rollups from ONE materialized pass over lineitem. q112 proved
    exchange reuse works INSIDE a query and the UNION-no-reuse
    finding proved it does NOT span separate writes, so the fan-out
    persists the projected base explicitly (MEMORY_AND_DISK, project
    first, unpersist in finally) and all three outputs commit as one
    atomic unit — a consumer never reads by_flag fresh and by_month
    stale. The scan-count contract lives in tests/test_plans.py:
    every rollup's executed plan reads the cache (ZERO parquet
    scans), while the naive shape pays one full scan PER OUTPUT —
    the deterministic form of the 3x-vs-1x IO price.

    This lane is each output's CONSUMER: it reads the three committed
    tables and rolls each up to (n_groups, total_rows, measure) — so
    the driver row value-verifies every output against the flat truth
    (the oracle recomputes each rollup from lineitem directly; any
    lost rows, double-counted groups, or drift in ONE output breaks
    the hash).

    At 100 TB: N outputs x one 100 TB scan each is the single
    biggest avoidable cost in a warehouse's nightly window; one
    cached projection + N cheap aggregations is the shape that fits
    the window — and when the projection outgrows memory it spills
    per-partition, still decoding the parquet exactly once.
    """
    import os

    from etl_sql_and_pyspark_developement__spark.sources.io import (
        multi_output_etl_path,
    )

    root = multi_output_etl_path(spark, sf_dir)
    parts = []
    for name, measure in (
        ("by_flag", "sum_qty"),
        ("by_month", "rev_cents"),
        ("by_suppband", "sum_qty"),
    ):
        out = cached_parquet(spark, os.path.join(root, name))
        parts.append(
            out.agg(
                F.expr("CAST(count(*) AS BIGINT)").alias("n_groups"),
                F.expr("CAST(sum(n) AS BIGINT)").alias("total_rows"),
                F.expr(f"CAST(sum({measure}) AS BIGINT)").alias("measure"),
            ).select(F.lit(name).alias("output"), "*")
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.orderBy("output")


@query("q135_default_columns")
def q135_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG DEFAULT-COLUMN EVOLUTION — the free half of schema
    change, completing the drift story (q130 reads a directory that
    drifted WITHOUT a catalog via mergeSchema's per-file footer tax;
    this evolves THROUGH the catalog for zero IO): `ALTER TABLE ...
    ADD COLUMNS (quality_tier STRING DEFAULT 'unreviewed',
    review_pass INT DEFAULT 0)` rewrites nothing — the
    EXISTS_DEFAULT lives in column metadata and every pre-evolution
    row surfaces it at scan time (file mtimes asserted untouched in
    tests/test_io.py); post-evolution INSERTs fill omitted columns
    from the CURRENT_DEFAULT (both planted rows exercise it: one
    explicit, one defaulted — io.defaults_evolved_table). The rollup
    groups (lang, quality_tier) with pass and char sums, so the
    oracle value-verifies all three populations at once: legacy rows
    under the exists-default, the explicit insert, and the
    current-default insert.

    At 100 TB: ADD COLUMNS DEFAULT is the only schema change that
    costs a metadata write instead of a backfill — no file rewrite,
    no mergeSchema footer pass at planning, no NULL-vs-absent
    ambiguity (the default is typed and declared). The reference's
    ALTER-heavy SQL scripts (every R* schema has post-hoc columns)
    map here.
    """
    from etl_sql_and_pyspark_developement__spark.sources.io import (
        defaults_evolved_table,
    )

    name = defaults_evolved_table(spark, sf_dir)
    return (
        spark.table(name)
        .groupBy("lang", "quality_tier")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(review_pass) AS BIGINT)").alias("passes"),
            F.expr("CAST(sum(n_chars) AS BIGINT)").alias("sum_chars"),
        )
        .orderBy("lang", "quality_tier")
    )


@query("q136_cache_zone_pruning")
def q136_cache_zone_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-MEMORY CACHE BATCH PRUNING — the cache-side twin of q108's
    parquet row-group skipping, completing the zone-map story across
    all three storage tiers (q97/q104 prune directories, q108 prunes
    row groups at the footer, this prunes CACHED COLUMNAR BATCHES):
    Spark's in-memory columnar cache keeps per-batch min/max stats,
    and with spark.sql.inMemoryColumnarStorage.partitionPruning
    (default on) a pushed range predicate skips whole batches without
    touching them — IF the cached layout clusters the predicate
    column. Measured at sf0.01 (1000-row batches): the range-
    clustered cache decodes 1000 rows for a 32-row band; the
    round-robin cache decodes 12250 of 15000 — the same ~crash-vs-
    skim gap q108 measures on disk, now for the memory tier
    (contract pinned in tests/test_plans.py over both layouts).

    The cache is SCOPED (q131's eager discipline): the rollup
    executes against it in-scope, then unpersist — a leaked cache
    would silently tax every later query's memory budget, the exact
    bug this repo's fan-out lane (q134) guards with its finally.
    Values are layout- and cache-invariant (the oracle is the plain
    filtered rollup), integer-cents discipline throughout.

    At 100 TB: hot dimensions and iteration working sets live in the
    cache tier; clustering them on the hot predicate column is free
    at cache time (one repartitionByRange) and turns every
    selective re-read into a batch-skip instead of a full columnar
    decode — the same CLUSTER BY judgment call as the disk layout,
    applied to memory.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    clustered = (
        orders.repartitionByRange(4, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .cache()
    )
    try:
        clustered.count()  # materialize the cached batches
        rows = (
            clustered.filter(F.col("o_totalprice") < 2000.0)
            .groupBy("o_orderpriority")
            .agg(
                F.expr("CAST(count(*) AS BIGINT)").alias("n_orders"),
                F.expr(
                    "CAST(sum(CAST(round(o_totalprice * 100, 0) AS"
                    " BIGINT)) AS BIGINT)"
                ).alias("rev_cents"),
            )
            .collect()  # EAGER: must run while the cache is alive
        )
    finally:
        clustered.unpersist()
    return spark.createDataFrame(
        rows,
        "o_orderpriority string, n_orders bigint, rev_cents bigint",
    ).orderBy("o_orderpriority")


@query("q137_grouped_agg_udf")
def q137_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-AGG ARROW UDF — the aggregate rung of the Python
    ladder, priced and boundary-pinned like its siblings (scalar:
    q127, table: q118, row: the pricing exhibit, pipe: q132): a
    pandas Series->scalar UDF receives each group as ONE Arrow batch
    and reduces it JVM-side-shuffled/Python-side-folded
    (ArrowAggregatePythonExec), usable in groupBy().agg() and over
    unbounded windows. The exhibit computes an integer sum of squares
    BESIDE its builtin twin (sum(c*c)) and value-verifies equality
    IN-ROW per group — q127's discipline for the aggregate boundary.

    Two boundaries carried honestly (tests/test_plans.py): (1) a
    grouped-agg pandas UDF CANNOT mix with non-pandas aggregates in
    one agg() (INVALID_PANDAS_UDF_PLACEMENT, pinned) — hence the
    join-of-two-rollups shape here; (2) magnitudes are bounded (the
    squared term is a 1e5 residue) because numpy's int64 sum WRAPS
    where Spark's ANSI sum RAISES — never let the two overflow
    behaviors diverge in a verified lane.

    At 100 TB: unlike a builtin aggregate there is NO partial/merge
    decomposition — every group's full rows cross the Python boundary
    after the shuffle (no map-side combine), so this rung is for
    genuinely non-decomposable group logic (a fitted curve per
    group, a scipy call); anything expressible as an expression
    belongs in the builtin tier (the in-row twin IS the proof the
    expression exists here).
    """
    from etl_sql_and_pyspark_developement__spark.functions.arrow_udfs import (
        sum_squares_agg_udf,
    )

    orders = table(spark, sf_dir, "orders")
    df = orders.select(
        "o_orderpriority",
        F.expr(
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) % 100000"
        ).alias("c"),
    )
    u = df.groupBy("o_orderpriority").agg(
        sum_squares_agg_udf("c").alias("udf_ss")
    )
    b = df.groupBy("o_orderpriority").agg(
        F.expr("CAST(sum(c * c) AS BIGINT)").alias("expr_ss"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_orders"),
    )
    return u.join(b, "o_orderpriority").orderBy("o_orderpriority")


@query("t26_unicode_hygiene")
def t26_unicode_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNICODE HYGIENE AUDIT — the curation stage every web-scale
    text pipeline runs before tokenization: zero-width characters
    (U+200B/200C/200D/FEFF — invisible, token-splitting, a dedup
    evasion vector), replacement characters (U+FFFD — the mojibake
    fingerprint of a decode gone wrong upstream), C0 control bytes,
    and non-NFC normalization forms (the same grapheme as different
    codepoint sequences — 'e'+COMBINING ACUTE vs the precomposed
    e-acute — splits exact-dedup hashes and vocab entries). The
    synthetic corpus is pure ASCII, so the lane carries its own
    deterministic FAULT FIXTURE (q115's planted-corruption
    discipline, inline): doc_id residues inject one fault class each
    (%97 zero-width, %89 a combining-accent non-NFC suffix, %83
    U+FFFD), the oracle replays the identical injection in SQL, and
    every audit counter is value-verified non-vacuously (each class
    count > 0 pinned in tests/test_functions.py at every sf).

    Detection is pure codegen (rlike/contains over the batch) except
    NFC, which Spark has no builtin for — is_not_nfc_udf is a
    legitimate Arrow-UDF use (q127's policy: the UDF is for logic
    expressions can't say), and its cross-engine contract is that
    DuckDB's nfc_normalize(text) <> text agrees (both UAX #15).
    scrub_delta prices the cleanup: chars removed by the zero-width +
    U+FFFD scrub, the write-amplification a hygiene pass costs.

    At 100 TB: one linear scan, decomposable counters, no shuffle
    beyond the per-source rollup — hygiene is free to ride any
    existing pass over the corpus; the NFC flag's Arrow batch is the
    only Python and it reads one string column.
    """
    from etl_sql_and_pyspark_developement__spark.functions.arrow_udfs import (
        is_not_nfc_udf,
    )

    docs = table(spark, sf_dir, "documents")
    perturbed = (
        F.when(F.col("doc_id") % 97 == 0, F.concat("text", F.lit("\u200b")))
        .when(
            F.col("doc_id") % 89 == 0, F.concat("text", F.lit("e\u0301"))
        )
        .when(F.col("doc_id") % 83 == 0, F.concat("text", F.lit("\ufffd")))
        .otherwise(F.col("text"))
    )
    audited = docs.select(
        "source",
        perturbed.alias("t"),
    ).select(
        "source",
        F.col("t").rlike("[\u200b\u200c\u200d\ufeff]").alias("zw"),
        F.col("t").contains("\ufffd").alias("repl"),
        F.col("t").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]").alias("ctl"),
        is_not_nfc_udf("t").alias("nonnfc"),
        (
            F.length("t")
            - F.length(
                F.regexp_replace(
                    "t", "[\u200b\u200c\u200d\ufeff\ufffd]", ""
                )
            )
        ).alias("delta"),
    )
    return (
        audited.groupBy("source")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(sum(CASE WHEN zw THEN 1 ELSE 0 END) AS BIGINT)").alias(
                "n_zero_width"
            ),
            F.expr(
                "CAST(sum(CASE WHEN repl THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_replacement"),
            F.expr("CAST(sum(CASE WHEN ctl THEN 1 ELSE 0 END) AS BIGINT)").alias(
                "n_control"
            ),
            F.expr(
                "CAST(sum(CASE WHEN nonnfc THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_nonnfc"),
            F.expr("CAST(sum(delta) AS BIGINT)").alias("scrub_delta"),
        )
        .orderBy("source")
    )


@query("q138_try_arithmetic")
def q138_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ARITHMETIC-SAFETY LADDER — the overflow story this engine
    runs under, pinned as a lane instead of scattered docstring notes
    (q89/t25 each documented "move to DECIMAL(38) near 2^63"; this
    demonstrates all three regimes on one fixture). Under ANSI mode
    (the engine default) a BIGINT sum that exceeds 2^63-1 RAISES
    ARITHMETIC_OVERFLOW mid-job (pinned in tests/test_plans.py — the
    failure a nightly rollup hits the day a counter crosses the
    boundary); the production choices are the ladder:

    - try_sum / try_add / try_multiply: NULL-on-overflow — the job
      survives, the poisoned aggregate is visibly absent (never
      silently wrapped, which is what non-ANSI mode would do);
    - DECIMAL(38,0) widening: exact through 38 digits, the correct
      answer at ~2x the agg cost — carried here as a STRING so the
      oracle compares digits, not float round-trips.

    The fixture plants the boundary deterministically: the dominant
    priority class carries a 2^61 offset per row, so ITS group sum
    overflows int64 (any group with >= 5 rows) while every other
    group stays exact — try_sum returns NULL exactly there, the
    DECIMAL twin returns the true 21-digit sum, and the row-level
    census counts how many rows would overflow a *16 rescale
    (try_multiply's per-row form). The oracle replays all three in
    HUGEINT/DECIMAL arithmetic.

    At 100 TB: overflow is not hypothetical — a cents counter over
    10^13 rows crosses 2^63 at avg >= 92 cents. ANSI's raise is the
    safety net; try_* is the explicit opt-out; DECIMAL is the
    answer. Never spark.sql.ansi.enabled=false, which converts the
    error into silent wraparound.
    """
    orders = table(spark, sf_dir, "orders")
    b = F.expr(
        "CASE WHEN o_orderpriority = '1-URGENT'"
        " THEN 2305843009213693952 +"
        "      CAST(round(o_totalprice * 100, 0) AS BIGINT)"
        " ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END"
    )
    t = orders.select(F.col("o_orderpriority").alias("g"), b.alias("b"))
    return (
        t.groupBy("g")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_rows"),
            F.expr("try_sum(b)").alias("try_sum_b"),
            F.expr(
                "CAST(sum(CAST(b AS DECIMAL(38,0))) AS STRING)"
            ).alias("exact_sum"),
            F.expr(
                "CAST(sum(CASE WHEN try_multiply(b, 16) IS NULL"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_mul_overflow"),
        )
        .orderBy("g")
    )
