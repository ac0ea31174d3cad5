"""Kaplan-Meier survival estimation over a lifetimes frame.

The input is one row per subject: an integer lifetime ``t_days`` and a
0/1 ``churned`` event flag (0 = censored — the observation window cut
the subject off, their true lifetime exceeds what we saw). The output
is the classic KM table at each event time t: the risk set n(t), event
count d(t), integer hazard, and the survival product
S(t) = prod_{t' <= t} (1 - d(t')/n(t')).

All windows run over the DISTINCT-lifetime frame — bounded by the day
span of the corpus (a few thousand rows at any horizon), never by the
subject count, so the unpartitioned ordered windows are safe at any
corpus size; the per-subject work is one groupBy.

Terminal-bucket guard: when the largest lifetime bucket is fully
churned (d(t) = n(t) — the standard KM terminal event) the survival
product hits exactly 0. A naive log-space fold would take log(0):
Spark returns NULL and F.sum silently SKIPS it, reporting
exp(prior terms) instead of 0.0 (and a SQL oracle's ln(0) throws).
Here the log term is only defined where d < n, and a prefix-max "dead"
flag pins survival to 0.0 from the first fully-churned bucket onward.

Reference parity: extends the churn lens of
pyspark/Churn Prediction and Risk Analysis.py (binary churn flags) to the
full censoring-aware time-to-event distribution.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_curve(
    lives: DataFrame, t_col: str = "t_days", event_col: str = "churned"
) -> DataFrame:
    """KM survival table from a (lifetime, event-flag) frame.

    Returns one row per lifetime with at least one churn event:
    (t_col, n_at_risk, n_churn, hazard_ppm, survival). The survival
    double is rounded to 6dp; the hazard is the exact integer
    d*1e6 DIV n. Log-space ordered product so both engines of a
    paired SQL oracle fold the same doubles in the same order.
    """
    per_t = lives.groupBy(t_col).agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum(event_col).alias("n_churn"),
    )
    w_ord = Window.orderBy(t_col)
    w_suffix = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_prefix = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_t.withColumn("n_at_risk", F.sum("n_ending").over(w_suffix))
        # log(1 - d/n) is only a number where d < n; the d = n terminal
        # bucket would be log(0) = NULL, which F.sum would silently
        # skip — the prefix-max dead flag below pins those rows to 0.0.
        .withColumn(
            "__logterm",
            F.when(
                F.col("n_churn") < F.col("n_at_risk"),
                F.log(
                    F.lit(1.0)
                    - F.col("n_churn").cast("double")
                    / F.col("n_at_risk").cast("double")
                ),
            ),
        )
        .withColumn(
            "__dead",
            F.max(
                (F.col("n_churn") == F.col("n_at_risk")).cast("int")
            ).over(w_prefix),
        )
        .withColumn(
            "survival",
            F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("__logterm").over(w_prefix)), 6)
            ),
        )
        .filter(F.col("n_churn") > 0)
        .select(
            t_col,
            "n_at_risk",
            "n_churn",
            F.expr("(1000000 * n_churn) DIV n_at_risk").alias("hazard_ppm"),
            "survival",
        )
        .orderBy(t_col)
    )
