"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for data skipping.

A single-column range layout (sort by partkey, write) gives perfect
min/max pruning on that column and none on any other. Interleaving
the bits of two (or more) dimension keys into one Morton z-value and
range-partitioning on IT gives every file a small bounding box in
ALL interleaved dimensions at once — a scan filtered on either
dimension prunes most files from footer min/max stats alone. This is
the standard lakehouse OPTIMIZE ... ZORDER BY layout pass, built here
from pure integer arithmetic so the curve assignment is deterministic
and engine-portable (the DuckDB oracle replays it bit-for-bit).

Everything is integer: cell = ((v - min) * 2^bits) DIV (span + 1),
interleave via DIV/%/× by powers of two — no floats, no UDFs, one
whole-stage-codegen projection.

Scale: the z-value is a per-row expression (no shuffle); the layout
pass itself is `repartitionByRange(zval)` + write — exactly one range
shuffle over data that had to be rewritten anyway. The min/max
normalization bounds come from a 1-row aggregate broadcast back onto
the scan (never collected through the driver beyond Spark's own
range-boundary sampling).

Reference scope: the reference's analyses cluster/partition on ONE
key at a time; this operator is the multi-dimension generalization
its cost-optimization queries (SQL/Infrastructure Cost Optimization
by Content Type.txt) would want for content_type × region scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_expr(col: str, min_col: str, max_col: str, bits: int) -> Column:
    """Integer cell of `col` in [0, 2^bits) given min/max bound
    columns: ((v - min) * 2^bits) DIV (max - min + 1).

    DIV by (span + 1) keeps the max value inside the top cell without
    a float divide or an edge-case CASE.
    """
    return F.expr(
        f"(CAST({col} - {min_col} AS BIGINT) * {1 << bits})"
        f" DIV (CAST({max_col} AS BIGINT) - {min_col} + 1)"
    )


def interleave_expr(x_cell: str, y_cell: str, bits: int) -> Column:
    """Morton z-value of two `bits`-bit cells, x in the even bit
    positions and y in the odd: pure ×/DIV/% by power-of-two
    literals, so the expression is whole-stage codegen in Spark and
    replays identically in any engine with integer division.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(({x_cell} DIV {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_cell} DIV {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return F.expr(" + ".join(terms))


def zvalue(
    df: DataFrame, x: str, y: str, bits: int = 10, out: str = "zval"
) -> DataFrame:
    """Attach the Morton z-value of columns (x, y) as `out`.

    Bounds are computed by a 1-row min/max aggregate and joined back
    by broadcast cross-join — the whole pass is one extra tiny job,
    then a single codegen projection over the data.
    """
    bounds = df.agg(
        F.min(x).alias("__xmin"),
        F.max(x).alias("__xmax"),
        F.min(y).alias("__ymin"),
        F.max(y).alias("__ymax"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    return (
        with_bounds.withColumn(
            "__xc", cell_expr(x, "__xmin", "__xmax", bits)
        )
        .withColumn("__yc", cell_expr(y, "__ymin", "__ymax", bits))
        .withColumn(out, interleave_expr("__xc", "__yc", bits))
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 10,
    n_files: int = 64,
) -> None:
    """The layout pass: z-value → repartitionByRange → sorted parquet.

    Each output file covers a contiguous z-range, i.e. a small
    bounding box in BOTH x and y — parquet footer min/max stats on
    either column then prune most files for point/range predicates.
    One range shuffle, which a rewrite pass pays anyway.
    """
    (
        zvalue(df, x, y, bits)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("__xc", "__yc", "zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_stats(
    df: DataFrame, x: str, y: str, bits: int = 10, n_bins: int = 64
) -> DataFrame:
    """Per-z-range-bin bounding boxes — the measurement that justifies
    the layout: bin = zval DIV (4^bits / n_bins) models 'one output
    file per contiguous z-range', and each bin's (x, y) cell bounding
    box is what parquet footer stats would expose to a scan. bbox_ppm
    is the box's area as ppm of the full cell grid: the expected
    fraction of files a uniform point predicate on BOTH dims still
    has to read (z-order keeps it near 1e6/n_bins; a one-column sort
    would leave the unsorted dim's span at full width).

    One groupBy(bin) over a codegen projection — no extra shuffle
    beyond the 64-group aggregate.
    """
    z = zvalue(df, x, y, bits)
    bin_width = (1 << (2 * bits)) // n_bins
    per_bin = (
        z.withColumn("bin", F.expr(f"zval DIV {bin_width}"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__xc").alias("x_min"),
            F.max("__xc").alias("x_max"),
            F.min("__yc").alias("y_min"),
            F.max("__yc").alias("y_max"),
        )
    )
    grid_cells = 1 << (2 * bits)
    return per_bin.select(
        "bin",
        "n_rows",
        "x_min",
        "x_max",
        "y_min",
        "y_max",
        F.expr(
            f"(1000000 * (x_max - x_min + 1) * (y_max - y_min + 1))"
            f" DIV {grid_cells}"
        ).alias("bbox_ppm"),
    ).orderBy("bin")
