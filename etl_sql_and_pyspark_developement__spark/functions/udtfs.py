"""Python UDTFs (user-defined table functions) — the user-extensible
row-expansion surface.

A UDTF is the general form of the explode/flatten shapes the
reference's expansions hand-roll per workload (`pyspark/Content
Affinity and Cross-Genre Analysis.py` explodes each viewing row into
genre pairs): one input row yields N output rows with a declared
schema, usable standalone (`SELECT * FROM my_udtf(...)`) or
LATERAL-correlated against a table (`FROM t, LATERAL my_udtf(t.col)`),
where Catalyst plans the expansion as a generator stage.

Execution discipline (the q105/q113 Python Data Source rules apply):

- Arrow-optimized (`useArrow=True`): rows cross the JVM/Python
  boundary in Arrow batches, not pickled one at a time.
- Every output value is DETERMINISTIC integer arithmetic on the
  inputs, so the DuckDB oracle replays the expansion bit-for-bit —
  the UDTF path is value-verified, not just exercised.
- Classes live in this module (never a closure): Spark pickles UDTFs
  by reference and the Python workers re-import this module by name.

At 100 TB the UDTF stage scales like any generator: it pipelines
per-partition with no shuffle of its own; the expansion factor (not
the corpus) sets the output size, and predicate pushdown below the
generator still prunes the scan.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import LongType, StructField, StructType


@udtf(returnType="inst_no int, inst_cents bigint", useArrow=True)
class SplitInstallments:
    """Split an order's total cents into n = (orderkey % 3) + 1 equal
    installments, remainder cents assigned to the EARLIEST
    installments (banker's-schedule convention): the per-row expansion
    is a pure integer function of (orderkey, cents), so
    sum(inst_cents) == cents exactly and DuckDB replays it via
    unnest(generate_series(1, n))."""

    def eval(self, orderkey: int, cents: int):
        if orderkey is None or cents is None:
            return
        n = orderkey % 3 + 1
        base = cents // n
        rem = cents - base * n
        for i in range(1, n + 1):
            yield i, base + (1 if i <= rem else 0)


class CharNgrams:
    """POLYMORPHIC-SCHEMA UDTF: emits the leading `width` character
    n-grams of a string, one output COLUMN per offset — the output
    schema is computed at ANALYSIS time from the constant `width`
    argument (`analyze()` runs on the driver before planning, so the
    column count is a plan-time property, not a runtime one).

    Registered un-decorated; tests wrap it with
    `udtf(CharNgrams, ...)`-style registration via `pyspark.sql.
    functions.udtf` + `analyze`, exercising the AnalyzeResult path.
    """

    @staticmethod
    def analyze(text, width):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType

        if not width.isConstantExpression:
            raise ValueError("width must be a constant")
        w = int(width.value)
        return AnalyzeResult(
            schema=StructType(
                [StructField("n_grams", LongType())]
                + [StructField(f"g{i}", StringType(), True) for i in range(w)]
            )
        )

    def eval(self, text: str, width: int):
        if text is None:
            yield (0,) + (None,) * width
            return
        grams: list[str | None] = [
            text[i : i + 3] for i in range(min(width, max(len(text) - 2, 0)))
        ]
        grams += [None] * (width - len(grams))
        yield (len(grams) - grams.count(None), *grams)
