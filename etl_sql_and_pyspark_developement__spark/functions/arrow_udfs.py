"""Arrow-vectorized scalar pandas UDFs — the PRICED Python scalar
boundary (q127's exhibit).

This module deliberately has NO ``from __future__ import annotations``:
pandas_udf resolves the function's type hints to pick the Arrow
serializer, and stringified annotations (what the future import turns
every hint into, module-wide) fail its signature check with
UNSUPPORTED_SIGNATURE. Keeping the UDF definitions here — the same
worker-import discipline as functions/udtfs.py and sources/pyds.py —
also lets Spark's Python workers re-import them by module name.

Policy context: row-at-a-time Python UDFs are banned from hot paths in
this repo; the Arrow scalar UDF is the acceptable middle rung of the
Python ladder (row UDF << pandas UDF < mapInArrow), and q127 measures
what even that rung costs against the builtin-expression twin.
"""

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import LongType


# LongType(), not the DDL string "bigint": a string return type is
# parsed through the ACTIVE SparkContext at decoration time, which
# would make this module unimportable without a live session (and
# module import is exactly what a Python worker does on a
# pickle-by-reference path).
@F.pandas_udf(LongType())
def quality_score_udf(s: pd.Series) -> pd.Series:
    """Deterministic integer quality micro-score per document:
    1000*n_chars + 7*n_spaces + 3*n_digits. Vectorized pandas str
    kernels across the whole Arrow batch — zero per-row Python.
    Integer outputs make the DuckDB oracle exact (no float
    tolerance); the builtin-expression twin in q127 computes the
    same closed form via length/translate/regexp_replace."""
    n = s.str.len()
    ws = s.str.count(" ")
    dg = s.str.count(r"[0-9]")
    # NULL text must yield NULL (the builtin twin's length(NULL)
    # semantics), so the arithmetic runs in float64 (NaN-propagating;
    # exact for these magnitudes, far below 2^53) and lands on the
    # NULLABLE Int64 dtype — NaN becomes pd.NA becomes SQL NULL. A
    # bare int64 astype would instead crash the worker on the first
    # null document.
    return (1000 * n + 7 * ws + 3 * dg).astype("Int64")


@F.pandas_udf(LongType())
def sum_squares_agg_udf(v: pd.Series) -> int:
    """GROUPED-AGG Arrow UDF (q137's exhibit) — the aggregate rung of
    the Python ladder (scalar: quality_score_udf / q127; table: the
    q118 UDTF; THIS: a whole-group reduction fed as one Arrow batch
    per group, usable in groupBy().agg() AND over unbounded windows).
    Sum of squares on int64 — deterministic, integer-exact, and
    builtin-replayable (sum(c*c)) so q137 can value-verify the
    boundary in-row. Callers bound the magnitude (q137 squares a
    1e5 residue) because numpy's int64 sum WRAPS silently where
    Spark's ANSI sum raises — the two overflow behaviors must never
    be allowed to diverge in a verified lane. NULL inputs drop,
    matching the builtin sum's NULL-skip semantics (nulls arrive as
    NaN in a float64 series — a bare int64 astype would crash the
    worker on the first null; the empty-inputs contract) — INCLUDING
    the all-NULL group, where the builtin returns NULL, not 0."""
    a = v.dropna()
    if a.empty:
        return None  # sum over an all-NULL group is NULL, like the builtin
    a = a.astype("int64")
    return int((a * a).sum())


@F.pandas_udf("boolean")
def is_not_nfc_udf(s: pd.Series) -> pd.Series:
    """True where the text is NOT in Unicode NFC (t26's kernel —
    Spark has no normalization builtin, so this is a legitimate
    Arrow-UDF use: logic expressions can't say). Vectorized apply of
    unicodedata.is_normalized per Arrow batch; NULL text stays NULL.
    Cross-engine contract: DuckDB's nfc_normalize(text) <> text must
    agree (both implement UAX #15 NFC), which is what lets t26's
    oracle value-verify this flag."""
    import unicodedata

    return s.map(
        lambda t: None if t is None else not unicodedata.is_normalized("NFC", t)
    ).astype("boolean")


@F.udf(LongType())
def quality_score_row_udf(text):
    """ROW-AT-A-TIME twin of quality_score_udf — the PRICING EXHIBIT
    for the classic ladder rung between the expression and the Arrow
    UDF (expression >> Arrow UDF >> THIS >> script pipe). Never used
    in any lane: each call pickles one row through the Python worker
    (BatchEvalPython — no Arrow batching, no vectorized kernels); it
    exists so the external-logic policy table carries a MEASURED
    number for the rung users actually reach for first (PLANS.md
    q127 pricing row). Semantics identical to the vectorized twin,
    asserted in tests/test_functions.py."""
    if text is None:
        return None
    n = len(text)
    ws = text.count(" ")
    # explicit ASCII range, NOT str.isdigit(): isdigit matches every
    # Unicode Nd/No digit (superscripts, Arabic-Indic, Thai) and
    # would silently price a DIFFERENT computation than the [0-9]
    # kernels of both twins
    dg = sum("0" <= c <= "9" for c in text)
    return 1000 * n + 7 * ws + 3 * dg
