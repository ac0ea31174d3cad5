"""st43: streaming STATE-OPERATOR OBSERVABILITY — the metrics twin of
st40's state reads.

st40 reads what state HOLDS (the statestore source); this lane pins
what the engine DID to it per trigger, from
``StreamingQueryProgress.stateOperators``: how many input rows the
watermark DROPPED (the late-data policy actually enforced), how many
state rows were updated/removed, how many the store holds, and what
they cost in memory. At 100 TB these counters are the difference
between "the funnel is correct" and "the funnel silently discards 2%
of conversions that arrive >2h late" — numRowsDroppedByWatermark is
the ONLY place that loss is visible, because dropped rows never reach
state, the sink, or any count the query itself emits.

Granularity boundary (measured on 4.1.2, pinned in the tests): for an
AGGREGATE, numRowsDroppedByWatermark counts rows entering the STATE
operator — groups surviving the partial aggregation — not raw inputs
(3 late rows in one (window, key) group charge 1). Operators that see
raw rows (stream-stream join, dedup) charge per input row. An
input-granular late-data SLO therefore reads the metric off a
row-granular operator, or ensures distinct groups.

Contract (tests/test_streaming.py):
- a windowed agg fed planted late rows reports numRowsDroppedByWatermark
  == exactly the planted count, and the emitted windows exclude them;
- st39's chained query reports BOTH state operators (symmetric hash
  join + state store save) with nonzero state rows and memory — one
  progress stream observes the whole chain.

Public surface: ``state_operator_metrics`` folds a query's
``recentProgress`` into per-operator totals (counters summed across
triggers, gauges from each operator's LAST report).
"""

from __future__ import annotations

_COUNTERS = (
    "numRowsDroppedByWatermark",
    "numRowsUpdated",
    "numRowsRemoved",
    "numLateInputs",  # session-window operators report this name
)
_GAUGES = ("numRowsTotal", "memoryUsedBytes")


def state_operator_metrics(progresses) -> dict[str, dict[str, int]]:
    """Fold a list of StreamingQueryProgress dicts (``q.recentProgress``)
    into {operator_key: metrics}. COUNTERS (rows dropped / updated /
    removed) are per-trigger deltas — summed across all reports;
    GAUGES (state rows held, memory) are levels — the last report
    wins. Operators are keyed ``<index>:<operatorName>`` because a
    chained query (st39) runs several operators whose names may
    repeat; the index is the operator's position in the progress
    report, stable across triggers for one query."""
    folded: dict[str, dict[str, int]] = {}
    for p in progresses:
        for i, op in enumerate(p.get("stateOperators", []) or []):
            key = f"{i}:{op.get('operatorName', '?')}"
            m = folded.setdefault(
                key, {k: 0 for k in _COUNTERS + _GAUGES}
            )
            for k in _COUNTERS:
                m[k] += int(op.get(k, 0) or 0)
            for k in _GAUGES:
                m[k] = int(op.get(k, m[k]) or 0)
    return folded


def total_dropped_by_watermark(progresses) -> int:
    """Sum of late input rows every state operator refused across the
    query's life — the number an ingest SLO alert fires on."""
    return sum(
        m["numRowsDroppedByWatermark"] + m["numLateInputs"]
        for m in state_operator_metrics(progresses).values()
    )
