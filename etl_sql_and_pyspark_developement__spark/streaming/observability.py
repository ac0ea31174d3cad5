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


class CollectingListener:
    """st46: the PUSH half of streaming observability — st43's
    state_operator_metrics PULLS recentProgress off a query handle
    you hold; production fleets instead register one
    StreamingQueryListener per session and receive EVERY query's
    lifecycle (started / per-trigger progress / terminated) as
    events, holding no handles at all. This is that surface,
    implemented over pyspark's StreamingQueryListener (classic-mode
    Python listeners, Spark 3.4+): events append to in-memory lists
    keyed by (query id, run id), with the per-trigger numInputRows /
    batchId / state-operator payloads preserved as dicts (the same
    JSON shape recentProgress returns, so state_operator_metrics
    folds listener-collected progress too — one metrics kernel for
    both transports).

    Contracts (tests/test_streaming.py): the listener sees the SAME
    batch ids and input-row totals the query's own recentProgress
    holds; start/termination events carry the matching ids; a
    listener registered for the session observes a query it was
    given NO handle to; removeListener detaches it (later queries
    unseen). At 100 TB the listener is the integration point for
    metric shippers (statsd/OTel) — the engine already emits
    everything per trigger, so monitoring costs no extra jobs, the
    st43 argument carried to fleet scope."""

    def __init__(self):
        import json as _json
        import threading

        from pyspark.sql.streaming import listener as _l

        self._json = _json
        self._lock = threading.Lock()
        self.started: list[dict] = []
        self.progress: list[dict] = []
        self.terminated: list[dict] = []

        outer = self

        class _Inner(_l.StreamingQueryListener):
            def onQueryStarted(self, event):
                with outer._lock:
                    outer.started.append(
                        {"id": str(event.id), "runId": str(event.runId),
                         "name": event.name}
                    )

            def onQueryProgress(self, event):
                # event.progress.json is the same payload
                # recentProgress serves — keep it as a dict so
                # state_operator_metrics folds it unchanged
                with outer._lock:
                    outer.progress.append(
                        outer._json.loads(event.progress.json)
                    )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                with outer._lock:
                    outer.terminated.append(
                        {"id": str(event.id), "runId": str(event.runId),
                         "exception": event.exception}
                    )

        self._inner = _Inner()

    def register(self, spark) -> None:
        spark.streams.addListener(self._inner)

    def unregister(self, spark) -> None:
        spark.streams.removeListener(self._inner)

    def progress_for(self, query_id: str) -> list[dict]:
        with self._lock:
            return [p for p in self.progress if p.get("id") == query_id]
