"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES
    from etl_sql_and_pyspark_developement__spark.session import get_spark

    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("WARN")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # plan, not session startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def calibration() -> float:
        """Fixed data-independent CPU probe: sum over a 20M range.
        Its wall time on an idle box is stable (~envelope/2); when the
        box is busy the probe slows with it, so a probe outside the
        committed envelope marks the WHOLE run's timings as
        load-contaminated (two rounds were spent disproving phantom
        regressions that were exactly this)."""
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        return time.perf_counter() - t0

    # Committed envelope (seconds) for the calibration probe on THIS
    # container unloaded, measured solo best-of-3 ~0.07s; ~3x
    # headroom. min(start, end) above it => flag the run as loaded.
    cal_envelope = float(
        os.environ.get("SPARK_GRAFT_CAL_ENVELOPE", "0.2")
    )
    calibration()  # warm the range/codegen path once, untimed
    cal_start = min(calibration() for _ in range(3))

    # Best-of-N per query (default 2): the first execution pays
    # per-query codegen/planning (~1-2s of JVM work unrelated to the
    # data plan) and this box's load is spiky; the min reflects the
    # steady-state plan cost that actually scales. Set
    # SPARK_GRAFT_BENCH_RUNS=1 for the old single-shot behavior.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    # Warm-up-depth diagnostic (r11): first-run / best-of-N per query.
    # Lanes whose ratio is large (>~3x) are the "warm-up lottery"
    # movers prior rounds spent adjudication re-measuring (q61/q111
    # signatures) — recording the ratio in the full record lets a
    # round-over-round reader see AT A GLANCE that an apparent mover
    # was caught cold, without a solo re-measure. Diagnostics only;
    # the timing methodology (best-of-N, min) is unchanged.
    cold_over_best: dict[str, float] = {}
    for key in sorted(QUERIES):
        best = None
        first = None
        extra_done = False
        r = 0
        while r < runs or (not extra_done and best is not None and best > 1.5):
            # Heavy queries (>1.5s best-of-2) get ONE extra run: this
            # box's load is spiky and the heavy tail dominates the
            # total, so a third sample there buys most of the variance
            # reduction for ~none of the cost on the cheap majority.
            if r >= runs:
                extra_done = True
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            # Materialize EVERY output column through the noop sink:
            # a count() action lets Catalyst prune result columns and
            # even eliminate whole sub-plans (a left join on unique
            # keys with no referenced right columns is dropped
            # entirely — d18's real cost was invisible to count), so
            # counted timings flatter any query whose tail the
            # optimizer can prove redundant for row counting. The
            # noop write is the standard full-materialization bench
            # action: all columns computed, nothing written.
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if first is None:
                first = dt
            best = dt if best is None else min(best, dt)
            n = df.count()  # row count for the log; outside the timed section
            # Queries persist their own intermediates; drop them
            # between runs (outside the timed section) so one run's
            # cache neither pressures memory nor flatters the next.
            # clearCache only frees InMemoryRelations — NOT
            # localCheckpoint RDD blocks (the dedup/IVF queries'
            # materialization), which are freed when the frame is
            # GC'd on BOTH sides: drop the Python ref, collect so
            # py4j releases the JVM handle, and nudge the JVM GC so
            # ContextCleaner reclaims the blocks before the next
            # heavy query instead of during it.
            del df
            spark.catalog.clearCache()
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            r += 1
        timings[key] = round(best, 3)
        cold_over_best[key] = round(first / best, 2) if best > 0 else 1.0
        print(f"# {key}: {timings[key]:.3f}s rows={n}", file=sys.stderr)

    cal_end = min(calibration() for _ in range(3))
    calibration_s = round(min(cal_start, cal_end), 3)
    try:
        loadavg_1m = round(os.getloadavg()[0], 2)
        # normalized by the core count the session was built with —
        # a loadavg of 6 is idle on 32 cores and saturated on 4, and
        # driver records from different boxes should self-adjudicate.
        # ValueError (malformed env) must not kill the whole record;
        # unset falls back to the real core count, not a constant.
        n_cpus = int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32)
        )
        loadavg_per_cpu = round(loadavg_1m / max(n_cpus, 1), 3)
    except (OSError, ValueError):
        loadavg_1m = None
        loadavg_per_cpu = None
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    record = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        # round 3+: timings materialize ALL output columns via the
        # noop sink (count() let Catalyst prune/eliminate work) —
        # totals are NOT comparable to rounds 1-2, which undercounted
        "action": "noop-write-all-columns",
        # the inventory grows round over round — normalize totals by
        # n_queries (or compare per-query) across rounds
        "n_queries": len(timings),
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
        # Load guard: calibration_s = best of 3 runs of a fixed CPU
        # probe at start and end; loaded_box means even the best
        # exceeded the committed unloaded envelope — treat this run's
        # timings as load-contaminated, don't chase "regressions".
        "calibration_s": calibration_s,
        "calibration_envelope_s": cal_envelope,
        "loadavg_1m": loadavg_1m,
        "loadavg_per_cpu": loadavg_per_cpu,
        "loaded_box": bool(calibration_s > cal_envelope),
        # first-run / best-of-N per query — the warm-up-depth flag
        # (large ratio = the lane was caught cold; see comment above)
        "cold_over_best": cold_over_best,
    }
    # Persist the FULL per-query record to a file: with 140+ queries the
    # one-line record exceeds the driver's stdout tail capture, so
    # BENCH_r03 recorded "parsed": null. Per-query timings live here.
    # BENCH_full.json is the sf0.1 record of record — a different-sf
    # run (the sf0.01 correctness-gate loop) must NOT clobber it, so
    # non-sf0.1 runs write a sf-stamped sibling instead (the
    # round-over-round comparison the judge reads stays intact
    # structurally, not via `git checkout --` vigilance).
    here = os.path.dirname(__file__)
    fname = (
        "BENCH_full.json"
        if record["sf"] == 0.1
        else f"BENCH_full_sf{sf or 'custom'}.json"
    )
    try:
        with open(os.path.join(here, fname), "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    except OSError:
        pass
    # Per-query timings in DRIVER-PARSEABLE form on stdout (r12,
    # VERDICT r11 item 2): one compact JSON object per line, printed
    # in ASCENDING time order immediately before the final line. The
    # driver's stdout capture keeps only the last ~2000 chars, so this
    # ordering guarantees the capture always contains the HEAVIEST
    # lanes (the ones round-over-round adjudication needs) plus the
    # intact final line — truncation only ever costs the cheapest
    # lanes. (Inlining the full 230-entry dict in the final line is
    # exactly what overflowed the capture and nulled BENCH_r03;
    # the full record stays in BENCH_full.json.)
    for k in sorted(timings, key=lambda q: (timings[q], q)):
        print(json.dumps({"q": k, "s": timings[k]}, separators=(",", ":")))
    # ...and stdout gets ONE compact machine-parseable line, printed
    # LAST so a tail capture always sees it whole.
    compact = {k: record[k] for k in
               ("metric", "value", "unit", "action", "n_queries", "sf",
                "calibration_s", "calibration_envelope_s", "loadavg_1m",
                "loadavg_per_cpu", "loaded_box")}
    compact["queries"] = {"see": fname}
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
