"""Plan-metrics regression gate — the ZERO-HEADROOM complement to
tools/scale_audit.py. Wall-clock envelopes need 1.7x headroom because
seconds on this box drift +/-15%; the executed plan's own metrics
don't drift at all at fixed input. This tool runs every batch lane at
a fixed sf, extracts the executed adaptive plan's fingerprint
(inspect.executed_plan_metrics: scan/shuffle/broadcast row counts,
node counts, join strategies, Python stages), and diffs it against the
COMMITTED record tools/plan_metrics.json — any drift is a regression
by definition, no noise adjudication needed. The two real regression
classes this repo has seen are caught exactly:

  - lost pushdown  -> scan_rows jumps (the scan re-reads pruned rows)
  - extra shuffle / lost broadcast -> n_shuffles / joins flips

This generalizes the per-lane pushdown contracts of
tests/test_plans.py (q108/q116/q124...) to ALL batch lanes in one
command.

Scope, stated honestly: the gate fingerprints each lane's RETURNED
DataFrame's executed plan. Lanes that must execute EAGERLY in-scope
(q131's conf-scoped AQE conversion, q136's scoped cache, q128/q114's
data-derived cutoffs) return a small local replay, so their real
scan/cache/join plan is NOT visible here — those lanes' in-scope plan
contracts live in tests/test_plans.py (q131 flip, q136 batch-pruning
metrics, q134 scan counts), which the suite runs every time. The gate
also fails when a committed lane disappears from the registry — a
deleted lane is the most total plan regression.

Usage (run from /root/repo — Python Data Source lanes pickle by module
reference and workers resolve the package via cwd):
    python tools/plan_audit.py                      # gate all lanes
    python tools/plan_audit.py --lanes q01_pricing_summary,q100_bucketed_colocated_join
    python tools/plan_audit.py --update             # re-baseline
    python tools/plan_audit.py --sf /root/testdata/sf0.001  # separate bucket

Record format (committed): {"<sf basename>": {"<lane>": {fingerprint}}}
— or, for a lane with a KNOWN AQE-timing alternate, a LIST of
fingerprints, any of which passes. Fingerprints are compared for EXACT
equality. A legitimate plan change (a lane rewritten, Spark upgraded)
re-baselines with --update — the diff of plan_metrics.json in review
then SHOWS the plan change, which is the point.

Alternates, stated honestly (r11): AQE re-optimizes between stage
materializations, and WHICH stages have materialized when the replan
loop runs is a timing race — measured on q57, whose plan carries 6
shuffle exchanges in most executions and 5 when a late replan elides
one (same values, same joins; observed flapping with identical code,
input, and session). For such a lane, `--add-alternate --lanes <lane>`
APPENDS the currently-observed fingerprint to the committed entry
instead of replacing it — the record's diff shows exactly which
alternate was admitted and why (this comment). Every other lane stays
single-fingerprint, zero headroom.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORD_PATH = os.path.join(os.path.dirname(__file__), "plan_metrics.json")


def _fingerprint(spark, key: str, sf_dir: str) -> dict:
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES
    from etl_sql_and_pyspark_developement__spark.plans.inspect import (
        executed_plan_metrics,
    )

    df = QUERIES[key](spark, sf_dir)
    df.collect()  # populate the executed plan's metrics
    return executed_plan_metrics(df)


def _diff(old: dict, new: dict) -> list[str]:
    lines = []
    for k in sorted(set(old) | set(new)):
        if old.get(k) != new.get(k):
            lines.append(f"{k}: recorded {old.get(k)!r} -> ran {new.get(k)!r}")
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--lanes",
        default=None,
        help="comma-separated lane keys; default = every batch lane",
    )
    ap.add_argument(
        "--update",
        action="store_true",
        help="write the measured fingerprints back to the record",
    )
    ap.add_argument(
        "--add-alternate",
        action="store_true",
        help="append the measured fingerprint as an accepted alternate "
        "for the given --lanes (AQE-timing flappers only — see module "
        "docstring) instead of replacing the entry",
    )
    args = ap.parse_args()
    if args.add_alternate and not args.lanes:
        ap.error("--add-alternate requires --lanes (never blanket)")

    from etl_sql_and_pyspark_developement__spark.plans import QUERIES
    from etl_sql_and_pyspark_developement__spark.session import get_spark

    record: dict = {}
    if os.path.exists(RECORD_PATH):
        with open(RECORD_PATH) as f:
            record = json.load(f)
    bucket = record.setdefault(os.path.basename(args.sf.rstrip("/")), {})

    lanes = args.lanes.split(",") if args.lanes else sorted(QUERIES)

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    drifted: dict[str, list[str]] = {}
    errored: dict[str, str] = {}
    for key in lanes:
        try:
            fp = _fingerprint(spark, key, args.sf)
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            errored[key] = f"{type(e).__name__}: {e}"
            print(f"# {key}: ERROR {errored[key][:200]}", file=sys.stderr)
            continue
        if args.add_alternate:
            alts = bucket.get(key)
            alts = [] if alts is None else (alts if isinstance(alts, list) else [alts])
            if fp in alts:
                print(f"# {key}: alternate already recorded", file=sys.stderr)
            else:
                alts.append(fp)
                bucket[key] = alts if len(alts) > 1 else alts[0]
                print(
                    f"# {key}: alternate added ({len(alts)} accepted forms)",
                    file=sys.stderr,
                )
            continue
        if args.update:
            bucket[key] = fp
            print(f"# {key}: recorded", file=sys.stderr)
            continue
        old = bucket.get(key)
        alts = (
            None if old is None else (old if isinstance(old, list) else [old])
        )
        if old is None:
            print(f"# {key}: no committed record (run --update)", file=sys.stderr)
            drifted[key] = ["no committed record"]
        elif fp not in alts:
            drifted[key] = _diff(alts[0], fp)
            print(f"# {key}: DRIFT", file=sys.stderr)
            for line in drifted[key]:
                print(f"#   {line}", file=sys.stderr)
        else:
            print(f"# {key}: ok", file=sys.stderr)

    # a lane DELETED from the registry is the most total plan
    # regression there is — on full runs, committed entries with no
    # matching QUERIES key are drift (and a full --update prunes them)
    if not args.lanes:
        stale = sorted(set(bucket) - set(QUERIES))
        for key in stale:
            if args.update:
                del bucket[key]
                print(f"# {key}: pruned (no longer registered)", file=sys.stderr)
            else:
                drifted[key] = ["recorded lane is no longer in QUERIES"]
                print(f"# {key}: DRIFT (lane unregistered)", file=sys.stderr)

    if args.update or args.add_alternate:
        with open(RECORD_PATH, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# record written to {RECORD_PATH}", file=sys.stderr)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "lanes": len(lanes),
                "drifted": drifted,
                "errored": errored,
                "updated": bool(args.update or args.add_alternate),
            },
            sort_keys=True,
        )
    )
    spark.stop()
    sys.exit(1 if (drifted or errored) else 0)


if __name__ == "__main__":
    main()
