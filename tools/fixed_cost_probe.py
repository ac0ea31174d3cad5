"""Per-lane fixed-cost split probe (r12, VERDICT item 1).

For every declared query, measure — with the bench's own discipline
(warm best-of-2, noop sink, cache clear between runs) — where the wall
time goes:

- construct_s: QUERIES[key](spark, sf_dir) — Python query building plus
  any EAGER work (localCheckpoint materializations, sketch collects,
  fixture builds). Jobs run here are scheduling/planning paid BEFORE
  the action.
- action_s: the noop write of the returned frame.
- jobs_construct / jobs_action: Spark job counts in each phase (job
  group tagging), i.e. how many scheduler round-trips the lane pays.

Output: JSON to tools/fixed_cost_probe.json + a sorted table on stdout.
Diagnostic harness only — does not touch bench.py's contract.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES
    from etl_sql_and_pyspark_developement__spark.session import get_spark

    spark = get_spark("fixed-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    keys = sorted(only) if only else sorted(QUERIES)
    out: dict[str, dict] = {}
    for key in keys:
        best = None
        for r in range(2):
            gid_c = f"probe-construct-{key}-{r}"
            gid_a = f"probe-action-{key}-{r}"
            sc.setJobGroup(gid_c, key)
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobGroup(gid_a, key)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup("probe-cleanup", key)
            jobs_c = len(tracker.getJobIdsForGroup(gid_c))
            jobs_a = len(tracker.getJobIdsForGroup(gid_a))
            rec = {
                "construct_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs_construct": jobs_c,
                "jobs_action": jobs_a,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            del df
            spark.catalog.clearCache()
            import gc

            gc.collect()
            sc._jvm.System.gc()
        out[key] = best
        print(
            f"# {key}: total={best['total_s']:.3f}s "
            f"construct={best['construct_s']:.3f}s (jobs={best['jobs_construct']}) "
            f"action={best['action_s']:.3f}s (jobs={best['jobs_action']})",
            file=sys.stderr,
        )

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "fixed_cost_probe.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot_c = sum(v["construct_s"] for v in out.values())
    tot_a = sum(v["action_s"] for v in out.values())
    jobs_c = sum(v["jobs_construct"] for v in out.values())
    jobs_a = sum(v["jobs_action"] for v in out.values())
    print(
        json.dumps(
            {
                "n": len(out),
                "construct_total_s": round(tot_c, 1),
                "action_total_s": round(tot_a, 1),
                "jobs_construct": jobs_c,
                "jobs_action": jobs_a,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
