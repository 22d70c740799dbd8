"""Per-query Spark JOB counts + timing — structural A/B metric that
box noise cannot touch. Runs each named query N times, reports the
number of Spark jobs launched per run (build+exec), median wall time.

Usage: python scripts/measure_jobs.py --names q1,q2 [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peerdb_cdc_psql_clickhouse_spark.registry import all_queries
from peerdb_cdc_psql_clickhouse_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--names", required=True)
    args = ap.parse_args()

    spark = get_spark("measure-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    keep = args.names.split(",")
    queries = {n: queries[n] for n in keep}

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    warm = "/root/testdata/sf0.001"
    for name in sorted(queries):
        try:
            queries[name].build(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()

    sc = spark.sparkContext
    times: dict[str, list[float]] = {}
    # per-iteration counts (ADVICE r18): plan-build caches warm vs
    # cold can make the first iteration launch MORE jobs than later
    # ones; keeping only the last run's count skewed the structural
    # A/B metric this script exists for. Report the full list plus max.
    jobs: dict[str, list[int]] = {}
    for it in range(args.iters):
        for name in sorted(queries):
            group = f"mj_{name}_{it}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            queries[name].build(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            times.setdefault(name, []).append(dt)
            jobs.setdefault(name, []).append(
                len(sc.statusTracker().getJobIdsForGroup(group))
            )
            spark.catalog.clearCache()
    out = {
        "jobs": {q: max(js) for q, js in jobs.items()},
        "jobs_per_iter": jobs,
        "time_median": {q: round(statistics.median(ts), 3) for q, ts in times.items()},
        "time_min": {q: round(min(ts), 3) for q, ts in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
