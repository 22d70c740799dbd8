"""Per-query profiling for the optimization rounds.

For every declared query, times (a) builder call = plan construction
(py4j + any driver-side work) and (b) the noop-sink execution, over
N iterations, reporting medians. Optionally dumps
.explain('formatted') per query to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/profile_queries.py [--plans plans/r18 --suffix before]
      [--iters 3] [--names q1,q2,...] [--sf /root/testdata/sf0.1]

Prints one JSON line: {"build": {...}, "exec": {...}, "total": {...}}
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
    ap.add_argument("--names", default=None)
    ap.add_argument("--plans", default=None, help="dir to write explain() files")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if args.names:
        keep = args.names.split(",")
        queries = {n: queries[n] for n in keep}

    # JVM + codegen warmup identical to bench.py methodology
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    for name in sorted(queries):
        try:
            queries[name].build(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()

    build_runs: dict[str, list[float]] = {}
    exec_runs: dict[str, list[float]] = {}
    for it in range(args.iters):
        for name in sorted(queries):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            try:
                df = queries[name].build(spark, args.sf)
            except Exception as e:
                print(f"BUILD FAIL {name}: {e}", file=sys.stderr)
                continue
            t1 = time.perf_counter()
            if it == 0 and args.plans:
                os.makedirs(args.plans, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(plan)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"EXEC FAIL {name}: {e}", file=sys.stderr)
                continue
            t2 = time.perf_counter()
            build_runs.setdefault(name, []).append(t1 - t0)
            exec_runs.setdefault(name, []).append(t2 - t1)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)

    med = lambda xs: round(statistics.median(xs), 3)
    build = {q: med(ts) for q, ts in sorted(build_runs.items())}
    execm = {q: med(ts) for q, ts in sorted(exec_runs.items())}
    total = {q: round(build[q] + execm[q], 3) for q in build}
    out = {
        "build": build,
        "exec": execm,
        "total": total,
        "sum_build": round(sum(build.values()), 2),
        "sum_exec": round(sum(execm.values()), 2),
        "sum_total": round(sum(total.values()), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
