"""Simulate the driver's verify loop against __spark_entry__.py.

Deliberately uses a VANILLA SparkSession (no engine-tuned configs) and
path-based import, mirroring how the external driver consumes the
contract. Prints one line per query: MATCH / ROWS_ONLY / MISMATCH.
"""

from __future__ import annotations

import importlib.util
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from tests.oracle_util import _norm_frame, driver_canon_check, duckdb_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

flag = mod.entry(spark)
n = flag.count()
print(f"entry(): {n} rows, schema={[f.name for f in flag.schema.fields]}")
assert n > 0

qs = mod.queries()
oracles = mod.oracle_sql()
fails = []
for name in qs:  # registry order — exactly what the driver iterates
    try:
        df = qs[name](spark, SF)
        got = df.toPandas()
        driver_canon_check(got)  # dies on binary/array cells like the driver
        if name not in oracles:
            print(f"  {name:24s} ROWS_ONLY rows={len(got)}")
            continue
        want = duckdb_run(oracles[name], SF)
        g_rows, g_cols = _norm_frame(got)
        w_rows, w_cols = _norm_frame(want)
        ok = g_cols == w_cols and g_rows == w_rows
        print(
            f"  {name:24s} {'MATCH' if ok else 'MISMATCH'} "
            f"rows={len(g_rows)}/{len(w_rows)}"
        )
        if not ok:
            fails.append(name)
            if g_cols != w_cols:
                print(f"    cols: spark={g_cols} duck={w_cols}")
            else:
                diff = [
                    (g, w) for g, w in zip(g_rows, w_rows) if g != w
                ][:2]
                print(f"    first diffs: {diff}")
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"  {name:24s} ERROR {type(e).__name__}: {str(e)[:140]}")

print(f"\n{len(qs) - len(fails)}/{len(qs)} OK; failures: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
