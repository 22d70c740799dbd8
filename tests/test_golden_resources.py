"""Golden parity for the resource log: parse the reference's committed
per-batch docker-stats log with the engine's log-as-table operators
(regex extract O-D14, forward-filled phase, unit normalization O-D15,
rollup O-D10, top-1 O-D8) and reproduce its known extremes — peak
ClickHouse CPU 35.94% (BASELINE.md) and the BASELINE-phase CPU total."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.operators.metrics import to_kib

LOG = (
    "/root/reference/testing-results/"
    "peerdb-resource-usage-2025-08-29-13-03-38.log"
)
PHASE_RE = r"^\d{4}-\d{2}-\d{2} [\d:]+\t(\S+)$"
STAT_RE = r"^(\S+)\s+([\d.]+)%\s+([\d.]+)([KMG]iB) / "


def _stats(spark):
    lines = spark.read.text(LOG).select(
        "value", F.monotonically_increasing_id().alias("idx")
    )
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    phased = lines.select(
        "value",
        "idx",
        F.last(
            F.when(
                F.col("value").rlike(PHASE_RE),
                F.regexp_extract("value", PHASE_RE, 1),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("phase"),
    )
    return phased.filter(F.col("value").rlike(STAT_RE)).select(
        "phase",
        F.regexp_extract("value", STAT_RE, 1).alias("container"),
        F.regexp_extract("value", STAT_RE, 2).cast("double").alias("cpu"),
        to_kib(
            F.regexp_extract("value", STAT_RE, 3).cast("double"),
            F.regexp_extract("value", STAT_RE, 4),
        ).alias("mem_kib"),
    )


def test_peak_cpu_is_published_clickhouse_value(spark):
    """BASELINE.md / resource log: peak container CPU during run 1 is
    ClickHouse at 35.94% — the O-D8 top-1 pattern."""
    top = (
        _stats(spark)
        .orderBy(F.desc("cpu"), F.asc("container"))
        .limit(1)
        .collect()[0]
    )
    assert top["container"] == "clickhouse"
    assert top["cpu"] == 35.94
    assert top["phase"].startswith("INSERT-BATCH")


def test_baseline_phase_cpu_rollup(spark):
    """O-D10 per-phase rollup: BASELINE idle footprint sums the 11
    containers' CPU (log lines :9-33) = 28.16%."""
    row = (
        _stats(spark)
        .filter(F.col("phase") == "BASELINE")
        .agg(
            F.round(F.sum("cpu"), 2).alias("total_cpu"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert row["n"] == 11
    assert row["total_cpu"] == 28.16


def test_unit_normalization_peak_mem(spark):
    """O-D15 unit conversion feeding the peak row: 371.5 MiB ->
    380 416 KiB exactly."""
    top = (
        _stats(spark)
        .filter(F.col("container") == "clickhouse")
        .orderBy(F.desc("cpu"))
        .limit(1)
        .collect()[0]
    )
    assert top["mem_kib"] == 371.5 * 1024
