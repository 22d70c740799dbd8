"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query (O-D1..O-D4 CDC parity report — the
reference monitor's §4 flow analysis, monitor.ps1:703-794) on sf0.001.
queries()/oracle_sql() expose the full SURVEY.md §2 inventory from
peerdb_cdc_psql_clickhouse_spark.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from peerdb_cdc_psql_clickhouse_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.metrics import _parity

    sf_dir = "/root/testdata/sf0.001"
    parity = _parity(spark, sf_dir)
    return parity.select(
        "table_name",
        "src_cnt",
        "tgt_cnt",
        "lag",
        F.when(F.col("lag") == 0, "SYNCED")
        .when(F.abs("lag") <= 5, "NEAR_SYNC")
        .otherwise("LAG")
        .alias("status"),
        F.when(
            F.col("src_cnt") > 0,
            F.round(F.col("tgt_cnt").cast("double") / F.col("src_cnt") * 100, 1),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(5,1)")
        .alias("sync_pct"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable declared query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
