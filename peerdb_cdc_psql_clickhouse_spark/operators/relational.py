"""Relational operations the reference issues as SQL (SURVEY.md §2.1).

Each O-Rxx maps a query shape the reference's scripts send to
PostgreSQL/ClickHouse onto the driver's TPC-H-ish testdata, expressed
with the DataFrame API so Catalyst gets pushdown/pruning for free.

Reference citations are in each docstring (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import declare


@declare(
    "r1_probe",
    "SELECT 1 AS one",
    doc="O-R1 health probe SELECT 1 (insert.ps1:63,77; monitor.ps1:995,1005)",
)
def r1_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(F.lit(1).alias("one"))


@declare(
    "r2_projection_scan",
    "SELECT c_custkey FROM customer",
    doc="O-R2 full-table projection scan (insert.ps1:96,123) — column "
    "pruning means the parquet scan reads exactly one column",
)
def r2_projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_custkey")


@declare(
    "r3_distinct_limit",
    "SELECT DISTINCT o_custkey AS purchaser FROM orders "
    "ORDER BY purchaser LIMIT 10",
    doc="O-R3 SELECT DISTINCT purchaser FROM orders LIMIT 10 "
    "(insert.ps1:106). ORDER BY added for determinism; distinct is a "
    "partial-agg shuffle, limit is pushed to each partition",
)
def r3_distinct_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("purchaser"))
        .distinct()
        .orderBy("purchaser")
        .limit(10)
    )


@declare(
    "r4_max",
    "SELECT MAX(o_orderkey) AS max_id FROM orders",
    doc="O-R4 ungrouped MAX (insert.ps1:149) — partial max per "
    "partition, single-row exchange",
)
def r4_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderkey").alias("max_id")
    )


@declare(
    "r5_count",
    "SELECT COUNT(*) AS cnt FROM orders",
    doc="O-R5 ungrouped COUNT(*) (insert.ps1:163; monitor.ps1:727,824)",
)
def r5_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@declare(
    "r6_count_and_size",
    "SELECT COUNT(*) AS cnt, "
    "CAST(SUM(LENGTH(o_orderpriority) + LENGTH(o_orderstatus)) AS BIGINT) "
    "AS str_bytes FROM orders",
    doc="O-R6 count + relation-size in one scan (monitor.ps1:604-609); "
    "size analog = summed string byte-lengths",
)
def r6_count_and_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.length("o_orderpriority") + F.length("o_orderstatus")
        ).alias("str_bytes"),
    )


@declare(
    "r7_filtered_sum",
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
    "AS DOUBLE) AS total_bytes "
    "FROM lineitem WHERE l_returnflag = 'A'",
    doc="O-R7 filtered SUM over catalog parts (monitor.ps1:664,1074); "
    "filter reaches the parquet scan as a pushed predicate",
)
def r7_filtered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "A")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bytes")
        )
    )


@declare(
    "r8_cross_join_group",
    "SELECT COUNT(*) AS cnt, r_name AS setting "
    "FROM nation, region WHERE n_regionkey = r_regionkey "
    "GROUP BY r_name",
    doc="O-R8 implicit-comma join + filter + GROUP BY "
    "(monitor.ps1:1036, pg_stat_activity x pg_settings). region is "
    "tiny -> Catalyst broadcasts it; no shuffle on the probe side",
)
def r8_cross_join_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.crossJoin(F.broadcast(region))
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("setting"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", "setting")
    )


@declare(
    "r9_multi_scalar",
    "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
    "AS total_qty, COUNT(*) AS row_cnt, MAX(l_orderkey) AS max_key "
    "FROM lineitem",
    doc="O-R9 multi-scalar one-row select (monitor.ps1:1057 "
    "pg_database_size/pg_total_relation_size/pg_indexes_size) — one "
    "scan, three partial aggregates",
)
def r9_multi_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.max("l_orderkey").alias("max_key"),
    )


@declare(
    "r10_version_probe",
    None,  # engine version can't be oracle-matched; rows-only check
    doc="O-R10 SELECT version() (monitor.ps1:534,550,566)",
)
def r10_version_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit("spark").alias("engine"), F.lit(spark.version).alias("version")
    )
