"""Bucketed-table layout for co-located joins (SURVEY §4 engine
physical choices).

At 100 TB, repeated equi-joins/aggregations on the same key (pk
lookups, parity joins, CDC merge against a bucketed base) should not
pay a shuffle per query. Writing both sides bucketed by the join key
with the same bucket count lets Spark plan a shuffle-free sort-merge
join: each task reads matching bucket files from both tables.

This is the Spark-native analog of the reference target's keyed
MergeTree parts (monitor.ps1:664 system.parts): data pre-organized by
key so reads touch only the relevant slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed+sorted managed table keyed for
    co-located joins. Bucket count should match across tables that
    join with each other (and ideally shuffle.partitions)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables — planned without any
    Exchange (verified by tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
