"""Partitioning & layout policy.

At 100 TB, parallelism comes from file splits (maxPartitionBytes) and
the target layout (pk-bucket + date partitioning, SURVEY §4). On small
single-file inputs — like the driver's one-file-per-table testdata —
a scan yields ONE split, serializing any compute-heavy derivation
(shingling, hashing, decoding) onto one core. fan_out() restores
parallelism in that case; on large multi-split inputs the same call is
a cheap rebalance of the same order of partitions.

reuse() marks a small derived frame for storage-level reuse when the
same subtree would otherwise be recomputed by both sides of a
self-join (e.g. MinHash signatures). The 100 TB analog is writing the
signature table out once and joining against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ahead of expensive per-row work."""
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def reuse(df: DataFrame) -> DataFrame:
    """Persist a small derived frame consumed by multiple plan branches
    (self-joins). Spark caches by logical plan, so repeated builds of
    the same query share one cache entry."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)
