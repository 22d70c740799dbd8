"""Incremental view maintenance (IVM) for aggregates over a CDC feed —
the engine analog of the reference target's ClickHouse materialized
views / AggregatingMergeTree (the standard way ClickHouse users keep
rollups of a PeerDB-mirrored table fresh without rescanning it).

`maintain_aggregate` advances a grouped (sum, count) aggregate table by
ONE change micro-batch using only:
  - the batch itself,
  - the pre-batch target rows for the touched keys (a keyed join —
    partition-prunable under the mirror's pk-bucket layout),
  - the current aggregate table (joined by group).
Work per batch is O(batch x touched groups), never O(target): classic
delta maintenance — new contributions minus old contributions of
affected keys, merged into the running aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import latest_state


def aggregate_of(
    target: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The maintained invariant, computed from scratch (used to seed
    the aggregate and as the test oracle): per-group sum and count."""
    return target.groupBy(group_col).agg(
        F.sum(value_col).alias("agg_sum"),
        F.count(F.lit(1)).alias("agg_cnt"),
    )


def maintain_aggregate(
    agg: DataFrame | None,
    target_before: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One IVM step: aggregate table after applying `batch` to a
    target whose pre-batch state is `target_before`.

    Per key, only the batch-final event matters against the old row
    (intermediate versions within the batch cancel): delta =
    (final non-delete contributions) - (old contributions of touched
    keys), merged into `agg` by group; groups reaching count 0 drop
    out. agg=None seeds from aggregate_of(target_before).
    """
    keys = list(key_cols)
    if agg is None:
        agg = aggregate_of(target_before, group_col, value_col)

    effective = latest_state(batch, keys, keep_deletes=True)
    touched = effective.select(*keys).distinct()
    old_contrib = target_before.join(touched, keys).select(
        F.col(group_col).alias("g"),
        (-F.col(value_col)).alias("dv"),
        F.lit(-1).cast("long").alias("dc"),
    )
    new_contrib = effective.filter(F.col("_op") != "delete").select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("dv"),
        F.lit(1).cast("long").alias("dc"),
    )
    delta = (
        old_contrib.unionByName(new_contrib)
        .groupBy("g")
        .agg(F.sum("dv").alias("dv"), F.sum("dc").alias("dc"))
    )
    merged = (
        agg.join(delta, agg[group_col] == delta.g, "full")
        .select(
            F.coalesce(F.col(group_col), F.col("g")).alias(group_col),
            (
                F.coalesce(F.col("agg_sum"), F.lit(0))
                + F.coalesce(F.col("dv"), F.lit(0))
            ).alias("agg_sum"),
            (
                F.coalesce(F.col("agg_cnt"), F.lit(0).cast("long"))
                + F.coalesce(F.col("dc"), F.lit(0).cast("long"))
            ).alias("agg_cnt"),
        )
        .filter(F.col("agg_cnt") > 0)
    )
    return merged
