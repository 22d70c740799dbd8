"""End-to-end training-data pipeline composition: corpus select ->
exact stratified sample -> sequence packing -> epoch shuffle. Each
stage is verified on its own elsewhere; this asserts they COMPOSE —
the packed bins stream through shuffle_corpus as reproducible epochs
with every invariant (budget, membership, permutation) intact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    X7B_BUDGET,
    shuffle_corpus,
    x7b_training_mix,
)


def _epoch(spark, seed: int):
    packed = x7b_training_mix(spark, SF_SMOKE)
    bins = packed.groupBy("bin_id").agg(
        F.sum("token_cnt").alias("bin_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return packed, shuffle_corpus(bins, seed=seed, id_col="bin_id")


def test_bins_shuffle_into_contiguous_epoch(spark):
    packed, epoch0 = _epoch(spark, seed=0)
    rows = epoch0.collect()
    n_bins = packed.select("bin_id").distinct().count()
    assert sorted(r.shuffle_pos for r in rows) == list(range(n_bins))
    # budget invariant survives the composition
    assert all(
        r.bin_tokens <= X7B_BUDGET or r.n_docs == 1 for r in rows
    )


def test_epochs_reproducible_and_distinct(spark):
    _, a = _epoch(spark, seed=1)
    _, b = _epoch(spark, seed=1)
    _, c = _epoch(spark, seed=2)
    pa = {r.bin_id: r.shuffle_pos for r in a.collect()}
    pb = {r.bin_id: r.shuffle_pos for r in b.collect()}
    pc = {r.bin_id: r.shuffle_pos for r in c.collect()}
    assert pa == pb, "same epoch seed must reproduce the same order"
    assert pa != pc, "different epochs must differ"
    assert set(pa) == set(pc)
