"""shuffle_corpus: reproducible global corpus permutation (epoch =
seed). Asserts the permutation is exact (DuckDB replays it
bit-for-bit), contiguous, partitioning-independent, and seed-varied.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from .oracle_util import duckdb_run
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    shuffle_corpus,
    shuffle_oracle,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _positions(df) -> dict[int, int]:
    return {
        r.doc_id: r.shuffle_pos
        for r in df.select("doc_id", "shuffle_pos").collect()
    }


def test_positions_match_duckdb_oracle(spark):
    got = _positions(shuffle_corpus(_docs(spark), seed=3))
    want = dict(
        duckdb_run(shuffle_oracle(3), SF_SMOKE)
        .itertuples(index=False, name=None)
    )
    assert got == want


def test_contiguous_permutation(spark):
    docs = _docs(spark)
    n = docs.count()
    pos = _positions(shuffle_corpus(docs, seed=0))
    assert sorted(pos.values()) == list(range(n))


def test_partitioning_independent(spark):
    docs = _docs(spark)
    a = _positions(shuffle_corpus(docs.repartition(3), seed=11))
    b = _positions(shuffle_corpus(docs.repartition(13), seed=11, partitions=5))
    assert a == b


def test_assert_permutation_passes_deterministic_input(spark):
    # the opt-in invariant job (ADVICE r3): on a deterministic input
    # the check is silent; it exists to catch inputs that change
    # between the offsets job and the rank job
    docs = _docs(spark)
    n = docs.count()
    pos = _positions(shuffle_corpus(docs, seed=5, assert_permutation=True))
    assert sorted(pos.values()) == list(range(n))


def test_epochs_differ(spark):
    docs = _docs(spark)
    e0 = _positions(shuffle_corpus(docs, seed=0))
    e1 = _positions(shuffle_corpus(docs, seed=1))
    assert e0 != e1
    # both are permutations of the same id set
    assert set(e0) == set(e1)


def test_permutation_at_scale_beyond_range_sampling(spark):
    # Regression (review find): deriving offsets from
    # repartitionByRange partition ids broke the permutation once
    # partitions exceeded the range-exchange sample size (~6k
    # duplicate positions at 200k rows) — the two jobs drew different
    # sampled bounds. Value-based hash-range buckets must agree
    # across jobs at any size.
    n = 200_000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = shuffle_corpus(df, seed=7, id_col="doc_id")
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (stats.n, stats.d, stats.lo, stats.hi) == (n, n, 0, n - 1)


def test_partition_order_streams_shuffle_order(spark):
    # iterating partitions in index order must yield shuffle_pos in
    # ascending order (what a sequential training loader reads)
    out = shuffle_corpus(_docs(spark), seed=5)
    seq = [
        r.shuffle_pos
        for part in out.select("shuffle_pos").rdd.glom().collect()
        for r in part
    ]
    assert seq == sorted(seq)


def test_get_spark_applies_explicit_shuffle_partitions(spark):
    """ADVICE r5: an explicit shuffle_partitions request must reach an
    ALREADY-ACTIVE session (the conf is runtime-modifiable); without
    an explicit request the active session's setting is untouched."""
    from peerdb_cdc_psql_clickhouse_spark.session import get_spark

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s2 = get_spark(shuffle_partitions=7)
        assert s2 is spark  # same active session
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        get_spark()  # no explicit request -> untouched
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
