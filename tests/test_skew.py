"""salted_join: result-equivalence with a plain join on a skewed key
distribution, and the salt actually spreads a hot key across
partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.plans.skew import salted_join


def _frames(spark):
    # 10k rows, 95% on one hot key
    probe = spark.range(10_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    return probe, build


def test_salted_join_matches_plain_join(spark):
    probe, build = _frames(spark)
    plain = probe.join(build, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(probe, build, "k", salts=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer_keeps_unmatched(spark):
    probe, build = _frames(spark)
    missing = build.filter(F.col("k") < 40)  # drop some dims
    out = salted_join(probe, missing, "k", salts=8, how="left")
    assert out.count() == probe.count()
    assert out.filter(F.col("dim").isNull()).count() == probe.join(
        missing, "k", "left_anti"
    ).count()


def test_salt_spreads_hot_key(spark):
    probe, build = _frames(spark)
    salted = probe.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8)),
    )
    per_salt = (
        salted.filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # hot key present in every salt bucket
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly uniform


def test_salted_join_rejects_build_preserving_how(spark):
    """right/full outer would emit each unmatched build row once per
    salt replica — rejected up front (ADVICE r1)."""
    import pytest

    probe, build = _frames(spark)
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="probe-side-preserving"):
            salted_join(probe, build, "k", salts=8, how=how)
