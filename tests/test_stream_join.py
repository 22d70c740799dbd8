"""Stream-stream interval join: drain two real file-source streams
(workload batches and resource samples, the reference's two feeds)
through stream_interval_join and check the pairing against a
hand-computed oracle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from tests.conftest import stagger_mtimes
from peerdb_cdc_psql_clickhouse_spark.streaming.joins import (
    stream_interval_join,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("batch_id", T.IntegerType()),
    ]
)
SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("sts", T.TimestampType()),
        T.StructField("cpu", T.DoubleType()),
    ]
)

# batches at t=10s and t=100s on hostA; one batch on hostB at t=10s
BATCHES = [
    ("A", T0 + dt.timedelta(seconds=10), 1),
    ("A", T0 + dt.timedelta(seconds=100), 2),
    ("B", T0 + dt.timedelta(seconds=10), 3),
]
# samples: within 5s of batch 1 (t=8,12), far from any batch (t=50),
# within 5s of batch 2 (t=104), hostB within tolerance but wrong key
# pairing must not leak across hosts
SAMPLES = [
    ("A", T0 + dt.timedelta(seconds=8), 11.0),
    ("A", T0 + dt.timedelta(seconds=12), 12.0),
    ("A", T0 + dt.timedelta(seconds=50), 99.0),
    ("A", T0 + dt.timedelta(seconds=104), 21.0),
    ("B", T0 + dt.timedelta(seconds=12), 31.0),
]
EXPECTED = {(1, 11.0), (1, 12.0), (2, 21.0), (3, 31.0)}


def _expected_of(joined_rows):
    return {(r["batch_id"], r["cpu"]) for r in joined_rows}


def test_interval_join_batch_semantics(spark):
    """Same plan on static frames: the oracle for the pairing rule."""
    out = stream_interval_join(
        spark.createDataFrame(BATCHES, BATCH_SCHEMA),
        spark.createDataFrame(SAMPLES, SAMPLE_SCHEMA),
        key="host", left_ts="ts", right_ts="sts",
        tolerance="5 seconds",
    )
    assert _expected_of(out.collect()) == EXPECTED


def test_interval_join_through_real_streams(spark, tmp_path):
    bdir, sdir = str(tmp_path / "b"), str(tmp_path / "s")
    spark.createDataFrame(BATCHES, BATCH_SCHEMA).write.parquet(bdir)
    spark.createDataFrame(SAMPLES, SAMPLE_SCHEMA).write.parquet(sdir)
    left = spark.readStream.schema(BATCH_SCHEMA).parquet(bdir)
    right = spark.readStream.schema(SAMPLE_SCHEMA).parquet(sdir)
    joined = stream_interval_join(
        left, right, key="host", left_ts="ts", right_ts="sts",
        tolerance="5 seconds", watermark="30 seconds",
    )
    got = []
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _expected_of(got) == EXPECTED
    # state eviction is configured: the plan carries both watermarks
    assert "watermark" in joined._jdf.queryExecution().analyzed().toString().lower()


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """At-least-once redelivery: the same (entity, version) spooled in
    two different micro-batch files must reach the sink once."""
    import datetime as dt

    from pyspark.sql import types as T

    from peerdb_cdc_psql_clickhouse_spark.streaming.joins import dedup_stream

    schema = T.StructType(
        [
            T.StructField("entity_id", T.LongType()),
            T.StructField("_version", T.LongType()),
            T.StructField("_ts", T.TimestampType()),
        ]
    )
    t = dt.datetime(2026, 1, 1, 0, 0, 0)
    batch1 = [(1, 1, t), (1, 2, t), (2, 1, t)]
    batch2 = [(1, 2, t), (2, 1, t), (2, 2, t)]  # two redeliveries
    d = str(tmp_path / "feed")
    spark.createDataFrame(batch1, schema).write.parquet(f"{d}/b=1")
    spark.createDataFrame(batch2, schema).write.parquet(f"{d}/b=2")
    stream = (
        spark.readStream.schema(schema.add("b", "integer"))
        .option("basePath", d)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .drop("b")
    )
    got = []
    q = (
        dedup_stream(stream, ["entity_id", "_version"], "_ts")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = [(r["entity_id"], r["_version"]) for r in got]
    assert sorted(seen) == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_interval_join_left_outer_batch_semantics(spark):
    """Batch oracle for left_outer: every left row survives; unmatched
    ones carry NULL right columns."""
    out = stream_interval_join(
        spark.createDataFrame(BATCHES, BATCH_SCHEMA),
        spark.createDataFrame(SAMPLES, SAMPLE_SCHEMA),
        key="host", left_ts="ts", right_ts="sts",
        tolerance="5 seconds", how="left_outer",
    ).collect()
    assert _expected_of([r for r in out if r["cpu"] is not None]) == EXPECTED
    assert all(r["batch_id"] is not None for r in out)


def test_interval_join_left_semi_batch_semantics(spark):
    out = stream_interval_join(
        spark.createDataFrame(BATCHES, BATCH_SCHEMA),
        spark.createDataFrame(SAMPLES, SAMPLE_SCHEMA),
        key="host", left_ts="ts", right_ts="sts",
        tolerance="5 seconds", how="left_semi",
    )
    assert set(out.columns) == {"host", "ts", "batch_id"}
    assert {r["batch_id"] for r in out.collect()} == {1, 2, 3}


def test_interval_join_left_outer_streaming_emits_after_watermark(
    spark, tmp_path
):
    """State-timeout semantics: an unmatched left row is held until
    the watermark passes left_ts + tolerance, then emitted with NULL
    right columns. Watermark-pusher events in a later micro-batch
    (far-future key 'Z' on both feeds) advance the global watermark so
    the held row times out inside the run."""
    far = T0 + dt.timedelta(minutes=30)
    batches1 = [("A", T0 + dt.timedelta(seconds=10), 1),
                ("C", T0 + dt.timedelta(seconds=20), 7)]  # C: no sample
    samples1 = [("A", T0 + dt.timedelta(seconds=12), 12.0)]
    batches2 = [("Z", far, 99)]
    samples2 = [("Z", far, 0.0)]

    bdir, sdir = str(tmp_path / "b"), str(tmp_path / "s")
    spark.createDataFrame(batches1, BATCH_SCHEMA).write.parquet(f"{bdir}/f=1")
    spark.createDataFrame(batches2, BATCH_SCHEMA).write.parquet(f"{bdir}/f=2")
    spark.createDataFrame(samples1, SAMPLE_SCHEMA).write.parquet(f"{sdir}/f=1")
    spark.createDataFrame(samples2, SAMPLE_SCHEMA).write.parquet(f"{sdir}/f=2")
    stagger_mtimes(f"{bdir}/f=1", f"{bdir}/f=2")
    stagger_mtimes(f"{sdir}/f=1", f"{sdir}/f=2")

    left = (
        spark.readStream.schema(BATCH_SCHEMA.add("f", "integer"))
        .option("basePath", bdir).option("maxFilesPerTrigger", 1)
        .parquet(bdir).drop("f")
    )
    right = (
        spark.readStream.schema(SAMPLE_SCHEMA.add("f", "integer"))
        .option("basePath", sdir).option("maxFilesPerTrigger", 1)
        .parquet(sdir).drop("f")
    )
    joined = stream_interval_join(
        left, right, key="host", left_ts="ts", right_ts="sts",
        tolerance="5 seconds", watermark="10 seconds", how="left_outer",
    )
    got = []
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_batch = {r["batch_id"]: r for r in got}
    assert by_batch[1]["cpu"] == 12.0          # matched pair
    assert by_batch[7]["cpu"] is None          # timed out -> NULL right
    assert by_batch[7]["sts_r"] is None


def test_interval_join_rejects_column_collision(spark):
    """A right column shadowing a left column would silently produce
    ambiguous duplicate output columns (ADVICE r1) — reject instead."""
    import pytest
    from pyspark.sql import functions as F

    left = spark.range(3).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("lts"),
        F.lit(1).alias("metric"),
    )
    right = spark.range(3).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("rts"),
        F.lit(2).alias("metric"),  # collides
    )
    with pytest.raises(ValueError, match="collide"):
        stream_interval_join(left, right, "k", "lts", "rts")
