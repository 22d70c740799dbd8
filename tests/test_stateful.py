"""applyInPandasWithState: per-entity progress over a real stream
converges to the batch groupBy answer across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_cdc_psql_clickhouse_spark.catalog import change_event_schema

from tests.conftest import stagger_mtimes
from peerdb_cdc_psql_clickhouse_spark.sources.changes import (
    read_changes_stream,
    write_change_batches,
)
from peerdb_cdc_psql_clickhouse_spark.streaming.stateful import (
    entity_progress,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_entity_progress_converges(spark, tmp_path):
    import datetime as dt

    rows = []
    ops = ["insert", "update", "update", "delete"]
    for v in range(40):
        rows.append(
            (
                ops[v % 4],
                v,
                dt.datetime(2026, 1, 1, 0, 0, v % 60),
                v % 7,
                float(v),
            )
        )
    changes = spark.createDataFrame(rows, change_event_schema(ROW_SCHEMA))
    path = str(tmp_path / "changes")
    write_change_batches(changes, path, rows_per_batch=10)

    stream = read_changes_stream(
        spark, path, change_event_schema(ROW_SCHEMA), max_files_per_trigger=1
    )
    seen: dict[int, dict] = {}

    def capture(batch, batch_id):
        for r in batch.collect():
            seen[r["entity_id"]] = r.asDict()

    q = (
        entity_progress(stream)
        .writeStream.outputMode("update")
        .queryName("progress_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(capture)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expect = {
        r["entity_id"]: r.asDict()
        for r in changes.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.max("_version").alias("max_version"),
            F.sum(F.when(F.col("_op") == "insert", 1).otherwise(0)).alias("n_insert"),
            F.sum(F.when(F.col("_op") == "update", 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(F.col("_op") == "delete", 1).otherwise(0)).alias("n_delete"),
        )
        .collect()
    }
    assert len(seen) == 7
    for eid, want in expect.items():
        got = seen[eid]
        for k in ("n_ops", "max_version", "n_insert", "n_update", "n_delete"):
            assert got[k] == want[k], (eid, k, got, want)


def test_entity_progress_evicts_idle_keys_by_event_time(spark, tmp_path):
    """Bounded state: entities idle past the event-time horizon are
    evicted (final row flagged evicted=true) once a later micro-batch
    advances the watermark; the still-active key is not."""
    import datetime as dt

    from peerdb_cdc_psql_clickhouse_spark.streaming.stateful import (
        entity_progress_with_eviction,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    far = t0 + dt.timedelta(hours=1)
    schema = change_event_schema(ROW_SCHEMA)
    b1 = [("insert", 1, t0, 1, 1.0), ("insert", 2, t0, 2, 2.0),
          ("update", 3, t0 + dt.timedelta(seconds=5), 1, 1.5)]
    b2 = [("update", 10, far, 9, 9.0)]  # watermark pusher, new key
    feed = str(tmp_path / "feed")
    spark.createDataFrame(b1, schema).write.parquet(f"{feed}/f=1")
    spark.createDataFrame(b2, schema).write.parquet(f"{feed}/f=2")
    stagger_mtimes(f"{feed}/f=1", f"{feed}/f=2")
    stream = (
        spark.readStream.schema(schema.add("f", "integer"))
        .option("basePath", feed)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .drop("f")
    )
    rows = []
    q = (
        entity_progress_with_eviction(
            stream, watermark="10 seconds", idle_horizon_ms=60_000
        )
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    evicted = {r["entity_id"]: r for r in rows if r["evicted"]}
    assert set(evicted) == {1, 2}  # idle past horizon once wm advanced
    # final counters ride out with the eviction row
    assert evicted[1]["n_ops"] == 2 and evicted[1]["max_version"] == 3
    assert evicted[2]["n_ops"] == 1
    live = {r["entity_id"] for r in rows if not r["evicted"]}
    assert 9 in live  # the pusher key is active, not evicted


def test_entity_progress_tws_gate_is_honest():
    """When transformWithState is unavailable, the module-level gate
    must be the DOCUMENTED environment constraint (the TWS runner
    speaks protobuf to the JVM and this container ships no
    google.protobuf) — never a silent import bug in our own module —
    and the vendor-free applyInPandasWithState path must exist as the
    covered equivalent (its convergence/eviction semantics are
    asserted by the tests above). On a protobuf-equipped cluster the
    gate flips and test_entity_progress_tws_converges runs the real
    TWS query."""
    from peerdb_cdc_psql_clickhouse_spark.streaming import stateful

    if stateful.entity_progress_tws is None:
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            pass  # the documented env gate — honest
        else:
            raise AssertionError(
                "protobuf importable but entity_progress_tws is None: "
                "the gate is hiding a real import failure"
            )
        assert callable(stateful.entity_progress_with_eviction)
    else:
        assert callable(stateful.entity_progress_tws)


def test_entity_progress_tws_converges(spark, tmp_path):
    """Same convergence through the Spark 4.x transformWithState API
    (RocksDB state store). Runs only where the env provides protobuf
    (see test_entity_progress_tws_gate_is_honest for the gate
    contract)."""
    import datetime as dt

    import pytest

    from peerdb_cdc_psql_clickhouse_spark.streaming.stateful import (
        entity_progress_tws,
    )

    if entity_progress_tws is None:
        pytest.skip(
            "env gate: google.protobuf absent from this container "
            "(required by the TWS Python runner); the equivalent "
            "vendor-free path is asserted by the tests above"
        )

    rows = []
    ops = ["insert", "update", "update", "delete"]
    for v in range(40):
        rows.append(
            (ops[v % 4], v, dt.datetime(2026, 1, 1, 0, 0, v % 60),
             v % 7, float(v))
        )
    changes = spark.createDataFrame(rows, change_event_schema(ROW_SCHEMA))
    path = str(tmp_path / "changes")
    write_change_batches(changes, path, rows_per_batch=10)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_changes_stream(
            spark, path, change_event_schema(ROW_SCHEMA),
            max_files_per_trigger=1,
        )
        seen: dict[int, dict] = {}

        def capture(batch, batch_id):
            for r in batch.collect():
                seen[r["entity_id"]] = r.asDict()

        q = (
            entity_progress_tws(stream)
            .writeStream.outputMode("update")
            .queryName("progress_tws_test")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .foreachBatch(capture)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    assert len(seen) == 7
    assert seen[0]["n_ops"] == changes.filter(F.col("entity_id") == 0).count()
    assert all(
        r["max_version"]
        == max(v for (_, v, _, e, _) in rows if e == r["entity_id"])
        for r in seen.values()
    )


def test_eviction_drops_late_batch_without_crashing(spark, tmp_path):
    """A micro-batch consisting ONLY of events far behind the
    watermark: Spark filters late rows BEFORE the stateful operator,
    so the late entity never materializes and the query completes
    cleanly (the operator's own watermark clamp stays defensive)."""
    import datetime as dt

    from peerdb_cdc_psql_clickhouse_spark.streaming.stateful import (
        entity_progress_with_eviction,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    far = t0 + dt.timedelta(hours=2)
    schema = change_event_schema(ROW_SCHEMA)
    feed = str(tmp_path / "feed")
    rows = []

    def drain():
        # fresh query over the SAME checkpoint: the committed
        # watermark from the previous drain gates the next one —
        # deterministic, unlike file ordering within one availableNow
        # run
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField("f", T.IntegerType())]
        )
        stream = (
            spark.readStream.schema(read_schema)
            .option("basePath", feed)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
            .drop("f")
        )
        q = (
            entity_progress_with_eviction(
                stream, watermark="10 seconds", idle_horizon_ms=60_000
            )
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(lambda b, _id: rows.extend(b.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    # drain 1 commits a far-future watermark
    spark.createDataFrame(
        [("insert", 1, far, 1, 1.0)], schema
    ).write.parquet(f"{feed}/f=1")
    drain()
    # drain 2's only input is entirely behind that watermark
    spark.createDataFrame(
        [("update", 2, t0, 2, 2.0)], schema
    ).write.parquet(f"{feed}/f=2")
    drain()
    seen = {r["entity_id"] for r in rows}
    assert 1 in seen       # on-time entity processed
    assert 2 not in seen   # late entity filtered before the operator
