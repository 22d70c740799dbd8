"""Bucketed co-located join: same-bucketed tables join with NO
Exchange in the physical plan (the 100 TB repeated-join layout)."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "b_orders", "o_orderkey", 8, str(tmp_path / "b_orders")
    )
    write_bucketed(
        lineitem, "b_lineitem", "o_orderkey", 8, str(tmp_path / "b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the plan shows the bucketed SMJ path these
    # testdata sizes would otherwise short-circuit (at scale both
    # sides are too big to broadcast — SMJ is the real plan)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it computes the right thing
    expect = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expect
