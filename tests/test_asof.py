"""Semantics tests for the as-of and range joins (operators/asof.py)
on tiny hand-built frames: inclusive boundaries, null handling, and
bucket-boundary correctness that the sf-scale oracle parity test could
pass by luck."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.operators.asof import (
    asof_join,
    range_join_count,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _left(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(s)) for i, k, s in rows], "id long, k long, ts timestamp"
    )


def _right(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), p) for k, s, p in rows],
        "k long, ts timestamp, pay long",
    )


def _asof(spark, left_rows, right_rows):
    out = asof_join(
        _left(spark, left_rows),
        _right(spark, right_rows),
        key="k", left_ts="ts", right_ts="ts", payload=["pay"],
    )
    return {r["id"]: r["pay"] for r in out.collect()}


def test_asof_picks_latest_preceding(spark):
    got = _asof(
        spark,
        [(1, 7, 100)],
        [(7, 10, 111), (7, 90, 222), (7, 150, 333)],
    )
    assert got == {1: 222}


def test_asof_inclusive_at_equal_ts(spark):
    got = _asof(spark, [(1, 7, 100)], [(7, 100, 555), (7, 40, 444)])
    assert got == {1: 555}


def test_asof_null_when_no_preceding(spark):
    got = _asof(spark, [(1, 7, 5)], [(7, 10, 111)])
    assert got == {1: None}


def test_asof_keys_do_not_leak(spark):
    got = _asof(
        spark,
        [(1, 7, 100), (2, 8, 100)],
        [(7, 50, 111), (8, 60, 222)],
    )
    assert got == {1: 111, 2: 222}


def _range(spark, left_rows, right_rows, window_s=300):
    out = range_join_count(
        _left(spark, left_rows),
        _right(spark, right_rows).select("k", "ts"),
        key="k", left_ts="ts", right_ts="ts",
        window_s=window_s, count_alias="n",
    )
    return {r["id"]: r["n"] for r in out.collect()}


def test_range_window_boundaries(spark):
    # window [l-300, l): start inclusive, end exclusive
    got = _range(
        spark,
        [(1, 7, 600)],
        [(7, 299, 0), (7, 300, 0), (7, 599, 0), (7, 600, 0)],
    )
    assert got == {1: 2}  # 300 and 599; 299 too old, 600 not strictly prior


def test_range_counts_across_bucket_boundary(spark):
    # left at 610: bucket 2; matches live in buckets 1 and 2
    got = _range(
        spark,
        [(1, 7, 610)],
        [(7, 320, 0), (7, 500, 0), (7, 605, 0)],
    )
    assert got == {1: 3}


def test_range_zero_count_rows_survive(spark):
    got = _range(spark, [(1, 7, 600), (2, 9, 600)], [(7, 580, 0)])
    assert got == {1: 1, 2: 0}


def test_asof_plan_single_shuffle(spark):
    """The as-of join must be one keyed exchange (merge algorithm),
    never a cartesian/broadcast-nested-loop."""
    out = asof_join(
        _left(spark, [(1, 7, 100)]),
        _right(spark, [(7, 10, 1)]),
        key="k", left_ts="ts", right_ts="ts", payload=["pay"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_property_vs_brute_force(spark):
    """Randomized: asof_join == per-left-row brute-force max(right_ts
    <= left_ts). Few keys + colliding timestamps stress tie and
    boundary paths; one Spark round-trip over all cases."""
    import random

    rng = random.Random(42)
    lefts, rights = [], []
    for i in range(120):
        lefts.append((i, rng.randrange(4), rng.randrange(50)))
    seen = set()
    for _ in range(80):
        k, s = rng.randrange(4), rng.randrange(50)
        if (k, s) in seen:  # unique per (key, ts): operator contract
            continue
        seen.add((k, s))
        rights.append((k, s, rng.randrange(1000)))

    def brute(i, k, s):
        cand = [(rs, p) for (rk, rs, p) in rights if rk == k and rs <= s]
        return max(cand)[1] if cand else None

    got = _asof(spark, lefts, rights)
    want = {i: brute(i, k, s) for (i, k, s) in lefts}
    assert got == want


def test_range_join_plan_is_equi_join(spark):
    """The banded range join must compile to a hash/sort-merge
    equi-join on (key, bucket) — never a nested-loop over the
    inequality."""
    out = range_join_count(
        _left(spark, [(1, 7, 600)]),
        _right(spark, [(7, 580, 0)]).select("k", "ts"),
        key="k", left_ts="ts", right_ts="ts",
        window_s=300, count_alias="n",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_property_vs_brute_force(spark):
    """Randomized: banded range join == brute-force window count,
    including cross-bucket and boundary cases."""
    import random

    rng = random.Random(7)
    lefts = [(i, rng.randrange(3), rng.randrange(2000)) for i in range(80)]
    rights = [(rng.randrange(3), rng.randrange(2000), 0) for _ in range(300)]

    def brute(k, s):
        return sum(1 for (rk, rs, _) in rights if rk == k and s - 300 <= rs < s)

    got = _range(spark, lefts, rights)
    want = {i: brute(k, s) for (i, k, s) in lefts}
    assert got == want


def test_internal_column_collision_raises(spark):
    import pytest

    bad = _left(spark, [(1, 7, 0)]).withColumnRenamed("id", "_ats")
    with pytest.raises(ValueError, match="collide"):
        asof_join(bad, _right(spark, [(7, 0, 1)]), key="k",
                  left_ts="ts", right_ts="ts", payload=["pay"])
    bad2 = _left(spark, [(1, 7, 0)]).withColumnRenamed("id", "_lb")
    with pytest.raises(ValueError, match="collide"):
        range_join_count(bad2, _right(spark, [(7, 0, 1)]).select("k", "ts"),
                         key="k", left_ts="ts", right_ts="ts",
                         window_s=300, count_alias="n")
