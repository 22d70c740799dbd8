"""Property-based test: for ANY sequence of keyed ordered changes,
latest_state == a naive sequential replay. This is the correctness
heart of the engine (max-version-wins must equal replay-in-order for
every interleaving), so it gets hypothesis coverage beyond the fixed
examples in test_cdc_streaming."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from peerdb_cdc_psql_clickhouse_spark.operators.cdc import latest_state

ROW_SCHEMA = T.StructType(
    [
        T.StructField("_op", T.StringType()),
        T.StructField("_version", T.LongType()),
        T.StructField("_ts", T.TimestampType()),
        T.StructField("id", T.IntegerType()),
        T.StructField("val", T.IntegerType()),
    ]
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=7),  # key: few keys, many collisions
        st.integers(min_value=0, max_value=1000),  # val
    ),
    min_size=1,
    max_size=40,
)


def naive_replay(events):
    state = {}
    for ver, (op, key, val) in enumerate(events):
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events_strategy)
def test_latest_state_equals_replay(spark, events):
    rows = [
        (op, ver, dt.datetime(2026, 1, 1), key, val)
        for ver, (op, key, val) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    got = {
        r["id"]: r["val"]
        for r in latest_state(df, ["id"]).select("id", "val").collect()
    }
    assert got == naive_replay(events)
