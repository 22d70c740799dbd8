"""Stream-stream interval join.

The reference correlates two concurrent event feeds client-side: the
insert workload's per-batch timings (insert.ps1:315-317) and the
`docker stats` resource samples taken alongside each batch
(insert.ps1:320, rolled up per batch in monitor.ps1:1153-1197). The
engine-native carrier is Structured Streaming's watermarked
stream-stream join: both feeds are unbounded, and each left event
pairs with right events of the same key whose event time falls within
a tolerance band.

Scale notes: both sides shuffle once on the join key; the watermark
bounds the join state store (rows older than watermark + tolerance
are evicted), so state is O(per-key event rate x tolerance), never
O(stream length). Without a watermark Spark would keep both sides
forever — this module makes the watermark mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


JOIN_MODES = {
    "inner": "inner",
    "left_outer": "leftOuter",
    "left_semi": "leftSemi",
}


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "10 seconds",
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right rows with the same `key` and
    |right_ts - left_ts| <= tolerance. Works batch-to-batch too (same
    plan minus state), which is how the unit oracle checks it.

    `how` (state-timeout semantics per Structured Streaming's
    stream-stream join contract):
    - "inner": matched pairs only, emitted as matches arrive.
    - "left_outer": additionally emits each unmatched left row with
      NULL right columns — but only once the watermark passes
      left_ts + tolerance (before that a future right match is still
      possible, so the row is held in state; this is the state
      timeout, not a latency bug).
    - "left_semi": left rows that have >= 1 match, left columns only,
      each left row at most once.

    Right columns other than the key are kept under their own names;
    the right event time is exposed as `{right_ts}_r`. A right column
    whose name collides with a left column is rejected (it would
    silently produce ambiguous duplicate output columns — ADVICE r1);
    rename before joining, as asof_join does. Both inputs must be
    append streams; watermarks are applied here so state eviction is
    never forgotten at call sites.
    """
    if how not in JOIN_MODES:
        raise ValueError(
            f"how={how!r} not supported; one of {sorted(JOIN_MODES)}"
        )
    collisions = (
        set(right.columns) - {key, right_ts}
    ) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right columns {sorted(collisions)} collide with left "
            "columns; rename them before stream_interval_join"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    r = r.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[
            F.col(c)
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    rts = F.col(f"{right_ts}_r")
    lts = F.col(left_ts)
    tol = F.expr(f"INTERVAL {tolerance}")
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (rts >= lts - tol)
        & (rts <= lts + tol)
    )
    joined = l.join(r, cond, JOIN_MODES[how])
    return joined if how == "left_semi" else joined.drop("_rkey")


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup for at-least-once sources: drop re-deliveries
    of the same event identity (`keys`) arriving within the watermark
    horizon. The CDC analog of PeerDB's resilient delivery — a change
    event replayed by the source must not double-apply downstream.

    dropDuplicatesWithinWatermark keeps state only until the watermark
    passes each key (bounded, unlike plain dropDuplicates on a stream
    which retains ALL keys forever); max-version-wins apply already
    tolerates duplicates, so this is a state/IO optimization that
    thins the feed before the keyed shuffle, not a correctness need.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
