"""As-of and range joins — temporal joins the reference's analytics
imply but Spark lacks as primitives.

The reference correlates per-batch workload events with the nearest
resource-usage sample client-side (monitor.ps1:1153-1197 matches
BASELINE/INSERT-BATCH-n phases to stats lines; insert.ps1:320 samples
`docker stats` once per batch). The engine-native carrier for
"nearest preceding observation" is an AS-OF join, and for "all
observations within a window" a RANGE join. Both are implemented as
compositions of stock DataFrame ops chosen for 100 TB behavior:

- as-of: union the two sides, ONE shuffle on the key, and a running
  `last(payload, ignoreNulls)` over (ts, side) within each key
  partition. This is the merge-based as-of algorithm: no range
  explosion, no per-row subquery, memory O(1) per key beyond the
  sort. Scales with the number of distinct keys; Catalyst/AQE handle
  partition sizing.
- range: equi-join on (key, coarse time bucket) with the exact
  predicate applied post-join. Window length == bucket length, so
  each probe touches exactly 2 buckets — candidate count is bounded
  by per-key-per-bucket density, never O(n^2). Skewed keys can be
  salted on top; AQE skew-join splitting applies because the band
  join IS an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import declare

RANGE_WINDOW_S = 300  # range-join window = bucket width (5 minutes)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts for the same key (backward as-of, inclusive;
    left outer: unmatched left rows keep null payload).

    Right rows must be unique per (key, right_ts) — pre-aggregate for
    deterministic results. Merge-based: one shuffle on `key`, a
    per-partition sort on (ts, side), zero row expansion.
    """
    clash = {"_ats", "_side", "_pay", "_m"} & set(left.columns)
    if clash:
        raise ValueError(f"left columns collide with internals: {clash}")
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_pay"),
    )
    l = left.withColumn("_ats", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right (side=0) sorts before left (side=1) at equal ts => inclusive
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col("_m").getField(c).alias(c) for c in payload
    ]
    return matched.filter(F.col("_side") == 1).select(*out_cols)


@declare(
    "x6_asof_join",
    """
WITH r AS (
  SELECT user_id, ts, MAX(event_id) AS prior_event_id
  FROM events WHERE event_type <> 'error'
  GROUP BY user_id, ts
), l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT l.event_id, l.user_id, l.ts, r.prior_event_id, r.ts AS prior_ts
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
    doc="brief/custom operators: backward as-of join — attribute each "
    "error event to the same user's most recent preceding (or "
    "simultaneous) non-error event. Oracle is DuckDB's native ASOF "
    "LEFT JOIN; the Spark side is the merge-based union+window "
    "algorithm in asof_join() (one keyed shuffle, no range "
    "explosion). Right side pre-aggregated per (user, ts) with "
    "MAX(event_id) so ties are deterministic on both engines.",
)
def x6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    r = (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("prior_event_id"))
        .withColumn("prior_ts", F.col("ts"))
        .select("user_id", "ts", "prior_event_id", "prior_ts")
    )
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        l, r, key="user_id", left_ts="ts", right_ts="ts",
        payload=["prior_event_id", "prior_ts"],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
    count_alias: str,
) -> DataFrame:
    """Per left row: count right rows with the same key whose ts is in
    [left_ts - window_s, left_ts) — a banded range self/cross join.
    Left rows must be unique (carry a primary key): the final rollup
    groups by all left columns to undo the 2-bucket explode.

    Bucket width == window width, so each left row probes exactly two
    buckets (window spans at most 2 buckets). The join is a pure
    equi-join on (key, bucket) — broadcast/sort-merge/AQE-skew all
    apply — and the exact inequality runs post-join on full-precision
    timestamps. Candidates per probe are bounded by per-key density
    in 2*window_s, independent of total table size.
    """
    clash = {"_rk", "_rts", "_rb", "_lb"} & set(left.columns)
    if clash:
        raise ValueError(f"left columns collide with internals: {clash}")
    b_r = (F.unix_timestamp(F.col(right_ts)) / window_s).cast("long")
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        b_r.alias("_rb"),
    )
    b_l = (F.unix_timestamp(F.col(left_ts)) / window_s).cast("long")
    l = left.withColumn(
        "_lb", F.explode(F.array(b_l - 1, b_l))
    )
    hit = (
        (F.col("_rts") >= F.col(left_ts) - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("_rts") < F.col(left_ts))
    )
    joined = l.join(
        r,
        (F.col(key) == F.col("_rk")) & (F.col("_lb") == F.col("_rb")) & hit,
        "left",
    )
    return joined.groupBy(*left.columns).agg(
        F.count("_rts").alias(count_alias)
    )


@declare(
    "x6b_range_join",
    f"""
SELECT l.event_id, l.user_id,
       CAST(COUNT(r.event_id) AS BIGINT) AS n_prior_5min
FROM events l
LEFT JOIN events r
  ON r.user_id = l.user_id
 AND r.ts >= l.ts - INTERVAL {RANGE_WINDOW_S} SECONDS
 AND r.ts < l.ts
WHERE l.event_type = 'error'
GROUP BY l.event_id, l.user_id
""",
    doc="brief/custom operators: banded range join — per error event, "
    "how many events the same user produced in the preceding 5 "
    "minutes (burst detection). Oracle is the naive inequality join; "
    "the Spark side equi-joins on (user, 5-minute bucket) with the "
    "exact predicate post-join (range_join_count), so candidate "
    "pairs stay bounded by per-user burst density at any scale.",
)
def x6b_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    r = ev.select("user_id", "ts", "event_id")
    out = range_join_count(
        l, r, key="user_id", left_ts="ts", right_ts="ts",
        window_s=RANGE_WINDOW_S, count_alias="n_prior_5min",
    )
    return out.select("event_id", "user_id", "n_prior_5min")
