"""Mergeable frequency sketches: Count-Min + bounded-memory top-k.

At 100 TB the full token/URL/n-gram vocabulary is itself huge, so
"count everything then sort" (a full key-keyed shuffle materializing
every distinct key) is the wrong default for frequency questions.
These operators bound the state instead:

- Count-Min sketch (Cormode & Muthukrishnan 2005, public paper): a
  depth x width counter grid. Per-row cost is `depth` hash-derived
  increments (all from ONE md5 via Kirsch-Mitzenmacher double
  hashing, the same trick the Bloom screen uses); the sketch is
  LINEAR, so per-partition partial sketches merge by addition — the
  representation here is a (d, pos, cnt) frame of at most
  depth x width rows regardless of corpus size, and merging is
  unionByName + groupBy sum. Estimates are ONE-SIDED: est >= true
  always; est <= true + eps*N with prob 1 - delta for
  eps = e/width, delta = e^-depth (both pytest-asserted).
- heavy_hitters: exact-verified top-k in two passes with bounded
  shuffle — pass 1 takes each partition's exact local top-m
  (m = candidate_factor * k) so only partitions x m candidate rows
  ever shuffle; pass 2 rescans the corpus filtered to the candidate
  set (broadcast) for EXACT counts. Returned counts are exact. The
  candidate stage can in principle miss a key whose occurrences are
  spread so thin it cracks no partition's top-m; raise
  candidate_factor to harden (the Zipf shape of real frequency data
  makes local heads and global heads coincide; equality with the
  full groupBy top-k is pytest-asserted on the testdata corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import hash_pair

CMS_DEPTH = 4
CMS_WIDTH = 8192


def _cms_positions(col: F.Column, width: int, depth: int) -> F.Column:
    """array of `depth` row positions for one key — h_i = (a + i*b)
    mod width, all derived from one md5 (values < 2^58 + 3*2^58 so
    the ANSI-mode overflow guard holds)."""
    a, b = hash_pair(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: (a + i.cast("long") * b) % width,
    )


def cms_build(
    df: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(d, pos, cnt) sparse counter grid — at most depth x width rows.
    One corpus scan: row-local position derivation, posexplode to
    depth rows per item, then a grid-keyed partial-agg count (the
    shuffle moves at most depth x width combiner cells per partition,
    NOT the corpus)."""
    return (
        df.select(
            F.posexplode(
                _cms_positions(F.col(col), width, depth)
            ).alias("d", "pos")
        )
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketches are linear: merge = elementwise add. Inputs must share
    width/depth (same build parameters)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(item, est) — min over rows of the item's counters. The sketch
    is broadcast (bounded size by construction); items never shuffle:
    explode to depth probes, broadcast-join the grid, min per item.
    Missing grid cells count 0 (keys never seen)."""
    probes = items.select(
        F.col(col).alias("item"),
        F.posexplode(_cms_positions(F.col(col), width, depth)).alias(
            "d", "pos"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    candidate_factor: int = 8,
) -> DataFrame:
    """Exact-verified top-k (item, cnt, rank) without a full-vocab
    shuffle — and PROVABLY complete (ADVICE r4: the candidate stage
    alone is partition-layout-dependent). Pass 1: per-partition exact
    local top-(factor*k) via one Arrow pass, which also emits the
    partition's CEILING row — the largest local count any
    NON-candidate key can have there (the m-th local count, or 0 when
    every local key was emitted). Pass 2: exact counts for the
    candidate set only (broadcast semi-join + count), then a k-row
    window. Completeness check: any key outside the candidate set has
    global count <= sum of partition ceilings; if the k-th candidate
    count clears that bound the result equals the full-shuffle top-k
    BY PROOF, on every partition layout. Only when the bound fails
    (adversarially flat data) does the operator fall back to the full
    groupBy — correctness never depends on the Zipf assumption, only
    the fast path does. Ties break lexicographically. NULL keys are
    excluded up front (code review r5: pandas value_counts and the
    equality semi-join both drop nulls, but the exact fallback's
    groupBy counted them — the two paths must agree on every
    layout)."""
    import pandas as pd

    df = df.filter(F.col(col).isNotNull())
    m = candidate_factor * k

    def local_top(pdfs):
        counts: dict = {}
        for pdf in pdfs:
            for item, c in pdf[col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        ceiling = top[-1][1] if len(counts) > m else 0
        yield pd.DataFrame(
            {
                "item": [t[0] for t in top] + [None],
                "ceiling": [0] * len(top) + [ceiling],
            }
        )

    # bounded by construction (<= partitions x (m+1) rows);
    # localCheckpoint materializes it once so the bound-sum action and
    # the candidate broadcast reuse it without re-scanning the corpus.
    # Candidates stay DISTRIBUTED — only the scalar bound and the
    # final k rows ever land on the driver, so the operator holds at
    # partition counts where a candidate collect() would not.
    # lazy checkpoint (r18 opt): the bound-sum action on the next line
    # materializes it inside its own job — one corpus pass + one job
    # instead of an eager checkpoint job followed by the sum job
    raw = df.select(col).mapInPandas(
        local_top, "item string, ceiling long"
    ).localCheckpoint(eager=False)
    missed_bound = int(
        raw.agg(F.sum("ceiling").alias("s")).first()["s"] or 0
    )

    from pyspark.sql import Window

    spark = df.sparkSession
    cands = (
        raw.filter(F.col("item").isNotNull())
        .select("item")
        .distinct()
    )
    exact = (
        df.join(
            F.broadcast(cands),
            df[col] == cands["item"],
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc(col))
    top = (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(col).alias("item"),
            "cnt",
            F.col("rank").cast("int").alias("rank"),
        )
    )
    if missed_bound > 0:
        # cheap completeness proof: k-th candidate count must beat the
        # best any non-candidate could possibly hold
        rows = top.collect()  # bounded: k rows
        kth = min((r["cnt"] for r in rows), default=0)
        # strict >: a non-candidate tying the k-th count could still
        # displace it via the lexicographic tiebreak
        if len(rows) < k or kth <= missed_bound:
            full = df.groupBy(col).agg(F.count("*").alias("cnt"))
            return (
                full.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(
                    F.col(col).alias("item"),
                    "cnt",
                    F.col("rank").cast("int").alias("rank"),
                )
            )
        return spark.createDataFrame(rows, top.schema)
    return top


# -- Engine-portable sketches (x5, reworked r5 — VERDICT r4 #3) -------------
# The r4 x5 used approx_count_distinct (HLL++) and percentile_approx
# (KLL-ish), whose estimates are Spark-implementation-specific, so the
# declared query could only be rows-only checked. These sketches keep
# the bounded-memory shape but are DETERMINISTIC FUNCTIONS OF THE DATA
# with identical md5-based arithmetic in Spark and DuckDB, so the
# driver hash-verifies even the approximate estimates:
#
# - KMV distinct estimate (Bar-Yossef et al. 2002, public): keep the K
#   smallest 48-bit hash values of the key; ndv_hat = (K-1) / (h_K /
#   2^48). Exact when ndv < K (the sketch IS the distinct set).
# - Min-hash sample quantiles: the N rows with smallest key-hash are a
#   deterministic uniform sample; the type-1 sample quantile (value at
#   rank ceil(q*n)) is the estimate. Selection only — no float
#   arithmetic to drift between engines.
#
# Exact companions (exact count distinct / min / max) ride the same
# query so approximation error is visible in one result set.

SKETCH_K = 1024
SAMPLE_N = 2048
# (K-1) * 2^48 precomputed: 1023 has 10 significant bits, so the
# product is exactly representable in a double on both engines
_KMV_NUM = float((SKETCH_K - 1) * 2**48)


def _hash48(col: F.Column) -> F.Column:
    """48-bit md5-prefix hash — small enough to be exact in BIGINT and
    DOUBLE on both engines. DuckDB twin:
    CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1, 12)) AS
    BIGINT)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("long")


def _hash48_sql(expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 12))"
        " AS BIGINT)"
    )


def kmv_distinct_stats(
    df: DataFrame, specs: list[tuple[str, str]], k: int = SKETCH_K
) -> DataFrame:
    """(stat, value) rows: KMV distinct-count estimates for several
    key columns of the SAME table, sharing ONE corpus scan (r18 opt,
    guide §2.3: x5 used to run an independent scan + Arrow pass per
    key). Plan shape per key is unchanged — the bounded-state property
    that makes KMV a sketch: the Arrow pass keeps each partition's k
    smallest DISTINCT hashes per key (state <= ~4k values per key per
    task), so only partitions x k x n_keys rows ever reach the final
    distinct + top-k — the corpus-wide distinct set is never shuffled,
    unlike the exact companion. Any correct k-min-distinct
    implementation yields the identical set, so the declared hash is
    implementation-independent. `specs` = [(key_col, stat_name), ...];
    output rows come one per spec, same values as the per-key runs."""
    import numpy as np
    import pandas as pd

    from ..plans.layout import reuse

    n_keys = len(specs)

    def kmin_multi(pdfs, k=k, n_keys=n_keys):
        bests: list = [None] * n_keys
        for pdf in pdfs:
            for i in range(n_keys):
                u = pdf[f"h{i}"].to_numpy()
                b = bests[i]
                b = u if b is None else np.concatenate([b, u])
                if len(b) > 4 * k:  # compact the running state
                    b = np.unique(b)[:k]
                bests[i] = b
        frames = []
        for i, b in enumerate(bests):
            if b is None:
                continue
            b = np.unique(b)[:k]
            frames.append(
                pd.DataFrame(
                    {"which": np.full(len(b), i, dtype="int32"), "h": b}
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    # fan_out before the md5 pass was A/B-measured NET-NEGATIVE here
    # (r19: 2.0-2.3 s -> 2.6-2.7 s at sf0.1) despite the 1.2M md5s
    # running on the testdata's single split: a keyless repartition
    # first pays a serial local sort + shuffle write of the raw keys
    # on that same single task (guide §2.5 sortBeforeRepartition), and
    # 32x more per-partition k-min states feed the distinct+top-k. On
    # real multi-split inputs the hash pass parallelizes naturally —
    # the single-split penalty is a testdata artifact, not a scale
    # property.
    state = df.select(
        *[
            _hash48(F.col(key)).alias(f"h{i}")
            for i, (key, _) in enumerate(specs)
        ]
    ).mapInPandas(kmin_multi, "which int, h long")
    if n_keys > 1:
        # bounded frame (<= partitions x k x n_keys rows): persist so
        # the per-key consumers below share the single corpus pass
        state = reuse(state)

    out = None
    for i, (_key, name) in enumerate(specs):
        hashes = (
            state.filter(F.col("which") == i)
            .select("h")
            .distinct()
            .orderBy("h")
            .limit(k)
        )
        agg = hashes.agg(
            F.count("h").alias("n_h"), F.max("h").alias("h_k")
        )
        est = F.when(
            F.col("n_h") < k, F.col("n_h").cast("double")
        ).otherwise(
            F.floor(
                F.lit(_KMV_NUM) / F.col("h_k").cast("double") * 10000.0
                + 0.5
            )
            / 10000.0
        )
        row = agg.select(F.lit(name).alias("stat"), est.alias("value"))
        out = row if out is None else out.unionByName(row)
    return out


def kmv_distinct_stat(
    df: DataFrame, key: str, name: str, k: int = SKETCH_K
) -> DataFrame:
    """One (stat, value) row: the KMV distinct-count estimate for
    df[key] — the single-key form of kmv_distinct_stats."""
    return kmv_distinct_stats(df, [(key, name)], k)


def _kmv_sql(table: str, key: str, name: str, k: int = SKETCH_K) -> str:
    return f"""
SELECT '{name}' AS stat,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE FLOOR({_KMV_NUM!r} / CAST(MAX(h) AS DOUBLE)
                       * 10000.0 + 0.5) / 10000.0
       END AS value
FROM (
  SELECT DISTINCT {_hash48_sql(key)} AS h FROM {table}
  ORDER BY h LIMIT {k}
)
"""


def minhash_sample_quantiles(
    df: DataFrame,
    val_col: str,
    key_col: str,
    qs: dict[str, float],
    n: int = SAMPLE_N,
) -> DataFrame:
    """(stat, value) rows: type-1 quantiles of the deterministic
    min-hash sample (the n rows with smallest key hash — ORDER BY +
    LIMIT n is a per-partition top-n, so at 100 TB only n rows per
    partition move). The quantile itself is pure rank selection over
    the n-row sample (single tiny window — bounded by construction),
    so the value is bit-identical across engines."""
    from pyspark.sql import Window

    sample = (
        df.select(
            F.col(val_col).alias("v"),
            _hash48(F.col(key_col)).alias("h"),
        )
        .orderBy("h", "v")
        .limit(n)
    )
    # both windows scoped to a literal partition: the sample is n rows
    # by construction, and the explicit partition silences Spark's
    # move-everything-to-one-partition WARN on every declared run
    one = Window.partitionBy(F.lit(1))
    ranked = sample.select(
        "v",
        F.row_number().over(one.orderBy("v", "h")).alias("r"),
        F.count(F.lit(1)).over(one).alias("n"),
    )
    # one pass over the ranked sample (r18 opt, guide §2.4): the old
    # per-quantile union re-planned the WHOLE sample subtree (scan +
    # top-n + two windows) once per quantile; joining the tiny literal
    # (stat, q) frame picks every quantile's rank row in a single
    # subtree. Same rank arithmetic (r == ceil(q * n)), same rows.
    from ..functions.values import values_frame

    qdf = values_frame(
        df.sparkSession,
        [(name, float(q)) for name, q in qs.items()],
        "stat string, q double",
    )
    return ranked.join(
        F.broadcast(qdf), F.col("r") == F.ceil(F.col("q") * F.col("n"))
    ).select("stat", F.col("v").alias("value"))


def _sample_quantiles_sql(
    table: str,
    val_col: str,
    key_col: str,
    qs: dict[str, float],
    n: int = SAMPLE_N,
) -> str:
    ranked = f"""(
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, h) AS r,
         COUNT(*) OVER () AS n
  FROM (
    SELECT {val_col} AS v, {_hash48_sql(key_col)} AS h
    FROM {table} ORDER BY h, v LIMIT {n}
  )
)"""
    return "\nUNION ALL\n".join(
        f"SELECT '{name}' AS stat, v AS value FROM {ranked} "
        f"WHERE r = CAST(ceil({q!r} * n) AS BIGINT)"
        for name, q in qs.items()
    )


_X5_QS = {"sample_value_p50": 0.5, "sample_value_p90": 0.9,
          "sample_value_p99": 0.99}

_X5_ORACLE = f"""
{_kmv_sql("lineitem", "l_orderkey", "kmv_distinct_orders")}
UNION ALL
{_kmv_sql("lineitem", "l_partkey", "kmv_distinct_parts")}
UNION ALL
SELECT 'exact_distinct_orders' AS stat,
       CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS value
FROM lineitem
UNION ALL
SELECT 'exact_distinct_parts' AS stat,
       CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS value
FROM lineitem
UNION ALL
{_sample_quantiles_sql("events", "value", "event_id", _X5_QS)}
UNION ALL
SELECT 'value_min' AS stat, MIN(value) AS value FROM events
UNION ALL
SELECT 'value_max' AS stat, MAX(value) AS value FROM events
"""


def x5_sketch_stats(spark, sf_dir: str):
    from ..catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    exact = li.agg(
        F.count_distinct("l_orderkey").cast("double").alias("orders"),
        F.count_distinct("l_partkey").cast("double").alias("parts"),
    ).selectExpr(
        "stack(2, 'exact_distinct_orders', orders, "
        "'exact_distinct_parts', parts) AS (stat, value)"
    )
    mm = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    ).selectExpr(
        "stack(2, 'value_min', mn, 'value_max', mx) AS (stat, value)"
    )
    return (
        # fused: both KMV estimates off ONE lineitem scan (r18 opt)
        kmv_distinct_stats(
            li,
            [
                ("l_orderkey", "kmv_distinct_orders"),
                ("l_partkey", "kmv_distinct_parts"),
            ],
        )
        .unionByName(exact)
        .unionByName(
            minhash_sample_quantiles(ev, "value", "event_id", _X5_QS)
        )
        .unionByName(mm)
    )


HH_K = 25


def _hh_oracle(k: int = HH_K) -> str:
    # ties break on the STRING form of the key in both engines (the
    # operator receives the key as a string column). NULL keys are
    # excluded to mirror the operator's contract (review r5 pass 2:
    # DuckDB's GROUP BY would otherwise keep a NULL group the
    # operator never emits)
    return f"""
WITH f AS (
  SELECT CAST(user_id AS VARCHAR) AS item,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY item
), r AS (
  SELECT item, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, item) AS INT) AS rank
  FROM f
)
SELECT item, cnt, rank FROM r WHERE rank <= {k}
"""


def x8_heavy_hitters(spark, sf_dir: str):
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    return heavy_hitters(ev, "uid", HH_K)


def _register() -> None:
    from ..registry import declare

    declare(
        "x5_sketch_stats",
        _X5_ORACLE,
        doc="O-X5 bounded-memory sketches, HASH-verified since r5 "
        "(VERDICT r4 #3): KMV distinct estimates + min-hash sample "
        "quantiles are deterministic functions of the data with "
        "identical md5 arithmetic in both engines, so the DuckDB "
        "oracle replays the sketch itself; exact companions "
        "(count_distinct / min / max) ride the same result set — the "
        "monitor's avg/max/min batch stats (insert.ps1:370-372) "
        "upgraded to distribution shape. Moved from multimodal.py.",
    )(x5_sketch_stats)

    declare(
        "x8_heavy_hitters",
        _hh_oracle(),
        doc="brief/sketches: exact-verified top-25 users by event "
        "count via the bounded two-pass heavy-hitters plan — "
        "per-partition exact local top-m Arrow pass, then a "
        "broadcast-semi-join exact recount of candidates only; no "
        "full-key shuffle ever happens, yet counts are EXACT and "
        "hash-match the groupBy oracle. Promoted r4 s3 (slot freed "
        "by the c10-c12 merge).",
    )(x8_heavy_hitters)


_register()
