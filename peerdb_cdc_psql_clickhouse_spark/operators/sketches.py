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
    shuffle. Pass 1: per-partition exact local top-(factor*k) via one
    Arrow pass (a pandas value_counts head — partition-local state is
    one partition's distinct keys, and only partitions x m candidate
    rows leave the executors). Pass 2: exact counts for the candidate
    set only (broadcast semi-join + count), then a k-row window.
    Ties break lexicographically for determinism."""
    import pandas as pd

    m = candidate_factor * k

    def local_top(pdfs):
        counts: dict = {}
        for pdf in pdfs:
            for item, c in pdf[col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        yield pd.DataFrame({"item": [t[0] for t in top]})

    cands = (
        df.select(col).mapInPandas(local_top, "item string").distinct()
    )
    from pyspark.sql import Window

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
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(col).alias("item"),
            "cnt",
            F.col("rank").cast("int").alias("rank"),
        )
    )


HH_K = 25


def _hh_oracle(k: int = HH_K) -> str:
    # ties break on the STRING form of the key in both engines (the
    # operator receives the key as a string column)
    return f"""
WITH f AS (
  SELECT CAST(user_id AS VARCHAR) AS item,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY item
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
