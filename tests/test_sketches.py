"""Count-Min sketch: one-sided error (est >= true always), the
epsilon*N bound at the theoretical rate, exact linear mergeability.
Heavy hitters: equality with the full groupBy top-k on the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    heavy_hitters,
)
from peerdb_cdc_psql_clickhouse_spark.operators.bpe import bpe_word_counts


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _words(spark):
    return _docs(spark).select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")


def test_one_sided_error_and_epsilon_bound(spark):
    words = _words(spark)
    width, depth = 1024, 4
    sketch = cms_build(words, "word", width, depth)
    true = {
        r["word"]: r["cnt"] for r in bpe_word_counts(_docs(spark)).collect()
    }
    items = words.select("word").distinct()
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sketch, items, "word", width, depth).collect()
    }
    n = sum(true.values())
    eps = 2.718281828 / width
    over = 0
    for w, t in true.items():
        assert est[w] >= t, (w, est[w], t)  # NEVER underestimates
        if est[w] > t + eps * n:
            over += 1
    # P(overshoot > eps*N) <= e^-depth ~ 0.018 per key
    assert over / len(true) <= 0.05, over / len(true)


def test_sketch_is_exactly_linear(spark):
    words = _words(spark)
    a = words.filter(F.length("word") <= 4)
    b = words.filter(F.length("word") > 4)
    merged = cms_merge(
        cms_build(a, "word", 512, 3), cms_build(b, "word", 512, 3)
    )
    whole = cms_build(words, "word", 512, 3)
    got = {(r["d"], r["pos"]): r["cnt"] for r in merged.collect()}
    want = {(r["d"], r["pos"]): r["cnt"] for r in whole.collect()}
    assert got == want


def test_heavy_hitters_match_exact_topk(spark):
    words = _words(spark)
    got = [
        (r["item"], r["cnt"])
        for r in heavy_hitters(words, "word", 20).orderBy("rank").collect()
    ]
    texts = [r.text for r in _docs(spark).select("text").collect()]
    c = Counter(w for t in texts for w in t.lower().split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_heavy_hitters_counts_are_exact_even_for_rare_candidates(spark):
    # k larger than the distinct-head: every returned count must still
    # be the exact corpus count (the verify pass is exact by design)
    words = _words(spark).limit(2000)
    rows = heavy_hitters(words, "word", 50).collect()
    pdf = words.toPandas()
    c = Counter(pdf["word"])
    for r in rows:
        assert r["cnt"] == c[r["item"]]


def test_heavy_hitters_adversarial_spread_key_still_exact(spark):
    """ADVICE r4: a true top-k key spread so thin it cracks no
    partition's local top-m used to be missable. The completeness
    bound (sum of partition ceilings vs k-th candidate count) must
    detect that layout and fall back to the exact full groupBy.

    Construction: 16 partitions; 'needle' appears twice per partition
    (32 global) but every partition also has m distinct local keys
    with 3 occurrences each, so 'needle' never makes a local top-m —
    yet globally every filler key has only 3 occurrences and 'needle'
    is the true #1."""
    k, factor = 2, 2
    m = k * factor
    rows = []
    for p in range(16):
        rows += [(p, "needle")] * 2
        for j in range(m + 2):  # > m local fillers, ceiling stays 3
            rows += [(p, f"fill_{p:02d}_{j:02d}")] * 3
    df = (
        spark.createDataFrame(rows, "p int, word string")
        .repartition(16, "p")
        .select("word")
    )
    got = [
        (r["item"], r["cnt"], r["rank"])
        for r in heavy_hitters(df, "word", k, candidate_factor=factor)
        .orderBy("rank")
        .collect()
    ]
    c = Counter(w for _, w in rows)
    want = [
        (w, n, i + 1)
        for i, (w, n) in enumerate(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        )
    ]
    assert got == want
    assert got[0][0] == "needle"


def test_heavy_hitters_fast_path_keeps_proof(spark):
    """On Zipf-shaped data the bound holds and the fast path's result
    already equals the exact top-k (no fallback needed) — asserted by
    equality with the full groupBy, same as the corpus test, but on a
    layout with a nonzero missed_bound."""
    rows = []
    for p in range(8):
        rows += [(p, "alpha")] * 50 + [(p, "beta")] * 30
        for j in range(40):
            rows += [(p, f"tail_{p}_{j}")]
    df = (
        spark.createDataFrame(rows, "p int, word string")
        .repartition(8, "p")
        .select("word")
    )
    got = [
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "word", 2, candidate_factor=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("alpha", 400), ("beta", 240)]


def test_cms_accumulates_over_a_stream(spark, tmp_path):
    """Linearity is the streaming story: per-micro-batch sketches fold
    into a running grid via cms_merge inside foreachBatch, and the
    accumulated sketch equals the batch sketch of everything seen —
    bounded state regardless of stream length."""
    # materialize ONCE — .limit() is order-nondeterministic, so every
    # downstream frame must derive from the same pandas snapshot
    pdf = _words(spark).limit(3000).toPandas()
    words = spark.createDataFrame(pdf)
    src = str(tmp_path / "in")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(pdf.iloc[:1500]).write.parquet(f"{src}/a.parquet")
    spark.createDataFrame(pdf.iloc[1500:]).write.parquet(f"{src}/b.parquet")

    acc = {"sketch": None}

    def fold(batch, _bid):
        s = cms_build(batch, "word", 512, 3)
        acc["sketch"] = (
            s.toPandas()
            if acc["sketch"] is None
            else (
                spark.createDataFrame(acc["sketch"])
                .transform(lambda prev: cms_merge(prev, s))
                .toPandas()
            )
        )

    stream = spark.readStream.schema(words.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")  # each half is its own parquet dir
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (int(r["d"]), int(r["pos"])): int(r["cnt"])
        for _, r in acc["sketch"].iterrows()
    }
    want = {
        (r["d"], r["pos"]): r["cnt"]
        for r in cms_build(words, "word", 512, 3).collect()
    }
    assert got == want


def test_kmv_estimate_accuracy_and_exact_branch(spark):
    """KMV distinct estimate (x5, r5): within the theoretical
    ~1/sqrt(K) relative error on a corpus with ndv >> K, and EXACT
    (the sketch IS the distinct set) when ndv < K."""
    from peerdb_cdc_psql_clickhouse_spark.operators.sketches import (
        SKETCH_K,
        kmv_distinct_stat,
    )

    big = spark.range(20_000).select(
        (F.col("id") * 7 + 3).alias("key")
    )
    est = kmv_distinct_stat(big, "key", "kmv").collect()[0]["value"]
    # K=1024 -> sigma ~ 1/32 ~ 3.1%; allow 5 sigma
    assert abs(est - 20_000) / 20_000 < 0.16, est

    small = spark.range(300).select(F.col("id").alias("key"))
    est_small = kmv_distinct_stat(small, "key", "kmv").collect()[0][
        "value"
    ]
    assert est_small == 300.0
    assert SKETCH_K == 1024
