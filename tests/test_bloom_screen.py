"""Bloom-filter contamination screen: no false negatives vs the exact
broadcast-join screen, measured false-positive rate within theory, and
exact agreement at the default sizing (where fp is ~0 on test scales).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.operators.text import (
    bloom_build,
    bloom_contamination_flags,
    contamination_flags,
)


def _bench(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH = [
    "what is the capital of france paris",
    "compute the derivative of x squared",
]


def _planted(spark):
    rows = []
    for i in range(30):
        noise = " ".join(f"tok{i}_{j}" for j in range(12))
        if i % 5 == 0:  # contaminated: carries a full benchmark item
            rows.append((i, noise + " " + BENCH[i % 2]))
        else:
            rows.append((i, noise))
    return _docs(spark, rows)


def test_matches_exact_screen_at_default_sizing(spark):
    docs = _planted(spark)
    bench = _bench(spark, BENCH)
    bloom = _bloom_from_bench(spark, bench)
    exact = {
        r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
        for r in contamination_flags(docs, bench).collect()
    }
    got = {
        r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
        for r in bloom_contamination_flags(docs, bloom).collect()
    }
    # default m=2^20 vs a handful of grams: fp ~ 1e-18 — exact match
    assert got == exact
    assert sum(1 for _, c in got.values() if c) == 6


def _bloom_from_bench(spark, bench, **kw):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        _shingles_of,
        _tokens,
    )

    grams = (
        bench.select(_tokens(F.col("text")).alias("_toks"))
        .select(
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), 3))
            ).alias("gram")
        )
        .distinct()
    )
    return bloom_build(grams, "gram", **kw)


def test_no_false_negatives_even_when_tiny(spark):
    # m small enough to force real false positives; contaminated docs
    # must STILL all be flagged (bloom errors are one-sided)
    docs = _planted(spark)
    bench = _bench(spark, BENCH)
    bloom = _bloom_from_bench(spark, bench, m_bits=1 << 10, k=3)
    exact = {
        r["doc_id"]: r["shared_ngrams"]
        for r in contamination_flags(docs, bench).collect()
    }
    got = {
        r["doc_id"]: r["shared_ngrams"]
        for r in bloom_contamination_flags(docs, bloom).collect()
    }
    for doc_id, exact_shared in exact.items():
        assert got[doc_id] >= exact_shared, doc_id


def test_fp_rate_within_theory(spark):
    member = spark.createDataFrame(
        [(f"present gram number {i}",) for i in range(2000)],
        "gram string",
    )
    probe_docs = spark.createDataFrame(
        [(i, f"absent probe item {i}") for i in range(2000)],
        "doc_id long, text string",
    )
    bloom = bloom_build(member, "gram", m_bits=1 << 14, k=4)
    assert 0.005 < bloom.fp_rate < 0.2
    # each probe doc yields a couple of 3-gram probes, all absent from
    # the member set; count how many hit
    flagged = (
        bloom_contamination_flags(probe_docs, bloom, min_shared=1)
        .agg(
            F.sum("shared_ngrams").alias("hits"),
            F.sum(F.lit(1)).alias("docs"),
        )
        .collect()[0]
    )
    # ~2 distinct grams per 4-token doc -> ~4000 probes
    observed = flagged["hits"] / 4000.0
    assert observed < 3.0 * bloom.fp_rate + 0.01, (
        observed,
        bloom.fp_rate,
    )


def test_build_words_bounded_uint32(spark):
    bench = _bench(spark, BENCH)
    bloom = _bloom_from_bench(spark, bench, m_bits=1 << 12)
    assert len(bloom.words) == (1 << 12) // 32
    assert all(0 <= w < (1 << 32) for w in bloom.words)
    assert sum(bin(w).count("1") for w in bloom.words) > 0
