"""Round-18 optimization pins: every change here must be
result-invisible — these tests prove the optimized internals produce
byte-identical frames to the shapes they replaced.

- global_rank(known_bounds=...): literal bounds from table stats give
  the SAME ranks as the in-plan bounds aggregate, including on
  clustered keys;
- catalog.table_rows / table_column_minmax: parquet-footer stats
  equal the Spark aggregates they replace;
- kmv_distinct_stats (fused multi-key scan) equals the per-key runs;
- _shingles_of's concat_ws+get form equals the slice+array_join form
  corpus-wide (the w used by minhash AND the n used by x1d);
- x1d's collect_list inverted lists: (gram, doc) pairs are unique by
  construction, so list == set (the premise of the collect_set swap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.catalog import (
    load_table,
    table_column_minmax,
    table_rows,
)
from peerdb_cdc_psql_clickhouse_spark.plans.layout import global_rank


def _ranks(df, **kw):
    out = global_rank(df, "k", rank_col="r", **kw)
    return sorted((r["k"], r["r"]) for r in out.collect())


def test_global_rank_known_bounds_matches_agg_path(spark):
    df = spark.range(200).select((F.col("id") * 7 % 1000).alias("k"))
    df = df.dropDuplicates(["k"])
    lo = df.agg(F.min("k")).first()[0]
    hi = df.agg(F.max("k")).first()[0]
    assert _ranks(df, known_bounds=(lo, hi)) == _ranks(df)


def test_global_rank_known_bounds_clustered_keys(spark):
    # heavy clustering near the low end — bucket occupancy degrades
    # but ranks must stay exact on both paths
    vals = list(range(50)) + [10_000, 10_001]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    assert _ranks(df, known_bounds=(0, 10_001)) == _ranks(df)


def test_global_rank_full_span_single_part(spark):
    # VERDICT r18 item 1: span 2^63-1 with n_parts == 1 overflowed the
    # ANSI stride `span div p + 1`; the clamp keeps any positive
    # stride (ranks depend only on bucket monotonicity). Pin the exact
    # driver-red example {0, 2^63-1} x parts=1 on BOTH paths, plus the
    # other part counts the property test draws.
    hi = (1 << 63) - 1
    df = spark.createDataFrame([(0,), (hi,)], "k long")
    want = [(0, 1), (hi, 2)]
    for parts in (1, 2, 7, 32):
        assert _ranks(df, partitions=parts) == want
        assert (
            _ranks(df, partitions=parts, known_bounds=(0, hi)) == want
        )


def test_footer_stats_match_spark_aggregates(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).first()
    assert table_rows(SF_SMOKE, "events") == row["n"]
    assert table_column_minmax(SF_SMOKE, "events", "event_id") == (
        row["lo"],
        row["hi"],
    )


def test_footer_stats_missing_file_returns_none():
    assert table_rows("/nonexistent", "events") is None
    assert table_column_minmax("/nonexistent", "events", "event_id") is None


def test_kmv_fused_equals_per_key_runs(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.sketches import (
        kmv_distinct_stat,
        kmv_distinct_stats,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    fused = {
        r["stat"]: r["value"]
        for r in kmv_distinct_stats(
            li, [("l_orderkey", "a"), ("l_partkey", "b")]
        ).collect()
    }
    single = {
        r["stat"]: r["value"]
        for r in kmv_distinct_stat(li, "l_orderkey", "a")
        .unionByName(kmv_distinct_stat(li, "l_partkey", "b"))
        .collect()
    }
    assert fused == single and set(fused) == {"a", "b"}


def test_shingle_concat_ws_form_matches_slice_join(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        _shingles_of,
        _tokens,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("_toks"))
    for w in (3, 5):  # x1d's NGRAM_N and minhash/winnow's SHINGLE_W
        toks = F.col("_toks")
        n = F.size(toks)
        idx = F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1)))
        old = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, w), " ")
        )
        a = toked.select("doc_id", old.alias("sh"))
        b = toked.select("doc_id", _shingles_of(toks, w).alias("sh"))
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_x1d_gram_doc_pairs_unique(spark):
    # the collect_list swap's premise: inv explodes array_distinct'd
    # per-doc grams, so (gram, doc_id) is unique
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        NGRAM_N,
        _shingles_of,
        _tokens,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    inv = (
        docs.select("doc_id", _tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), NGRAM_N))
            ).alias("gram"),
        )
    )
    total = inv.count()
    distinct = inv.dropDuplicates(["gram", "doc_id"]).count()
    assert total == distinct
