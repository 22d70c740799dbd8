"""Repartitioned-build determinism for every persisted corpus
artifact (r15, VERDICT r14 #3): each artifact claims "deterministic
by construction", which at 100 TB must mean MORE than repeatable on
one layout — a rebuilt artifact has to be content-identical whether
the corpus arrived in 2 input partitions or 8 (cluster topology,
file splits, and AQE coalescing all change the partitioning between
runs). Every test here builds the same artifact from a 2-partition
and an 8-partition copy of the same rows and asserts EXACT logical
equality (float bits included; parquet file bytes legitimately
differ with layout, the contents may not).

The quantizer trainings (kmeans_centroids, pq_train) earn this via
the r15 fixed-point-partials + rounded-argmin contract
(similarity.py _SUM_GRID / _ARGMIN_DECIMALS); the text/cluster/
ground-truth artifacts via integer counts, portable hashes, and
fround'd scoring. A failure in any of them is a real portability
bug — the exact class that made the driver box measure
ivfpq_recall_at_10 = 0.896 where six rounds of builder runs
measured 0.898.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _docs(spark, n_parts: int):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").repartition(
        n_parts
    )


def _emb(spark, n_parts: int):
    return (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .repartition(n_parts)
    )


def _rows(df) -> list[tuple]:
    """Canonical content: sorted tuples, arrays tupled, floats kept
    at full precision (exact equality is the whole point)."""

    def canon(v):
        if isinstance(v, list):
            return tuple(canon(x) for x in v)
        return v

    return sorted(tuple(canon(v) for v in r) for r in df.collect())


def test_text_index_build_is_partitioning_independent(spark, tmp_path):
    from peerdb_cdc_psql_clickhouse_spark.operators.search import (
        open_text_index,
        save_full_text_index,
    )

    views = []
    for n_parts, name in ((2, "a"), (8, "b")):
        path = str(tmp_path / name)
        save_full_text_index(_docs(spark, n_parts), path)
        views.append(open_text_index(spark, path))
    (post_a, len_a, stats_a), (post_b, len_b, stats_b) = views
    assert stats_a == stats_b
    assert _rows(len_a) == _rows(len_b)
    assert _rows(post_a) == _rows(post_b)


def test_ivf_index_build_is_partitioning_independent(spark, tmp_path):
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        build_ivf_index,
    )

    idx = []
    for n_parts, name in ((2, "a"), (8, "b")):
        idx.append(
            build_ivf_index(
                _emb(spark, n_parts),
                str(tmp_path / name),
                n_centroids=8,
                n_assign=2,
            )
        )
    a, b = idx
    assert _rows(a.centroids) == _rows(b.centroids)
    assert _rows(a.lists) == _rows(b.lists)


def test_ivfpq_index_build_is_partitioning_independent(spark, tmp_path):
    import numpy as np

    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        build_ivfpq_index,
    )

    idx = []
    for n_parts, name in ((2, "a"), (8, "b")):
        idx.append(
            build_ivfpq_index(
                _emb(spark, n_parts),
                str(tmp_path / name),
                n_centroids=8,
                m=8,
                nbits=4,
            )
        )
    a, b = idx
    assert np.array_equal(a.codebook, b.codebook)
    assert _rows(a.centroids) == _rows(b.centroids)
    assert _rows(a.lists) == _rows(b.lists)


def test_dup_cluster_table_is_partitioning_independent(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        dup_clusters,
        winnow_edges,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.text import winnow_fp

    def build(n_parts: int):
        return dup_clusters(winnow_edges(winnow_fp(_docs(spark, n_parts))))

    assert _rows(build(2)) == _rows(build(8))


def test_ann_groundtruth_is_partitioning_independent(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        ANN_SUBSET_FULL_N,
        N_QUERY_VECS,
        cosine_topk,
    )

    def build(n_parts: int):
        emb = _emb(spark, n_parts)
        queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
        )
        return cosine_topk(queries, emb, k=ANN_SUBSET_FULL_N)

    assert _rows(build(2)) == _rows(build(8))


def test_fixed_point_guard_raises_on_out_of_bound_components(spark):
    """The fixed-point accumulator would WRAP int64 silently if a
    component exceeded the documented headroom bound — kmeans must
    raise loudly instead (e.g. un-normalized embeddings at 1e6
    scale)."""
    import pytest

    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        kmeans_centroids,
    )

    big = spark.createDataFrame(
        [(i, [float(1e6 + i), 0.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="fixed-point"):
        kmeans_centroids(big, n_centroids=2, iters=1).collect()


def test_fixed_point_rows_guard_bounds_partition_row_count():
    """r16 (ADVICE r15): the magnitude guard alone doesn't bound ROWS
    per partition — maxPartitionBytes bounds file-scan partitions,
    but an explicit coalesce to few partitions bypasses it, and
    np.add.at past ~5.8e8 max-magnitude rows would wrap int64
    silently. The accumulating loops now check the row count against
    the documented headroom BEFORE adding a batch; this pins the
    guard's arithmetic (the bound itself is untestably large to hit
    end-to-end — 5.8e8 rows in one partition)."""
    import pytest

    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        _FIXED_POINT_MAX_ABS,
        _FIXED_POINT_MAX_ROWS,
        _SUM_GRID,
        _check_fixed_point_rows,
    )

    # the bound is exactly the documented headroom arithmetic
    assert _FIXED_POINT_MAX_ROWS == (2**63 - 1) // int(
        _FIXED_POINT_MAX_ABS * _SUM_GRID
    )
    # a max-magnitude component stream at the bound cannot wrap int64
    assert (
        _FIXED_POINT_MAX_ROWS * int(_FIXED_POINT_MAX_ABS * _SUM_GRID)
        <= 2**63 - 1
    )
    _check_fixed_point_rows(0)
    _check_fixed_point_rows(_FIXED_POINT_MAX_ROWS)  # at the bound: ok
    with pytest.raises(ValueError, match="headroom"):
        _check_fixed_point_rows(_FIXED_POINT_MAX_ROWS + 1)


def test_bpe_merges_are_partitioning_independent(spark):
    """VERDICT r15 #5: BPE training counts words distributed (integer
    groupBy — exactly associative) then learns merges driver-side
    from the bounded frequency dict; the learned merge list must be
    identical for any input partitioning."""
    from peerdb_cdc_psql_clickhouse_spark.operators.bpe import train_bpe

    a = train_bpe(_docs(spark, 2), n_merges=120)
    b = train_bpe(_docs(spark, 8), n_merges=120)
    assert a == b  # exact, rank order included


def test_langid_profiles_are_partitioning_independent(spark):
    """VERDICT r15 #5: trained language-ID profiles are integer
    gram counts + a deterministically tie-broken rank window — the
    profile table must be identical for any input partitioning."""
    from peerdb_cdc_psql_clickhouse_spark.operators.text import (
        train_langid_profiles,
    )

    def build(n_parts: int):
        labeled = _docs(spark, n_parts).select(
            "doc_id",
            "text",
            F.concat(F.lit("l"), (F.col("doc_id") % 3)).alias("lang"),
        )
        return train_langid_profiles(labeled, top_k=80)

    assert _rows(build(2)) == _rows(build(8))


def test_lm_scores_are_partitioning_independent(spark):
    """VERDICT r15 #5: the x3h LM table is integer bigram/unigram
    counts; the quantized scoring path (fixed-point log-probs +
    DECIMAL sums) must make the per-doc scores exactly
    partitioning-independent, float bits included."""
    from peerdb_cdc_psql_clickhouse_spark.operators.text import (
        LM_QUANT,
        ngram_lm_scores,
    )

    def build(n_parts: int):
        return ngram_lm_scores(_docs(spark, n_parts), quantize=LM_QUANT)

    assert _rows(build(2)) == _rows(build(8))
