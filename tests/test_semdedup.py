"""SemDeDup (semantic dedup): k-means partition + within-cluster
cosine pairs. Verified three ways: planted paraphrase-style
duplicates are found and dropped, the pair set is EXACTLY the
numpy-computed within-cluster pairs above threshold (no more, no
less), and multi-assignment only widens the pair set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroids,
    semantic_dedup_apply,
    semantic_neardup_pairs,
)

OFFSET = 1_000_000
N_PLANT = 10


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _with_planted(spark):
    emb = _emb(spark)
    dups = emb.filter(F.col("vec_id") < N_PLANT).select(
        (F.col("vec_id") + OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)
        ).alias("embedding"),
    )
    return emb.unionByName(dups)


def test_planted_duplicates_found_and_dropped(spark):
    planted = _with_planted(spark)
    pairs = semantic_neardup_pairs(planted, threshold=0.99)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(N_PLANT):
        assert (i, i + OFFSET) in got, f"planted dup {i} missed"
    kept = semantic_dedup_apply(planted, pairs)
    keep_map = {r.vec_id: r.keep for r in kept.collect()}
    for i in range(N_PLANT):
        assert keep_map[i], "canonical (low-id) member must survive"
        assert not keep_map[i + OFFSET], "planted copy must drop"


def test_pairs_exactly_match_numpy_within_cluster(spark):
    emb = _with_planted(spark)
    thresh, n_cent, iters = 0.95, 8, 2
    cents = kmeans_centroids(emb, n_cent, iters)
    assign = {
        r.vec_id: r.centroid_id
        for r in ivf_assign(emb, cents, 1).collect()
    }
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in rows}
    ids = sorted(vecs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if assign[a] != assign[b]:
                continue
            va, vb = vecs[a], vecs[b]
            cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            if cos >= thresh:
                want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(
            emb, threshold=thresh, n_centroids=n_cent, iters=iters
        ).collect()
    }
    assert got == want
    assert want, "test corpus should contain at least one semantic pair"


def test_multi_assign_widens_pairs(spark):
    emb = _with_planted(spark)
    p1 = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(emb, threshold=0.9).collect()
    }
    p2 = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(
            emb, threshold=0.9, n_assign=2
        ).collect()
    }
    assert p1 <= p2


def test_two_level_assignment_colocates_planted_pairs(spark):
    # The coarse quantizer may disagree with flat assignment on
    # boundary vectors (near-orthogonal corpus: agreement ~0.47), but
    # near-identical vectors argmin to the SAME cell because their
    # inputs are near-identical — the property SemDeDup needs.
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        ivf_assign_two_level,
        kmeans_centroids,
    )

    planted = _with_planted(spark)
    cents = kmeans_centroids(planted, n_centroids=16, iters=2)
    cell = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_two_level(planted, cents).collect()
    }
    # the assignment contract: EVERY vector gets exactly one cell —
    # review found vectors could vanish through the stage-2 inner join
    # when a coarse group had no fine members (kmeans empty-cluster
    # carryover); the semi-join fix pins this
    assert len(cell) == planted.count()
    for i in range(N_PLANT):
        assert cell[i] == cell[i + OFFSET], f"pair {i} split across cells"


def test_two_level_pairs_find_planted_dups(spark):
    planted = _with_planted(spark)
    pairs = semantic_neardup_pairs(planted, threshold=0.99, two_level=True)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(N_PLANT):
        assert (i, i + OFFSET) in got, f"planted dup {i} missed"


def test_semantic_pairs_feed_transitive_clustering(spark):
    # chain-planted paraphrase group: v, v', v'' where v'~v and v''~v'
    # — pairwise apply would keep v'' if its only pair is with v';
    # transitive closure through the existing dup_clusters gives ONE
    # group with the min id as canonical
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        dup_clusters,
    )

    emb = _emb(spark)
    chain = emb.filter(F.col("vec_id") < 3)
    v1 = chain.select(
        (F.col("vec_id") + OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.004).otherwise(x)
        ).alias("embedding"),
    )
    v2 = chain.select(
        (F.col("vec_id") + 2 * OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.008).otherwise(x)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(v1).unionByName(v2)
    pairs = semantic_neardup_pairs(corpus, threshold=0.999)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = {r.doc_id: r.cluster_id for r in dup_clusters(edges).collect()}
    for i in range(3):
        # all three planted variants collapse to the original's id
        assert labels.get(i + OFFSET) == i
        assert labels.get(i + 2 * OFFSET) == i
