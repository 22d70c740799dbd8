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
            emb, threshold=thresh, n_centroids=n_cent, iters=iters,
            two_level=False,  # the oracle replays FLAT assignment
        ).collect()
    }
    assert got == want
    assert want, "test corpus should contain at least one semantic pair"


def test_two_level_auto_rule():
    """two_level=None resolves to coarse assignment exactly where the
    k -> 2*sqrt(k) cut wins: self-contained batch shape AND
    n_centroids above the crossover."""
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        TWO_LEVEL_AUTO_K,
        _resolve_two_level,
    )

    assert not _resolve_two_level(None, 1, None, 64)
    assert _resolve_two_level(None, 1, None, TWO_LEVEL_AUTO_K + 1)
    assert not _resolve_two_level(None, 2, None, TWO_LEVEL_AUTO_K + 1)
    assert not _resolve_two_level(None, 1, "pinned", TWO_LEVEL_AUTO_K + 1)
    assert _resolve_two_level(True, 1, None, 8)
    assert not _resolve_two_level(False, 1, None, 10**6)


def test_pairs_exactly_match_numpy_under_two_level(spark):
    """Exact-parity twin for the scale config (two_level forced — the
    auto rule picks it above TWO_LEVEL_AUTO_K cells, too large to
    all-pairs-verify here): the numpy oracle replays the two-level
    cell assignment, so the pair set is still bit-exact —
    approximate CELLS, exact PAIRS."""
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        ivf_assign_two_level,
    )

    emb = _with_planted(spark)
    thresh, n_cent, iters = 0.95, 8, 2
    cents = kmeans_centroids(emb, n_cent, iters)
    assign = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_two_level(
            emb, cents, n_coarse=max(2, int(n_cent**0.5))
        ).collect()
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
            emb, threshold=thresh, n_centroids=n_cent, iters=iters,
            two_level=True,
        ).collect()
    }
    assert got == want
    assert want


def test_multi_assign_widens_pairs(spark):
    emb = _with_planted(spark)
    # monotonicity is a FLAT-assignment family contract (n_assign>1
    # always runs flat), so pin the baseline flat too
    p1 = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(
            emb, threshold=0.9, two_level=False
        ).collect()
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


def _with_hot_mass(spark, n_copies=200):
    """Smoke corpus plus a planted hot blob: n_copies near-identical
    perturbations of vector 0 — the dedup-shaped mass that k-means
    concentrates into one cell (the c²/2 blowup VERDICT r3 flagged)."""
    emb = _emb(spark)
    idx = spark.range(1, n_copies + 1).select(F.col("id").alias("copy"))
    mass = (
        emb.filter(F.col("vec_id") == 0)
        .crossJoin(idx)
        .select(
            (F.lit(2 * OFFSET) + F.col("copy")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0,
                    x * (F.lit(1.0) + F.col("copy").cast("double") * 0.0005),
                ).otherwise(x),
            ).alias("embedding"),
        )
        .drop("copy")
    )
    return emb.unionByName(mass.select("vec_id", "embedding"))


def test_hot_cluster_cap_star_bounds_work_and_keeps_recall(spark):
    n_copies, cap = 200, 50
    corpus = _with_hot_mass(spark, n_copies)
    mass_ids = set(range(2 * OFFSET + 1, 2 * OFFSET + n_copies + 1))
    pairs = semantic_neardup_pairs(
        corpus, threshold=0.99, n_centroids=8, max_cluster_size=cap
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    among = [
        p for p in got if p[0] in mass_ids or p[1] in mass_ids
    ]
    # star treatment: O(c) pairs for the unsplittable mass, not c²/2
    # (uncapped all-pairs would emit >= 19900 mass-mass pairs)
    assert len(among) < 3 * n_copies, len(among)
    # recall: every mass member except at most one canonical is
    # flagged as a duplicate and dropped by apply
    kept = semantic_dedup_apply(corpus, pairs)
    dropped = {r.vec_id for r in kept.collect() if not r.keep}
    assert len(mass_ids - dropped) <= 1, sorted(mass_ids - dropped)[:5]


def test_cap_bounds_candidate_generation(spark):
    # threshold=-2 surfaces EVERY generated candidate pair, so the
    # output count IS the pair work. One cluster holding the whole
    # corpus: uncapped = n(n-1)/2; capped <= n·cap/2 (all-pairs cells
    # at <= cap) + n (star rows).
    emb = _emb(spark)
    n = emb.count()
    cap = 50
    capped = semantic_neardup_pairs(
        emb, threshold=-2.0, n_centroids=1, iters=1, max_cluster_size=cap,
        two_level=False,  # isolate the cap (n_centroids=1 has no levels)
    ).count()
    assert capped <= n * cap / 2 + n, (capped, n)
    assert capped < n * (n - 1) / 2


def test_cap_subbucket_split_keeps_planted_pairs(spark):
    # one over-cap DIVERSE cluster: masked hyperplane bits split it
    # into <= cap cells; planted near-identical pairs (cos ~0.9999)
    # agree with every hyperplane w.h.p. and stay co-bucketed
    planted = _with_planted(spark)
    pairs = semantic_neardup_pairs(
        planted, threshold=0.99, n_centroids=1, iters=1,
        max_cluster_size=50, two_level=False,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    found = sum((i, i + OFFSET) in got for i in range(N_PLANT))
    assert found == N_PLANT, f"only {found}/{N_PLANT} planted pairs survived"


def test_cap_no_trigger_matches_uncapped(spark):
    emb = _with_planted(spark)
    kw = dict(threshold=0.95, n_centroids=8, iters=2)
    capped = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(emb, **kw).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(
            emb, max_cluster_size=None, **kw
        ).collect()
    }
    assert capped == uncapped


def test_incremental_screen_matches_batch_cross_pairs(spark):
    # screen(new, history) must equal the batch operator's cross
    # (old, new) pairs when both use the SAME pinned quantizer —
    # the substring_spans_against parity contract, embedding-space
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        semantic_neardup_against,
    )

    emb = _emb(spark)
    old = emb  # full corpus is the screened history
    # new batch: planted near-copies of historical vectors 0..N_PLANT
    new = _with_planted(spark).filter(F.col("vec_id") >= OFFSET)
    cents = kmeans_centroids(old, n_centroids=8, iters=2).localCheckpoint()
    hist = ivf_assign(old, cents, 1).select(
        "centroid_id", "vec_id", "embedding"
    )
    got = {
        (r.new_id, r.old_id)
        for r in semantic_neardup_against(
            new, cents, hist, threshold=0.9
        ).collect()
    }
    union = old.unionByName(new)
    batch = semantic_neardup_pairs(
        union, threshold=0.9, centroids=cents, max_cluster_size=None
    )
    new_ids = {r.vec_id for r in new.select("vec_id").collect()}
    old_ids = {r.vec_id for r in old.select("vec_id").collect()}
    want = set()
    for r in batch.collect():
        if r.id_a in new_ids and r.id_b in old_ids:
            want.add((r.id_a, r.id_b))
        elif r.id_b in new_ids and r.id_a in old_ids:
            want.add((r.id_b, r.id_a))
    assert got == want
    assert want, "planted near-copies must pair with their originals"


def test_stream_semantic_screen_against_history(spark, tmp_path):
    # a streaming batch with a near-copy of a historical vector and a
    # novel vector: the near-copy flags against its original, the
    # novel row stays clean — append mode, no stream state
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        stream_semantic_neardup_candidates,
    )

    emb = _emb(spark)
    cents = kmeans_centroids(emb, n_centroids=8, iters=2).localCheckpoint()
    hist = ivf_assign(emb, cents, 1).select(
        "centroid_id", "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") == 7).collect()[0]
    near_copy = [x * 1.01 if i == 0 else x for i, x in enumerate(base["embedding"])]
    import random

    rng = random.Random(123)
    novel = [rng.gauss(0, 1) for _ in range(len(near_copy))]
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(900001, near_copy), (900002, novel)],
        "vec_id long, embedding array<float>",
    ).write.parquet(feed)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(feed)
    flagged = stream_semantic_neardup_candidates(
        stream, cents, hist, threshold=0.99
    )
    got = []
    q = (
        flagged.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hits = {(r["new_id"], r["old_id"]): r["cos"] for r in got}
    assert (900001, 7) in hits and hits[(900001, 7)] >= 0.99
    assert not any(n == 900002 for (n, _o) in hits)


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


def test_kmeans_exact_vs_numpy_and_batch_invariant(spark):
    """ADVICE r5 (medium): the per-partition partials now accumulate
    ACROSS Arrow batches and yield once per partition (bounded driver
    collect). Two checks: (1) centroids are EXACTLY numpy-Lloyd's
    under the documented determinism contract (same prefix seeding,
    ROUNDED-distance smallest-id tie break, fixed-point 1e-9 sums,
    float32 rounding per round, empty cluster keeps its previous
    centroid — r15); (2) the result is invariant to the Arrow batch
    size — forcing many tiny batches through the
    accumulate-then-yield path changes nothing."""
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        _ARGMIN_DECIMALS,
        _SUM_GRID,
    )

    emb = _emb(spark)
    k, iters = 8, 2
    want_rows = kmeans_centroids(emb, k, iters).orderBy("c_id").collect()

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    vecs = np.array([r.embedding for r in rows], dtype="float64")
    fp = np.rint(vecs * _SUM_GRID).astype("int64")
    cent = vecs[:k].copy()
    for _ in range(iters):
        d2 = (
            (vecs**2).sum(axis=1)[:, None]
            - 2.0 * vecs @ cent.T
            + (cent**2).sum(axis=1)[None, :]
        )
        a = np.round(d2, _ARGMIN_DECIMALS).argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cent[c] = (
                    fp[m].sum(axis=0).astype("float64")
                    / _SUM_GRID
                    / m.sum()
                ).astype("float32")
    got = np.array([r.c_vec for r in want_rows], dtype="float64")
    assert np.array_equal(got, cent.astype("float32").astype("float64"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        tiny_rows = (
            kmeans_centroids(emb, k, iters).orderBy("c_id").collect()
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert [list(r.c_vec) for r in tiny_rows] == [
        list(r.c_vec) for r in want_rows
    ]
