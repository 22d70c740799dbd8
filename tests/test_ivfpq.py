"""IVF-PQ persisted index: residual-coded cells, partition-pruned
ADC search, exact rerank. Full probe coverage + generous rerank must
reproduce brute-force L2 exactly; the compressed lists must store no
vectors; default search recall is pinned at the measured level.
"""

from __future__ import annotations

import glob

import numpy as np
from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
    build_ivfpq_index,
    load_ivfpq_index,
    search_ivfpq_index,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _brute(spark, q_ids, k):
    rows = _emb(spark).orderBy("vec_id").collect()
    ids = np.asarray([r.vec_id for r in rows], dtype="int64")
    mat = np.stack([np.asarray(r.embedding, dtype="float64") for r in rows])
    idx = {int(i): j for j, i in enumerate(ids)}
    out = {}
    for q in q_ids:
        d = ((mat - mat[idx[q]]) ** 2).sum(axis=1)
        d[idx[q]] = np.inf
        order = np.lexsort((ids, d))[:k]
        out[q] = [int(ids[j]) for j in order]
    return out


def test_layout_is_compressed_and_partitioned(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    idx = build_ivfpq_index(emb, path, n_centroids=8, n_assign=1)
    assert 2 <= len(glob.glob(f"{path}/lists/centroid_id=*")) <= 8
    # the lists hold codes only — no full-dim vectors anywhere
    assert set(idx.lists.columns) == {"vec_id", "codes", "centroid_id"}
    assert idx.lists.count() == emb.count()
    # codebook round-trips through parquet exactly
    reloaded = load_ivfpq_index(spark, path)
    assert np.array_equal(reloaded.codebook, idx.codebook)


def test_full_probe_generous_rerank_matches_brute_force(spark, tmp_path):
    emb = _emb(spark)
    idx = build_ivfpq_index(
        emb, str(tmp_path / "ivfpq"), n_centroids=8, n_assign=1
    )
    queries = emb.filter(F.col("vec_id") < 5)
    got = {}
    res = search_ivfpq_index(
        idx, queries, emb, k=3, nprobe=8, rerank=10**6
    )
    for r in res.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    want = _brute(spark, range(5), 3)
    for q in range(5):
        assert [v for _, v in sorted(got[q])] == want[q]


def test_default_search_recall_and_pruning(spark, tmp_path):
    emb = _emb(spark)
    idx = build_ivfpq_index(
        emb, str(tmp_path / "ivfpq"), n_centroids=16, n_assign=2
    )
    queries = emb.filter(F.col("vec_id") < 20)
    res = search_ivfpq_index(idx, queries, emb, k=10, nprobe=4, rerank=50)
    got = {}
    for r in res.collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    want = _brute(spark, range(20), 10)
    hits = sum(len(got.get(q, set()) & set(want[q])) for q in range(20))
    # measured 0.88 at sf0.001 (16 cells, nprobe 4, 2-assign,
    # rerank 50); pin below
    assert hits / 200 >= 0.8, hits / 200
    # the codes scan is partition-pruned to the probed cells
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan


def test_residual_coding_beats_raw_coding_distortion(spark, tmp_path):
    # the point of IVF-PQ: residuals are small, so the same code
    # budget quantizes finer. Compare exact-rerank-free ADC top-1
    # self-hit rates: every vector's nearest neighbor under residual
    # codes should be found at least as reliably as raw-PQ found it
    # (proxy: top-1 ADC self-distance is near zero for exact dups)
    emb = _emb(spark)
    dup = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    idx = build_ivfpq_index(
        emb.unionByName(dup),
        str(tmp_path / "ivfpq"),
        n_centroids=8,
        n_assign=1,
    )
    res = search_ivfpq_index(
        idx,
        emb.filter(F.col("vec_id") == 3),
        emb.unionByName(dup),
        k=1,
        nprobe=8,
        rerank=50,
    ).collect()
    assert res[0].vec_id == 1_000_003
    assert res[0].l2_dist == 0.0


def test_incremental_insert_is_searchable(spark, tmp_path):
    emb = _emb(spark)
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        ivfpq_index_insert,
    )

    base = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    idx = build_ivfpq_index(base, path, n_centroids=8, n_assign=1)
    n_before = idx.lists.count()

    dup = emb.filter(F.col("vec_id") == 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    idx = ivfpq_index_insert(idx, rest.unionByName(dup), n_assign=1)
    assert idx.lists.count() == n_before + rest.count() + 1

    # the inserted exact duplicate is found at exact distance zero
    res = search_ivfpq_index(
        idx,
        emb.filter(F.col("vec_id") == 2),
        emb.unionByName(dup),
        k=1,
        nprobe=8,
        rerank=50,
    ).collect()
    assert res[0].vec_id == 1_000_002
    assert res[0].l2_dist == 0.0

    # and a full-probe search over the merged index equals brute force
    got = {}
    for r in search_ivfpq_index(
        idx,
        emb.filter(F.col("vec_id") < 3),
        emb.unionByName(dup),
        k=3,
        nprobe=8,
        rerank=10**6,
    ).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    want = _brute_with(spark, dup, range(3), 3)
    for q in range(3):
        assert [v for _, v in sorted(got[q])] == want[q]


def _brute_with(spark, extra, q_ids, k):
    rows = (
        _emb(spark).unionByName(extra).orderBy("vec_id").collect()
    )
    ids = np.asarray([r.vec_id for r in rows], dtype="int64")
    mat = np.stack([np.asarray(r.embedding, dtype="float64") for r in rows])
    idx = {int(i): j for j, i in enumerate(ids)}
    out = {}
    for q in q_ids:
        d = ((mat - mat[idx[q]]) ** 2).sum(axis=1)
        d[idx[q]] = np.inf
        order = np.lexsort((ids, d))[:k]
        out[q] = [int(ids[j]) for j in order]
    return out


def test_two_level_build_searchable_full_probe_exact(spark, tmp_path):
    """two_level build (r5 scale path): corpus assignment goes through
    the coarse quantizer, so CELLS are approximate — but with every
    cell probed and a generous rerank, search still returns the exact
    brute-force top-k (the rerank is full-dim regardless of which
    cell a vector landed in)."""
    emb = _emb(spark)
    idx = build_ivfpq_index(
        emb, str(tmp_path / "ivfpq2l"), n_centroids=8, n_assign=1,
        two_level=True,
    )
    assert idx.lists.count() == emb.count()  # every vector indexed once
    queries = emb.filter(F.col("vec_id") < 5)
    got = {}
    res = search_ivfpq_index(
        idx, queries, emb, k=3, nprobe=8, rerank=10**6
    )
    for r in res.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    want = _brute(spark, range(5), 3)
    for q in range(5):
        assert [v for _, v in sorted(got[q])] == want[q]


def test_probed_search_matches_numpy_min_adc_oracle(spark, tmp_path):
    """r15: an independent numpy replay of the WHOLE probed-search
    contract — probe the query's nprobe nearest cells, ADC against
    per-(query, cell) residual LUTs, round distances to 6 decimals,
    keep each multi-assigned vector's MINIMUM ADC across its cells,
    shortlist top-rerank by (dist, id), exact-L2 rerank top-k with
    the same rounding and id tiebreak, self excluded. Pins the
    min-ADC dedup semantics that replaced dropDuplicates (whose
    task-order-dependent keep flickered the published recall@10
    between 0.898 and 0.896 on byte-identical indexes)."""
    from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
        _ARGMIN_DECIMALS,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq_oracle")
    nprobe, rerank, k, m = 3, 20, 10, 8
    idx = build_ivfpq_index(
        emb, path, n_centroids=8, n_assign=2, m=m, nbits=4
    )
    q_ids = [0, 3, 7, 11]
    queries = emb.filter(F.col("vec_id").isin(q_ids))
    got = {}
    for r in search_ivfpq_index(
        idx, queries, emb, k=k, nprobe=nprobe, rerank=rerank
    ).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.l2_dist))

    # ---- independent replay from the persisted artifacts ----
    cents = {
        int(r.c_id): np.asarray(r.c_vec, dtype="float64")
        for r in idx.centroids.collect()
    }
    lists = [
        (int(r.vec_id), np.asarray(r.codes, dtype="int64"), int(r.centroid_id))
        for r in idx.lists.collect()
    ]
    rows = emb.orderBy("vec_id").collect()
    vec = {int(r.vec_id): np.asarray(r.embedding, dtype="float64") for r in rows}
    cb = idx.codebook
    dsub = cb.shape[2]

    for q in q_ids:
        qv = vec[q]
        # probe cells: nprobe nearest centroids by squared L2, c_id tiebreak
        cells = sorted(
            cents, key=lambda c: (((qv - cents[c]) ** 2).sum(), c)
        )[:nprobe]
        # min ADC across the vector's probed copies
        best: dict[int, float] = {}
        for cid in cells:
            res = (qv - cents[cid]).reshape(m, dsub)
            lut = np.stack(
                [
                    ((res[s][None, :] - cb[s]) ** 2).sum(axis=1)
                    for s in range(m)
                ]
            )
            for vid, codes, lcid in lists:
                if lcid != cid or vid == q:
                    continue
                d = round(sum(lut[s][codes[s]] for s in range(m)), _ARGMIN_DECIMALS)
                if vid not in best or d < best[vid]:
                    best[vid] = d
        short = sorted(best, key=lambda v: (best[v], v))[:rerank]
        exact = sorted(
            short,
            key=lambda v: (round(((qv - vec[v]) ** 2).sum(), 6), v),
        )[:k]
        want = [
            (i + 1, v, round(((qv - vec[v]) ** 2).sum(), 6))
            for i, v in enumerate(exact)
        ]
        assert sorted(got[q]) == want, (q, sorted(got[q])[:3], want[:3])
