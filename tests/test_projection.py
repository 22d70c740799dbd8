"""project_embeddings: deterministic JL random projection. Components
are verified EXACTLY against a numpy replay of the same sign matrix;
geometry is verified statistically (norm preservation within JL
bounds on the real corpus) and functionally (planted near-dups stay
top-1 retrievable in projected space)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.similarity import (
    _PROJ_SEED,
    cosine_topk,
    project_embeddings,
)

OUT_DIM = 16
DIM = 64


def _signs(plane: int) -> np.ndarray:
    return np.array(
        [
            1.0
            if int(
                hashlib.md5(f"p{plane}:{i}".encode()).hexdigest()[:15], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(DIM)
        ]
    )


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_components_match_numpy_exactly(spark):
    rows = project_embeddings(_emb(spark), out_dim=OUT_DIM).collect()
    mat = np.stack([_signs(_PROJ_SEED + j) for j in range(OUT_DIM)])
    inv = 1.0 / np.sqrt(OUT_DIM)
    for r in rows[:50]:
        v = np.array(r.embedding, dtype="float64")
        want = (mat @ v) * inv
        got = np.array(r.proj, dtype="float64")
        assert got == pytest.approx(want, abs=1e-6)  # float32 storage


def test_norms_preserved_in_expectation(spark):
    rows = project_embeddings(_emb(spark), out_dim=OUT_DIM).collect()
    ratios = []
    for r in rows:
        v = np.array(r.embedding, dtype="float64")
        p = np.array(r.proj, dtype="float64")
        if np.linalg.norm(v) > 0:
            ratios.append(np.linalg.norm(p) ** 2 / np.linalg.norm(v) ** 2)
    ratios = np.array(ratios)
    # JL with ±1/sqrt(16): E[ratio]=1, std ~ sqrt(2/16) ~ 0.35
    assert 0.85 < float(np.median(ratios)) < 1.15
    assert float((np.abs(ratios - 1) < 1.0).mean()) > 0.95


def test_planted_dups_survive_projection(spark):
    emb = _emb(spark)
    offset, n = 1_000_000, 20
    dups = emb.filter(F.col("vec_id") < n).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)
        ).alias("embedding"),
    )
    proj = project_embeddings(
        emb.unionByName(dups), out_dim=OUT_DIM
    ).select("vec_id", F.col("proj").alias("embedding"))
    queries = proj.filter(F.col("vec_id") >= offset).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top1 = cosine_topk(queries, proj, k=1).collect()
    hits = sum(1 for r in top1 if r.vec_id == r.q_id - offset)
    assert hits >= int(0.9 * n), f"only {hits}/{n} planted dups at top-1"
