"""Persisted artifacts for the train-once / apply-everywhere ops.

The trained inputs of the apply-side operators (BPE merge table,
quality-classifier weights, PQ codebook) are broadcast-sized by
construction, but they must OUTLIVE the session that trained them —
the 100 TB corpus pass usually runs days later, on a different
cluster, against artifacts produced by a small training job. Each
save/load pair here round-trips bit-exactly through parquet (the
same durability story as build_ivf_index / build_ivfpq_index), so
apply jobs depend only on a path, never on a live Python object.

Layout (one directory per artifact, self-describing):
  <path>/           parquet rows (+ _SUCCESS from the write)
BPE merges:         (rank, a, b)
quality model:      (feature, weight, mean, std) + a bias row
PQ codebook:        (s, code, vec)   — same shape build_ivfpq_index
                    persists; these helpers make it a first-class
                    standalone artifact too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def save_bpe_merges(
    spark: SparkSession, merges: list[tuple[str, str]], path: str
) -> None:
    import pandas as pd

    rows = pd.DataFrame(
        {
            "rank": range(len(merges)),
            "a": [a for a, _ in merges],
            "b": [b for _, b in merges],
        }
    )
    spark.createDataFrame(rows).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]


_BIAS_ROW = "__bias__"


def save_quality_model(spark: SparkSession, model: dict, path: str) -> None:
    import pandas as pd

    rows = pd.DataFrame(
        {
            "feature": list(model["features"]) + [_BIAS_ROW],
            "weight": list(model["weights"]) + [model["bias"]],
            "mean": list(model["mean"]) + [0.0],
            "std": list(model["std"]) + [1.0],
            "pos": list(range(len(model["features"]))) + [-1],
        }
    )
    spark.createDataFrame(rows).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_quality_model(spark: SparkSession, path: str) -> dict:
    rows = spark.read.parquet(path).orderBy("pos").collect()
    bias = [r for r in rows if r["feature"] == _BIAS_ROW]
    feats = [r for r in rows if r["feature"] != _BIAS_ROW]
    return {
        "features": [r["feature"] for r in feats],
        "weights": [r["weight"] for r in feats],
        "mean": [r["mean"] for r in feats],
        "std": [r["std"] for r in feats],
        "bias": bias[0]["weight"],
    }


def save_pq_codebook(spark: SparkSession, codebook, path: str) -> None:
    import pandas as pd

    m, ksub, _dsub = codebook.shape
    rows = [
        (s, c, codebook[s, c].tolist())
        for s in range(m)
        for c in range(ksub)
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["s", "code", "vec"])
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pq_codebook(spark: SparkSession, path: str):
    import numpy as np

    rows = spark.read.parquet(path).collect()
    m = 1 + max(r["s"] for r in rows)
    ksub = 1 + max(r["code"] for r in rows)
    dsub = len(rows[0]["vec"])
    cb = np.zeros((m, ksub, dsub))
    for r in rows:
        cb[r["s"], r["code"]] = r["vec"]
    return cb
