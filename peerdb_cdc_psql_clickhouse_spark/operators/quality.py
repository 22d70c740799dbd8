"""Distributed-trained quality classifier (logistic regression).

The FineWeb-Edu / DCLM shape (public method): train a small linear
classifier on labeled quality judgments over row-local document
signals, then score the WHOLE corpus with it and keep the top band.
The split that makes this work at 100 TB:

- training runs on the labeled subset (bounded by construction — human
  or LLM judgments are the expensive input) with exact distributed
  batch gradient descent: every iteration is one Arrow pass computing
  per-partition gradient partials, a tiny (partitions x (d+2)) exact
  combine, and a driver-side weight update — the corpus is never
  shuffled and the model never exceeds one broadcast row;
- scoring is a PURE JVM projection: the trained weights become plan
  literals, so the 100 TB pass is whole-stage-codegen arithmetic with
  zero Python in the loop (plan-gated in tests/test_quality.py).

Features default to the x3b doc-signal battery (text.doc_signals) so
the classifier composes with the existing one-scan signals stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUALITY_FEATURES = (
    "token_cnt",
    "stopword_ratio",
    "avg_token_len",
    "dup_ngram_frac",
)


def _staged_features(df: DataFrame, feature_cols, label_col=None):
    """Project (features..., label?) with NULLs zeroed — one scan."""
    cols = [
        F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
        for c in feature_cols
    ]
    if label_col is not None:
        cols.append(F.col(label_col).cast("double").alias("_y"))
    return df.select(*cols)


def feature_moments(df: DataFrame, feature_cols) -> tuple[list, list]:
    """Per-feature mean and population stddev in ONE aggregate pass
    (std floored at 1e-12 so constant features standardize to 0
    instead of dividing by zero)."""
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(c).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(c).alias(f"s_{c}"))
    row = df.agg(*aggs).collect()[0]
    mean = [float(row[f"m_{c}"]) for c in feature_cols]
    std = [
        max(float(row[f"s_{c}"] or 0.0), 1e-12) for c in feature_cols
    ]
    return mean, std


def train_quality_classifier(
    labeled: DataFrame,
    feature_cols=QUALITY_FEATURES,
    label_col: str = "label",
    iters: int = 60,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Exact full-batch gradient descent on standardized features.

    Returns {"features", "mean", "std", "weights", "bias"} — a
    broadcast-sized model dict. Deterministic: zero init, exact
    partial-sum combine, no sampling. Each iteration = one Arrow pass
    over the labeled frame (persisted across iterations) emitting
    (grad[d+1], loss, n) partials per partition; only those tiny rows
    shuffle. At corpus scale the labeled set is millions of rows at
    most, so 60 passes is minutes — the 100 TB side is score_quality's
    single projection, not this loop.
    """
    import numpy as np
    import pandas as pd

    d = len(feature_cols)
    staged = _staged_features(labeled, feature_cols, label_col)
    mean, std = feature_moments(staged, feature_cols)
    m_arr = np.asarray(mean)
    s_arr = np.asarray(std)

    staged = staged.persist()
    try:
        n_total = staged.count()  # also materializes the persist
        w = np.zeros(d + 1)  # [bias, weights...]

        for _ in range(iters):
            wb = w.copy()

            def partials(pdfs, wb=wb):
                for pdf in pdfs:
                    x = pdf[list(feature_cols)].to_numpy(dtype="float64")
                    x = (x - m_arr) / s_arr
                    y = pdf["_y"].to_numpy(dtype="float64")
                    z = wb[0] + x @ wb[1:]
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - y
                    grad = np.concatenate(([err.sum()], err @ x))
                    yield pd.DataFrame(
                        {
                            "pos": range(d + 1),
                            "g": grad.tolist(),
                            "n": [len(y)] * (d + 1),
                        }
                    )

            rows = (
                staged.mapInPandas(partials, "pos int, g double, n long")
                .groupBy("pos")
                .agg(F.sum("g").alias("g"), F.sum("n").alias("n"))
                .collect()
            )
            grad = np.zeros(d + 1)
            for r in rows:
                grad[r["pos"]] = r["g"]
            grad /= n_total
            grad[1:] += l2 * w[1:]  # don't regularize the bias
            w -= lr * grad
    finally:
        staged.unpersist()

    return {
        "features": list(feature_cols),
        "mean": mean,
        "std": std,
        "weights": w[1:].tolist(),
        "bias": float(w[0]),
    }


def score_quality(
    df: DataFrame, model: dict, score_col: str = "quality_score"
) -> DataFrame:
    """Append sigmoid(bias + sum_i w_i * (f_i - mean_i) / std_i) as a
    plan-literal JVM expression — zero Python, zero shuffle, one scan.
    This is the whole-corpus pass, so it must stay inside codegen
    (plan-gated: no ArrowEvalPython / BatchEvalPython node)."""
    z = F.lit(model["bias"])
    for c, wi, mi, si in zip(
        model["features"], model["weights"], model["mean"], model["std"]
    ):
        if wi == 0.0:
            continue
        z = z + F.lit(wi) * (
            (F.coalesce(F.col(c).cast("double"), F.lit(0.0)) - F.lit(mi))
            / F.lit(si)
        )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(score_col, score)


def quality_filter(
    df: DataFrame,
    model: dict,
    threshold: float = 0.5,
    score_col: str = "quality_score",
) -> DataFrame:
    """Keep rows scoring >= threshold. The score projection and the
    filter fuse into the same codegen stage as the scan."""
    return score_quality(df, model, score_col).filter(
        F.col(score_col) >= F.lit(threshold)
    )


def model_accuracy(
    labeled: DataFrame, model: dict, label_col: str = "label"
) -> float:
    """Training-set accuracy at the 0.5 cut — one scan + tiny agg."""
    scored = score_quality(labeled, model)
    row = scored.agg(
        F.avg(
            (
                (F.col("quality_score") >= 0.5).cast("int")
                == F.col(label_col).cast("int")
            ).cast("double")
        ).alias("acc")
    ).collect()[0]
    return float(row["acc"])


def log_loss(labeled: DataFrame, model: dict, label_col="label") -> float:
    """Mean logistic loss — the monotone training-progress scalar
    (pytest asserts it falls across iterations). Clipped for the
    degenerate p in {0, 1} corners."""
    eps = 1e-12
    scored = score_quality(labeled, model)
    p = F.least(
        F.greatest(F.col("quality_score"), F.lit(eps)), F.lit(1 - eps)
    )
    y = F.col(label_col).cast("double")
    row = scored.agg(
        F.avg(-(y * F.log(p) + (1 - y) * F.log(1 - p))).alias("ll")
    ).collect()[0]
    return float(row["ll"])
