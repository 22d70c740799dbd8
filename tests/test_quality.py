"""Quality classifier: distributed GD matches an independent numpy
implementation to float tolerance, learns a recoverable synthetic
rule over the real doc-signal features, loss falls monotonically,
and the scoring path is pure JVM (no Python eval node in the plan).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.quality import (
    QUALITY_FEATURES,
    log_loss,
    model_accuracy,
    quality_filter,
    score_quality,
    train_quality_classifier,
)
from peerdb_cdc_psql_clickhouse_spark.operators.text import doc_signals

def _rule():
    # the synthetic labeling rule: long-enough docs with low n-gram
    # repetition are "quality" — expressible in the feature basis, so
    # a linear model can recover it
    return (
        (F.col("token_cnt") >= 40) & (F.col("dup_ngram_frac") <= 0.05)
    ).cast("int")


def _labeled(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return doc_signals(docs).withColumn("label", _rule())


def _numpy_train(x, y, iters, lr, l2=0.0):
    """Independent reference: same zero init / standardize / full-batch
    GD, written against numpy only."""
    m = x.mean(axis=0)
    s = np.maximum(x.std(axis=0), 1e-12)
    xs = (x - m) / s
    n, d = xs.shape
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = w[0] + xs @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        grad = np.concatenate(([err.sum()], err @ xs)) / n
        grad[1:] += l2 * w[1:]
        w -= lr * grad
    return w, m, s


def test_distributed_gd_matches_numpy(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=25, lr=0.7, l2=0.01)

    pdf = labeled.select(*QUALITY_FEATURES, "label").toPandas()
    x = pdf[list(QUALITY_FEATURES)].to_numpy(dtype="float64")
    y = pdf["label"].to_numpy(dtype="float64")
    w, m, s = _numpy_train(x, y, iters=25, lr=0.7, l2=0.01)

    assert np.allclose(model["mean"], m, rtol=1e-9)
    assert np.allclose(model["std"], s, rtol=1e-9)
    # partial-sum order differs between engines — tolerance, not exact
    assert np.allclose(model["weights"], w[1:], rtol=1e-6, atol=1e-9)
    assert np.isclose(model["bias"], w[0], rtol=1e-6, atol=1e-9)


def test_learns_the_planted_rule(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=120, lr=1.0)
    acc = model_accuracy(labeled, model)
    assert acc >= 0.9, acc  # measured 0.97 at sf0.001


def test_loss_falls_with_training(spark):
    labeled = _labeled(spark)
    m10 = train_quality_classifier(labeled, iters=10, lr=0.5)
    m40 = train_quality_classifier(labeled, iters=40, lr=0.5)
    assert log_loss(labeled, m40) < log_loss(labeled, m10)


def test_scoring_matches_numpy_sigmoid(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=15, lr=0.5)
    got = (
        score_quality(labeled, model)
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
        .toPandas()
    )
    pdf = labeled.select("doc_id", *QUALITY_FEATURES).orderBy("doc_id").toPandas()
    x = pdf[list(QUALITY_FEATURES)].to_numpy(dtype="float64")
    z = model["bias"] + (
        (x - np.asarray(model["mean"])) / np.asarray(model["std"])
    ) @ np.asarray(model["weights"])
    want = 1.0 / (1.0 + np.exp(-z))
    assert np.allclose(got["quality_score"].to_numpy(), want, rtol=1e-9)


def test_scoring_is_pure_jvm_and_filter_fuses(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=5, lr=0.5)
    # scoring a plain parquet-backed frame must stay in codegen
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.lit(50).cast("long").alias("token_cnt"),
        F.lit(0.3).alias("stopword_ratio"),
        F.lit(4.2).alias("avg_token_len"),
        F.lit(0.0).alias("dup_ngram_frac"),
    )
    plan = quality_filter(docs, model, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle anywhere


def _numpy_auc(scores, labels):
    # independent tie-aware AUC: average over all pos/neg pairs of
    # [score_p > score_n] + 0.5 [score_p == score_n]
    import numpy as np

    pos = scores[labels == 1]
    neg = scores[labels == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


def test_auc_matches_pairwise_numpy(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.quality import (
        model_auc,
    )

    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=30, lr=0.7)
    got = model_auc(labeled, model)

    pdf = (
        score_quality(labeled, model)
        .select("quality_score", "label")
        .toPandas()
    )
    want = _numpy_auc(
        pdf["quality_score"].to_numpy(), pdf["label"].to_numpy()
    )
    assert abs(got - want) < 1e-12
    assert got > 0.9  # the planted rule is genuinely learnable


def test_auc_tie_handling(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.quality import (
        model_auc,
    )

    # constant scores -> every pair ties -> AUC exactly 0.5
    df = spark.createDataFrame(
        [(0.0, 1), (0.0, 0), (0.0, 1), (0.0, 0)], "f double, label int"
    )
    model = {
        "features": ["f"],
        "mean": [0.0],
        "std": [1.0],
        "weights": [0.0],
        "bias": 0.0,
    }
    assert model_auc(df, model) == 0.5


def test_calibration_bins_sum_and_bounds(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.quality import (
        calibration_bins,
    )

    labeled = _labeled(spark)
    model = train_quality_classifier(labeled, iters=30, lr=0.7)
    rows = calibration_bins(labeled, model, n_bins=10).collect()
    assert sum(r["n"] for r in rows) == labeled.count()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["frac_pos"] <= 1.0
        # mean score lands inside (or at the edge of) its bin
        assert r["bin"] / 10 - 1e-6 <= r["mean_score"] <= (r["bin"] + 1) / 10 + 1e-6


def _numpy_irls(x, y, iters, l2):
    m = x.mean(axis=0)
    s = np.maximum(x.std(axis=0), 1e-12)
    xs = (x - m) / s
    n, d = xs.shape
    xb = np.concatenate([np.ones((n, 1)), xs], axis=1)
    w = np.zeros(d + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        grad = (p - y) @ xb / n + np.concatenate(([0.0], l2 * w[1:]))
        hess = (xb * (p * (1 - p))[:, None]).T @ xb / n
        ridge = np.diag(np.concatenate(([1e-9], np.full(d, l2 + 1e-9))))
        w -= np.linalg.solve(hess + ridge, grad)
    return w


def test_newton_matches_numpy_irls_and_converges_fast(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(
        labeled, iters=6, l2=0.01, optimizer="newton"
    )
    pdf = labeled.select(*QUALITY_FEATURES, "label").toPandas()
    x = pdf[list(QUALITY_FEATURES)].to_numpy(dtype="float64")
    y = pdf["label"].to_numpy(dtype="float64")
    w = _numpy_irls(x, y, iters=6, l2=0.01)
    assert np.allclose(model["weights"], w[1:], rtol=1e-6, atol=1e-8)
    assert np.isclose(model["bias"], w[0], rtol=1e-6, atol=1e-8)
    # 6 Newton passes beat 120 GD passes on the same data
    gd = train_quality_classifier(labeled, iters=120, lr=1.0)
    assert model_accuracy(labeled, model) >= model_accuracy(labeled, gd) - 0.01
    assert model_accuracy(labeled, model) >= 0.9


def test_scoring_composes_with_streaming(spark, tmp_path):
    """score_quality is map-only, so the SAME model scores a stream
    unmodified — the online face of corpus filtering (score arriving
    shards at ingest). No state, no watermark needed."""
    labeled = _labeled(spark)
    model = train_quality_classifier(
        labeled, iters=6, l2=0.01, optimizer="newton"
    )
    src = str(tmp_path / "in")
    feats = labeled.select("doc_id", *QUALITY_FEATURES).limit(100)
    feats.write.parquet(src)
    stream = spark.readStream.schema(feats.schema).parquet(src)
    got = []
    q = (
        score_quality(stream, model)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(feats, model).collect()
    }
    assert len(got) == 100
    for r in got:
        assert abs(r["quality_score"] - want[r["doc_id"]]) < 1e-12
