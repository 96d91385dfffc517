"""Logistic-regression quality classifier: determinism, learning, and
serving-plan shape (the oracle replay itself is covered by the
registry's logistic_quality entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_performance_docling_spark.operators import classifier as C

SF = "/root/testdata/sf0.001"


def _feats(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return C.lr_features(docs)


def test_fit_is_deterministic(spark):
    feats = _feats(spark)
    w1 = C.lr_fit(feats, n_iter=8)
    w2 = C.lr_fit(feats, n_iter=8)
    assert w1 == w2
    assert all(isinstance(x, float) for x in w1) and len(w1) == 4


def test_learns_above_majority_floor(spark):
    feats = _feats(spark)
    w = C.lr_fit(feats, n_iter=8)
    scored = C.lr_score(feats, w)
    n = scored.count()
    acc = scored.filter("label = pred").count() / n
    pos = scored.filter("label = 1").count() / n
    floor = max(pos, 1.0 - pos)
    assert acc >= floor + 0.15, (acc, floor)


def test_scores_are_calibrated_probabilities(spark):
    feats = _feats(spark)
    w = C.lr_fit(feats, n_iter=8)
    scored = C.lr_score(feats, w)
    row = scored.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0
    # pred is exactly the score >= 0.5 decision (margin form)
    assert scored.filter(
        ((F.col("score") >= 0.5) & (F.col("pred") == 0))
        | ((F.col("score") < 0.5) & (F.col("pred") == 1))
    ).count() == 0


def test_serving_is_zero_shuffle_jvm_projection(spark):
    feats = _feats(spark)
    scored = C.lr_score(feats, [0.1, 0.2, 0.3, 0.4])
    p = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
