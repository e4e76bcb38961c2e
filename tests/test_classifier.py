"""Distributed logistic-regression quality classifier
(operators/classifier.py): learning actually happens — separation on
the training signal, sane probabilities, deterministic retrain."""

import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.classifier import (
    doc_features,
    score_logreg,
    train_logreg,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, "clean curated quality prose text sample "
                        f"tok{i % 7}", 1.0))
    for i in range(60, 120):
        rows.append((i, "spam junk noise garbage lowquality blob "
                        f"tok{i % 5}", 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_training_separates_classes(spark, corpus):
    w = train_logreg(corpus, label_col="y", dim=64, iters=8, lr=4.0)
    scored = score_logreg(corpus, w, dim=64).join(
        corpus.select("doc_id", "y"), "doc_id")
    means = {r.y: r.m for r in scored.groupBy("y").agg(
        F.avg("score").alias("m")).collect()}
    assert means[1.0] > 0.7 > 0.3 > means[0.0]
    # every score is a probability
    mn, mx = scored.agg(F.min("score"), F.max("score")).collect()[0]
    assert 0.0 <= mn and mx <= 1.0


def test_training_is_deterministic(spark, corpus):
    w1 = {r.f: r.w for r in train_logreg(
        corpus, label_col="y", dim=32, iters=2).collect()}
    w2 = {r.f: r.w for r in train_logreg(
        corpus, label_col="y", dim=32, iters=2).collect()}
    assert w1 == w2
    assert len(w1) == 33  # dim + bias


def test_features_normalized_and_bias_present(spark, corpus):
    feats = doc_features(corpus.limit(5), dim=16)
    rows = feats.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.f, r.x))
    for d, fx in by_doc.items():
        bias = [x for f, x in fx if f == 16]
        assert bias == [1.0]
        tf_sum = sum(x for f, x in fx if f != 16)
        assert tf_sum == pytest.approx(1.0, rel=1e-9)  # tf/dl sums to 1


def test_empty_doc_scores_through_bias_only(spark):
    w_df = spark.createDataFrame(
        [(i, 0.0) for i in range(16)] + [(16, 2.0)], "f long, w double")
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    s = score_logreg(df, w_df, dim=16).collect()[0]
    import math
    assert s.score == pytest.approx(1 / (1 + math.exp(-2.0)), rel=1e-9)
