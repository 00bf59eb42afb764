"""In-engine logistic-regression quality classifier (ops/classifier.py):
learns a separable rule, is deterministic across runs and
partitionings, and scores with a pure native expression (no Python in
the inference plan)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def labeled(spark):
    """Separable synthetic data: label 1 iff 0.8*f1 - 0.6*f2 + noise-free
    margin > 0.1, features in [0,1]."""
    df = spark.range(0, 2000).select(
        F.col("id"),
        ((F.col("id") * 7919 % 1000) / 1000.0).alias("f1"),
        ((F.col("id") * 104729 % 1000) / 1000.0).alias("f2"))
    return df.withColumn(
        "label",
        (F.col("f1") * 0.8 - F.col("f2") * 0.6 > 0.1).cast("double")
    ).persist()


def test_learns_separable_rule(spark, labeled):
    from graphraft_spark.ops.classifier import logreg_score, logreg_train

    w = logreg_train(labeled, ["f1", "f2"], "label", iters=200, lr=2.0)
    # direction must match the generating rule
    assert w["f1"] > 0 and w["f2"] < 0
    scored = labeled.withColumn("p", logreg_score(w))
    acc = scored.filter(
        ((F.col("p") >= 0.5) == (F.col("label") == 1.0))).count() / 2000
    assert acc >= 0.95, acc


def test_deterministic_across_partitionings(labeled):
    from graphraft_spark.ops.classifier import logreg_train

    a = logreg_train(labeled, ["f1", "f2"], "label", iters=10, lr=1.0)
    b = logreg_train(labeled.repartition(17), ["f1", "f2"], "label",
                     iters=10, lr=1.0)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12), k


def test_inference_is_pure_codegen(spark, labeled):
    """The scoring plan must contain no Python evaluation at all."""
    from graphraft_spark.ops.classifier import logreg_train, \
        quality_classifier_filter

    w = logreg_train(labeled, ["f1", "f2"], "label", iters=5, lr=1.0)
    plan = quality_classifier_filter(labeled, w)._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "PythonUDF"):
        assert marker not in plan, marker


def test_empty_frame_raises(spark):
    from graphraft_spark.ops.classifier import logreg_train

    empty = spark.createDataFrame([], "f1 double, f2 double, label double")
    with pytest.raises(ValueError, match="empty"):
        logreg_train(empty, ["f1", "f2"], "label", iters=1)


def test_quality_features_integration(spark):
    """Train on the real quality features of the documents table with
    weak labels from the hand-tuned score; the learned filter keeps a
    plausible high-quality subset and agrees with the labels."""
    from graphraft_spark.ops.classifier import logreg_train, \
        quality_classifier_filter
    from graphraft_spark.ops.text_analysis import quality_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exprs = quality_features(F.col("text"))
    feats = docs.select(
        "doc_id", *[e.cast("double").alias(n) for n, e in exprs.items()])
    fcols = list(exprs)
    assert len(fcols) >= 3
    # unit-scale features (the trainer's documented contract)
    stats = feats.agg(*[F.max(c).alias(c) for c in fcols]).collect()[0]
    feats = feats.select(
        "doc_id", *[(F.col(c) / F.lit(max(stats[c], 1e-9))).alias(c)
                    for c in fcols])
    med = feats.approxQuantile(fcols[0], [0.5], 0.0)[0]
    labeled = feats.withColumn(
        "label", (F.col(fcols[0]) > med).cast("double"))
    w = logreg_train(labeled, fcols, "label", iters=100, lr=2.0)
    kept = quality_classifier_filter(labeled, w)
    n = kept.count()
    assert 0 < n < 500
    agree = kept.filter(F.col("label") == 1.0).count() / n
    assert agree >= 0.9, agree
