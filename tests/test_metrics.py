"""Metric fixtures per FIXTURES.md §2: empty preds, no label found,
duplicate preds, k > len(preds) — values hand-checked against the
reference formulas (compute_metrics.py)."""

import math

from pyspark.sql import functions as F

from graphraft_spark.metrics import compute_metrics, metric_col

ROWS = [
    # (preds, labels)
    ([1, 2, 3], [2, 3, 9]),        # hits=2: P=2/3 R=2/3 f1=2/3 mrr=1/2
    ([], [1]),                     # empty preds: P=0 R=0 f1=0 mrr=0
    ([4, 4, 2], [4]),              # dup preds: hits=1 P=1/3 R=1 mrr=1
    ([7, 8], [9]),                 # no label found: mrr=0 hit@5=0
]


def _df(spark):
    return spark.createDataFrame(
        [(p, l) for p, l in ROWS], "preds array<bigint>, labels array<bigint>")


def test_per_row_metrics(spark):
    df = _df(spark)
    out = df.select(
        *[metric_col(m, F.col("preds"), F.col("labels")).alias(m.replace("@", "_"))
          for m in ["precision", "recall", "f1", "hit@1", "hit@5", "mrr",
                    "num_nodes"]]).collect()
    exp = [
        (2 / 3, 2 / 3, 2 / 3, 0, 1, 1 / 2, 3),
        (0.0, 0.0, 0.0, 0, 0, 0.0, 0),
        (1 / 3, 1.0, 0.5, 1, 1, 1.0, 3),
        (0.0, 0.0, 0.0, 0, 0, 0.0, 2),
    ]
    for got, want in zip(out, exp):
        for g, w in zip(got, want):
            assert math.isclose(g, w, abs_tol=1e-12), (got, want)


def test_hit_at_k_truncation(spark):
    df = _df(spark)
    got = df.select(metric_col("hit@1", F.col("preds"), F.col("labels"))
                    .alias("h")).collect()
    assert [r["h"] for r in got] == [0, 0, 1, 0]
    # k > len(preds) keeps all (compute_metrics.py:58-60)
    got20 = df.select(metric_col("recall@20", F.col("preds"), F.col("labels"))
                      .alias("r")).collect()
    assert math.isclose(got20[0]["r"], 2 / 3)


def test_macro_average(spark):
    out = compute_metrics(_df(spark), ["precision", "mrr"]).collect()[0]
    assert math.isclose(out["precision"], (2 / 3 + 0 + 1 / 3 + 0) / 4)
    assert math.isclose(out["mrr"], (0.5 + 0 + 1 + 0) / 4)


def test_reference_parity_random(spark):
    """Property check: our expressions == the reference's Python
    formulas (ported verbatim) on random cases."""
    import random

    rnd = random.Random(42)
    cases = []
    for _ in range(200):
        preds = [rnd.randrange(8) for _ in range(rnd.randrange(0, 6))]
        labels = [rnd.randrange(8) for _ in range(rnd.randrange(1, 4))]
        cases.append((preds, labels))

    def hits(p, l):
        return len(set(p).intersection(l))

    def ref(metric, p, l, k=-1):
        k_ = len(p) if k == -1 or len(p) < k else k
        p = p[:k_]
        if metric == "precision":
            return hits(p, l) / len(p) if p else 0
        if metric == "recall":
            return hits(p, l) / len(l)
        if metric == "f1":
            pr, rc = ref("precision", p, l), ref("recall", p, l)
            return 2 * pr * rc / (pr + rc) if pr != 0 else 0
        if metric == "hit":
            return 1 if hits(p, l) > 0 else 0
        if metric == "mrr":
            best = min([p.index(x) + 1.0 if x in p else float("inf")
                        for x in l])
            return 0.0 if best == float("inf") else 1 / best

    df = spark.createDataFrame(cases,
                               "preds array<bigint>, labels array<bigint>")
    got = df.select(
        metric_col("precision", F.col("preds"), F.col("labels")).alias("p"),
        metric_col("recall", F.col("preds"), F.col("labels")).alias("r"),
        metric_col("f1", F.col("preds"), F.col("labels")).alias("f"),
        metric_col("hit@3", F.col("preds"), F.col("labels")).alias("h"),
        metric_col("mrr", F.col("preds"), F.col("labels")).alias("m"),
    ).collect()
    for (preds, labels), row in zip(cases, got):
        assert math.isclose(row["p"], ref("precision", preds, labels)), (preds, labels)
        assert math.isclose(row["r"], ref("recall", preds, labels))
        assert math.isclose(row["f"], ref("f1", preds, labels))
        assert row["h"] == ref("hit", preds, labels, 3)
        assert math.isclose(row["m"], ref("mrr", preds, labels))
