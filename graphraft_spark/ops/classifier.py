"""In-engine distributed training of a quality classifier (north-star
extension): logistic regression over the text-quality feature columns,
trained by full-batch gradient descent where each iteration is ONE
scan computing per-partition gradient partial sums (the same reduction
contract as the k-means and PQ trainers — O(partitions × dim) rows to
the driver, never the data).

The payoff is the inference side: ``logreg_score`` compiles the
trained weights into a NATIVE column expression — scoring 100 TB of
documents runs entirely inside whole-stage codegen, no Python, no UDF.
This is the engine-side analog of the fastText-style quality filters
used to curate LLM pretraining corpora; a learned model replaces the
hand-tuned threshold in the quality gate with the identical
downstream plumbing (filter/quantile-gate on the score column).

Determinism: full-batch GD with fixed init (zeros), fixed iteration
count, and float64 partial sums — same weights on every run and any
partitioning (up to float summation order; partials are reduced in
sorted partition order on the driver to pin that too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_train(df: DataFrame, feature_cols: list[str], label_col: str,
                 iters: int = 20, lr: float = 0.5,
                 l2: float = 0.0) -> dict[str, float]:
    """Train w, b by full-batch GD; returns ``{col: weight, "_bias": b}``.

    Features should be roughly unit-scale (the quality features are
    ratios in [0, 1]); standardize upstream otherwise."""
    import numpy as np

    d = len(feature_cols)
    w = np.zeros(d, dtype="float64")
    b = 0.0
    n_total = None

    for _ in range(iters):
        w_cur, b_cur = w.copy(), b

        def kernel(batches, w_cur=w_cur, b_cur=b_cur):
            import pandas as pd

            gw = np.zeros(d, dtype="float64")
            gb = 0.0
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                x = pdf[feature_cols].to_numpy(dtype="float64")
                y = pdf[label_col].to_numpy(dtype="float64")
                z = x @ w_cur + b_cur
                p = 1.0 / (1.0 + np.exp(-z))
                e = p - y
                gw += x.T @ e
                gb += float(e.sum())
                n += len(pdf)
            yield pd.DataFrame({"g": [gw.tobytes()], "gb": [gb],
                                "n": [n]})

        parts = sorted(
            df.select(*feature_cols, label_col).mapInPandas(
                kernel, schema="g binary, gb double, n bigint").collect(),
            key=lambda r: (r["n"], r["gb"]))
        gw = np.zeros(d, dtype="float64")
        gb = 0.0
        n_total = 0
        for r in parts:
            gw += np.frombuffer(r["g"])
            gb += r["gb"]
            n_total += r["n"]
        if n_total == 0:
            raise ValueError("logreg_train: empty training frame")
        w = w - lr * (gw / n_total + l2 * w)
        b = b - lr * (gb / n_total)
    out = {c: float(w[i]) for i, c in enumerate(feature_cols)}
    out["_bias"] = float(b)
    return out


def logreg_score(weights: dict[str, float]) -> Column:
    """Trained weights → a NATIVE probability expression (sigmoid of
    the linear form) — inference stays in whole-stage codegen."""
    z = F.lit(weights["_bias"])
    for c, wv in weights.items():
        if c != "_bias":
            z = z + F.col(c) * F.lit(wv)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_classifier_filter(df: DataFrame, weights: dict[str, float],
                              threshold: float = 0.5,
                              score_col: str = "quality_prob") -> DataFrame:
    """The learned replacement for a hand-tuned quality gate: attach the
    score column, keep rows above the threshold."""
    return (df.withColumn(score_col, logreg_score(weights))
            .filter(F.col(score_col) >= threshold))
