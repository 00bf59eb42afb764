"""IR metrics (reference compute_metrics.py) as native column expressions.

Per-example metrics over ``preds ARRAY`` / ``labels ARRAY`` rows,
macro-averaged with ``avg`` (compute_metrics.py:62-64).  ``@k`` metrics
truncate preds to the first k (k=-1 ⇒ no cut, compute_metrics.py:58-60).
Set semantics via ``array_intersect`` (len(set(preds) ∩ labels),
compute_metrics.py:34-35); ``precision`` divides by the *raw* pred count
including duplicates (compute_metrics.py:40-41).

Everything is JVM-side whole-stage-codegen expressions — metrics over a
billion QA rows are one scan + one partial/final average, no Python.

Deviation noted: ``recall`` on empty labels returns 0.0 here; the
reference raises ZeroDivisionError (its datasets never have empty
answer sets, compute_metrics.py:43-44).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_col(preds: Column, k: int) -> Column:
    """compute_metrics.py:58-60 — first-k truncation; k=-1 keeps all;
    k beyond length keeps all (slice is forgiving)."""
    if k == -1:
        return preds
    return F.slice(preds, 1, k)


def hits_col(preds: Column, labels: Column) -> Column:
    return F.size(F.array_intersect(preds, labels))


def num_nodes_col(preds: Column, labels: Column) -> Column:
    return F.size(preds).cast("bigint")


def hit_col(preds: Column, labels: Column) -> Column:
    return (hits_col(preds, labels) > 0).cast("int")


def precision_col(preds: Column, labels: Column) -> Column:
    return F.when(
        F.size(preds) > 0,
        hits_col(preds, labels) / F.size(preds)
    ).otherwise(F.lit(0.0))


def recall_col(preds: Column, labels: Column) -> Column:
    return F.when(
        F.size(labels) > 0,
        hits_col(preds, labels) / F.size(labels)
    ).otherwise(F.lit(0.0))


def f1_col(preds: Column, labels: Column) -> Column:
    p = precision_col(preds, labels)
    r = recall_col(preds, labels)
    return F.when(p != 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))


def mrr_col(preds: Column, labels: Column) -> Column:
    """1 / rank of the best-ranked label; 0 when no label appears
    (compute_metrics.py:51-56: min over labels of 1-based index, inf if
    absent)."""
    ranks = F.transform(labels, lambda l: F.array_position(preds, l))
    best = F.array_min(F.filter(ranks, lambda p: p > 0))
    return F.coalesce(F.lit(1.0) / best.cast("double"), F.lit(0.0))


_BASE = {
    "precision": precision_col,
    "recall": recall_col,
    "f1": f1_col,
    "hit": hit_col,
    "mrr": mrr_col,
    "num_nodes": num_nodes_col,
}


def metric_col(name: str, preds: Column, labels: Column) -> Column:
    """Dispatcher with '@k' parsing (compute_metrics.py:3-29):
    'recall@20', 'hit@5', 'mrr', 'num_nodes', ..."""
    parts = name.lower().split("@")
    base, k = parts[0], int(parts[1]) if len(parts) > 1 else -1
    if base not in _BASE:
        raise ValueError(f"{name} is not a valid metric")
    return _BASE[base](topk_col(preds, k), labels)


def compute_metrics(df: DataFrame, metrics: list[str],
                    preds: str = "preds", labels: str = "labels") -> DataFrame:
    """Macro-averaged metric row over all examples — the DataFrame analog
    of compute_metrics(predss, labelss, metrics)."""
    p, l = F.col(preds), F.col(labels)
    return df.agg(*[
        F.avg(metric_col(m, p, l)).alias(m) for m in metrics
    ])
