from graphraft_spark.metrics.ir_metrics import (
    compute_metrics,
    hit_col,
    hits_col,
    metric_col,
    mrr_col,
    precision_col,
    recall_col,
    f1_col,
    topk_col,
)

__all__ = [
    "compute_metrics",
    "hit_col",
    "hits_col",
    "metric_col",
    "mrr_col",
    "precision_col",
    "recall_col",
    "f1_col",
    "topk_col",
]
