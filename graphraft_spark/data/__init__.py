from graphraft_spark.data.ops import (
    best_label_is_good,
    head_n,
    power_law_rank_sample,
    repair_queries,
    sort_parallel_arrays,
)

__all__ = [
    "best_label_is_good",
    "head_n",
    "power_law_rank_sample",
    "repair_queries",
    "sort_parallel_arrays",
]
