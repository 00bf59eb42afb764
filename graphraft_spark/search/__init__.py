from graphraft_spark.search.text import fulltext_match, match_entities
from graphraft_spark.search.vector import (
    cosine_col,
    dot_col,
    knn,
    knn_excluding,
    l2_normalize_col,
)

__all__ = [
    "fulltext_match",
    "match_entities",
    "cosine_col",
    "dot_col",
    "knn",
    "knn_excluding",
    "l2_normalize_col",
]
