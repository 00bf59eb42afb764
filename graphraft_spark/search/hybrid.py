"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine KNN)
rankings with Reciprocal Rank Fusion (Cormack et al. 2009) —
``score(d) = sum over rankers of 1 / (k + rank_r(d))``.

RRF is the standard production fusion for hybrid search (Elasticsearch,
Vespa, OpenSearch all default to it) because it needs no score
calibration between rankers — only ranks.

Scale shape: each ranker already returns a top-N frame (driver-bounded
size — TakeOrdered output), so fusion is a union of tiny frames + one
tiny aggregate.  The heavy lifting stays in the rankers, which scan /
probe their own indexes; fusion itself is O(sum of top-N) regardless
of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rank(ranked: DataFrame, order_cols, id_col: str) -> DataFrame:
    """(id, rank): 1-based dense ranks over a deterministic total order
    (callers MUST include a unique tiebreak in ``order_cols``)."""
    w = Window.orderBy(*order_cols)
    return ranked.select(F.col(id_col),
                         F.row_number().over(w).alias("rank"))


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", topk: int = 20) -> DataFrame:
    """(id, rrf): fused top-k over ranking frames of (id, rank).

    A document absent from a ranker simply contributes nothing for it —
    the Cormack et al. formulation.  Deterministic tiebreak on id.  The
    single-partition window in :func:`with_rank` is fine because every
    input is already a top-N frame, never a corpus."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    contrib = None
    for r in rankings:
        c = r.select(F.col(id_col),
                     (F.lit(1.0) / (k + F.col("rank"))).alias("contrib"))
        contrib = c if contrib is None else contrib.unionByName(c)
    return (contrib.groupBy(id_col)
            .agg(F.round(F.sum("contrib"), 6).alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc(id_col))
            .limit(topk))
