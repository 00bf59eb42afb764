"""Graph sampling for GNN / graph-embedding training data: fanout
neighbor sampling (the GraphSAGE mini-batch primitive) and fixed-length
random walks (the DeepWalk/node2vec corpus generator) — both
DETERMINISTIC via the engine's portable hash, so a training run is
reproducible bit-for-bit and every sample is replayable in an external
SQL oracle (no RNG state anywhere, new seed = new sample).

Scale shape:

- neighbor sampling is a per-source window top-``fanout`` over the
  edge frame — hash-partitioned by src, per-partition heaps, never a
  global sort; k hops = k such passes over shrinking frontiers;
- random walks advance ALL walks one step per join round (length L =
  L bounded joins, walk count is the row count — embarrassingly
  parallel, the classic distributed DeepWalk layout).

Reference context: the reference's retrieval trains GNN-free, but its
ecosystem (STaRK/PRIME graphs) is exactly where a user would hang
GraphSAGE samplers; these make the engine cover that training-data
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphraft_spark.data.ops import _portable_hash60


def sample_neighbors(edges: DataFrame, fanout: int, seed: str = "s0",
                     src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """≤ ``fanout`` out-edges per source, chosen by portable-hash rank
    (uniform without replacement, deterministic per seed)."""
    h = _portable_hash60(
        F.concat_ws("#", F.col(src_col), F.col(dst_col)), seed)
    w = Window.partitionBy(src_col).orderBy(h.asc(), F.col(dst_col))
    return (edges.select(src_col, dst_col)
            .distinct()
            .withColumn("nbr_rank", F.row_number().over(w))
            .filter(F.col("nbr_rank") <= fanout))


def khop_sample(edges: DataFrame, seeds: DataFrame,
                fanouts: tuple[int, ...] = (3, 2), seed: str = "s0",
                src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """GraphSAGE-style layered sample: from the seed nodes, take
    ``fanouts[0]`` sampled out-edges, then ``fanouts[1]`` from their
    destinations, and so on.  Returns sampled edges tagged with
    ``hop`` (1-based).  Each hop's frontier is the distinct
    destinations of the previous hop (revisits allowed across hops, as
    in the standard sampler).  The seed string is salted per hop so
    layers draw independently."""
    out = None
    frontier = seeds.select(F.col(seeds.columns[0]).alias(src_col)) \
        .distinct()
    for i, f in enumerate(fanouts):
        sampled = (sample_neighbors(edges, f, seed=f"{seed}#h{i}",
                                    src_col=src_col, dst_col=dst_col)
                   .join(frontier, src_col)
                   .withColumn("hop", F.lit(i + 1)))
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select(F.col(dst_col).alias(src_col)) \
            .distinct()
    return out


def random_walks(edges: DataFrame, starts: DataFrame, length: int = 4,
                 seed: str = "w0", src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Fixed-length deterministic random walks: from each start row
    (walk_id, node), at every step move to the out-neighbor with the
    minimal portable hash of (seed, walk_id, step, current, neighbor).
    A node with no out-edges ends its walk early.  Returns
    (walk_id, step, node) with step 0 = the start — explode-free
    DeepWalk corpus generation, one bounded join per step.

    The edge set and each step's frontier are lazily localCheckpoint'd:
    step k is consumed both by the output union and by step k+1's
    lineage, and without the truncation every union branch re-plans its
    whole prefix — step k executed (length−k+1) times, the quadratic
    re-execution pattern hits() hit at round 9 (deterministic hashing
    keeps that CORRECT, just wasteful)."""
    e = edges.select(src_col, dst_col).distinct() \
        .localCheckpoint(eager=False)
    walks = starts.select("walk_id", F.col(starts.columns[1])
                          .alias("node")) \
        .withColumn("step", F.lit(0))
    out = walks
    cur = walks
    for step in range(1, length + 1):
        cand = (cur.join(e, cur["node"] == e[src_col])
                .select("walk_id", F.col(dst_col).alias("nxt"),
                        F.col("node").alias("cur")))
        h = _portable_hash60(
            F.concat_ws("#", F.col("walk_id"), F.lit(step),
                        F.col("cur"), F.col("nxt")), seed)
        w = Window.partitionBy("walk_id").orderBy(h.asc(),
                                                  F.col("nxt"))
        nxt = (cand.withColumn("rn", F.row_number().over(w))
               .filter("rn = 1")
               .select("walk_id", F.col("nxt").alias("node"))
               .withColumn("step", F.lit(step))
               .localCheckpoint(eager=False))
        out = out.unionByName(nxt)
        cur = nxt
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, cnt): co-occurrence pairs within ``window``
    steps on each walk — the skip-gram training examples DeepWalk/
    node2vec feed to word2vec.  A bounded self-join per walk (each row
    matches ≤ 2·window others), then a count aggregate; both shuffle
    on walk_id / pair keys only."""
    a = walks.select(F.col("walk_id"), F.col("step").alias("s1"),
                     F.col("node").alias("center"))
    b = walks.select(F.col("walk_id"), F.col("step").alias("s2"),
                     F.col("node").alias("context"))
    return (a.join(b, "walk_id")
            .filter((F.col("s1") != F.col("s2"))
                    & (F.abs(F.col("s1") - F.col("s2")) <= window))
            .groupBy("center", "context")
            .agg(F.count("*").alias("cnt")))
