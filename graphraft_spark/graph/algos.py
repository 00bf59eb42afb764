"""Whole-graph analytics over the property graph: degree centrality and
PageRank.

The reference pipeline retrieves by pattern matching only; these are the
standard graph-signal extensions a corpus-scale deployment layers on top
(seed ranking for retrieval, hub detection for pruning, importance
features for the quality gate).

Both operators are pure DataFrame plans:

- degrees: one groupBy over the (already materialized) undirected edge
  frame — a single shuffle keyed by node id.
- PageRank: classic power iteration; each round is one join (ranks ⋈
  edges on src — both sides hash-partitioned by the same key, so AQE
  reuses the exchange) + one aggregate keyed by dst.  Dangling-node
  mass is redistributed uniformly each round (the standard correction;
  without it rank mass leaks and the vector no longer sums to 1).
  Each round's result is materialized with an eager localCheckpoint
  (checkpoint_every=1): the rank frame is referenced TWICE per round
  (dangling aggregate + contribution join), so an unmaterialized
  lineage would re-execute the previous rounds ~2× per reference —
  measured as a 14× wall blowup at 10 rounds before this guard.
  Eager rather than lazy: the round's first consumer is the dangling
  total's broadcast build, and materializing inside that broadcast
  (the lazy form) measured 1.06-1.13× slower in interleaved A/B —
  the lazy+count fusion only pays where an explicit action is the
  materializer (betweenness/bfs/k_core).  Checkpointing |V|
  two-column rows per round is the cheap side of that trade at any
  scale.

At 100 TB scale the per-round cost is the fact-table shuffle; the right
deployment pre-partitions the edge frame by src once (bucketed sink) so
every round's join is shuffle-free on the edge side, and ranks (|V|
rows, two columns) are the only moving data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _keyed_cache(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` hash-partitioned AND sorted by ``key`` — the
    in-session analog of a bucketed+sorted table (guide §2.4): every
    later equi-join or aggregation keyed on ``key`` reads the cached
    partitioning/ordering straight from the InMemoryTableScan, so the
    per-round join of an iterative algorithm never re-exchanges (or
    re-sorts) this side again.  One shuffle+sort at build time buys
    zero exchanges for the n_iter reuses; callers unpersist when done."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (df.repartition(n, F.col(key))
            .sortWithinPartitions(key).persist())


def _broadcast_threshold_bytes(spark) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (0 when
    disabled/unparseable — every gate below then falls back to the
    shuffle-keyed shape)."""
    v = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                           "10485760")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1024), ("mb", 1024 ** 2), ("gb", 1024 ** 3),
                   ("k", 1024), ("m", 1024 ** 2), ("g", 1024 ** 3),
                   ("b", 1)):
        if v.endswith(suf):
            v, mult = v[: -len(suf)], m
            break
    try:
        return max(0, int(float(v) * mult))
    except ValueError:
        return 0


def _fits_broadcast(n_rows: int, n_cols: int, spark) -> bool:
    """Size gate for the per-round small frame of an iterative
    algorithm: True when a frame of ``n_rows`` fixed-width rows with
    ``n_cols`` columns is safely under the session broadcast threshold
    (UnsafeRow layout: one 8-byte null word + 8 bytes per field — the
    same arithmetic the planner's own size estimate approximates for
    fixed-width schemas).

    The per-round joins of pagerank/hits/label-propagation/Brandes
    stream the big cached edge frame against a |V|-proportional score
    frame.  When the score frame broadcasts, the JOIN key needs no
    partitioning at all — so the edge cache should be keyed by the
    round's AGGREGATION key instead, making the groupBy ride the cached
    partitioning exchange-free (guide §2.4 + §3.1).  When it cannot
    broadcast (the 100 TB shape), the join itself is the shuffle to
    avoid, and the cache must stay keyed by the JOIN key.  This gate
    picks the shape; the threshold it reads is the deployment's own
    scale knob, so the decision transfers to cluster configs unchanged.
    """
    return 0 < n_rows * 8 * (1 + n_cols) < _broadcast_threshold_bytes(spark)


# Below this edge count a 32-ish-partition exchange is pure stage
# latency, not bytes, and a SECOND agg-keyed edge cache costs more to
# build than the per-round exchanges it removes (interleaved A/B: the
# ~10²-edge event-type graph read 1.05× SLOWER with the extra cache,
# while the 1.36M-edge TPC-H graph read 0.72× on the shared hits shape).
# Only pagerank/PPR pay an extra cache for the swap, so only they gate
# on it; hits/label-propagation choose between caches they build anyway.
AGGKEY_SWAP_MIN_EDGES = 100_000


def degrees(edges: DataFrame) -> DataFrame:
    """(nodeId, degree) over a DIRECTED edge frame, counting both
    endpoints — i.e. the undirected degree of the simple graph."""
    ends = (edges.select(F.col("src").alias("nodeId"))
            .unionAll(edges.select(F.col("dst").alias("nodeId"))))
    return ends.groupBy("nodeId").agg(F.count("*").alias("degree"))


def pagerank(nodes: DataFrame, edges: DataFrame, alpha: float = 0.85,
             n_iter: int = 20, checkpoint_every: int = 1) -> DataFrame:
    """PageRank on the directed graph (nodes: nodeId; edges: src, dst).

    Returns (nodeId, rank) with ranks summing to 1.  Fixed iteration
    count (deterministic plan shape; callers wanting a tolerance stop
    can compare successive frames — at fleet scale a fixed budget is
    what you schedule anyway).
    """
    n_nodes = nodes.select("nodeId").distinct()
    # Static per-round inputs: keep them materialized once.  The edge
    # frame caches FIRST, partitioned+sorted by the per-round join key
    # (src), so each round's contribution join streams it exchange- and
    # sort-free from cache; out_deg then derives from the CACHED edges —
    # previously both out_deg and e re-executed the caller's whole edge
    # derivation (for the event-type graph that was the 600k-row
    # window scan twice).
    e = _keyed_cache(edges.select("src", "dst"), "src")
    ecount = e.count()
    out_deg = (e.groupBy(F.col("src").alias("nodeId"))
               .agg(F.count("*").alias("out_deg")))
    base = _keyed_cache(
        n_nodes.join(out_deg, "nodeId", "left")
        .select("nodeId", F.coalesce("out_deg", F.lit(0))
                .alias("out_deg")),
        "nodeId")
    total = base.count()  # materializes `base`; |V| for teleport term

    # Per-round shape gate (guide §2.4/§3.1): ranks is (nodeId, out_deg,
    # rank) × |V|.  When it fits a broadcast, the contribution join
    # needs no edge partitioning — so the rounds read a SECOND edge
    # cache keyed by the AGGREGATION key (dst): groupBy(dst) rides the
    # cached partitioning exchange-free, and contrib comes out already
    # co-partitioned with `base` (hash(nodeId)) for the update join.
    # One extra cache build+count at setup buys n_iter exchange-free
    # rounds; above the threshold the original src-keyed shape (join is
    # the shuffle to avoid) is untouched.
    if (ecount >= AGGKEY_SWAP_MIN_EDGES
            and _fits_broadcast(total, 3, nodes.sparkSession)):
        e_iter = _keyed_cache(e, "dst")
        e_iter.count()
        _hint = F.broadcast
    else:
        e_iter, _hint = e, (lambda df: df)

    ranks = base.select("nodeId", "out_deg",
                        (F.lit(1.0) / total).alias("rank"))
    teleport = (1.0 - alpha) / total
    for i in range(n_iter):
        # Mass each node sends per out-edge; dangling nodes send nothing
        # via edges — their whole mass is redistributed uniformly.  The
        # dangling total stays a LAZY 1-row aggregate broadcast into the
        # update (no per-round driver action, which would re-execute the
        # whole lineage once per round just to fetch a scalar).
        dangling = (ranks.filter(F.col("out_deg") == 0)
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dmass")))
        contrib = (
            e_iter.join(_hint(ranks.filter(F.col("out_deg") > 0)),
                        F.col("src") == F.col("nodeId"))
            .select(F.col("dst").alias("nodeId"),
                    (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("nodeId").agg(F.sum("c").alias("in_mass")))
        ranks = (
            base.join(contrib, "nodeId", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "nodeId", "out_deg",
                (F.lit(teleport)
                 + F.lit(alpha) * (F.coalesce("in_mass", F.lit(0.0))
                                   + F.col("dmass") / total))
                .alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            # EAGER, deliberately: a lazy checkpoint here materializes
            # inside the next round's dangling-BROADCAST build (that
            # aggregate is the first consumer), and the interleaved A/B
            # read it 1.06-1.13x SLOWER than the dedicated eager job —
            # the count-fused lazy form only wins where an explicit
            # action (count) is the materializer (betweenness/bfs/kcore)
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("nodeId", "rank").localCheckpoint(eager=True)
    base.unpersist()
    if e_iter is not e:
        e_iter.unpersist()
    e.unpersist()
    return out


def personalized_pagerank(nodes: DataFrame, edges: DataFrame,
                          seeds: DataFrame, alpha: float = 0.85,
                          n_iter: int = 20) -> DataFrame:
    """Personalized PageRank: teleport returns to the SEED set instead
    of everywhere, so rank mass concentrates in the seeds' neighborhood
    — the standard graph-proximity score for retrieval (rank candidate
    nodes by PPR from the question's anchor entities).

    ``seeds``: (nodeId) frame; teleport mass splits uniformly across
    it, and dangling mass returns to the seeds as well (the usual PPR
    convention — all non-edge mass restarts at the personalization
    vector).  Same per-round plan and localCheckpoint guard as
    :func:`pagerank`.
    """
    n_nodes = nodes.select("nodeId").distinct()
    # same cached-edge-first layout as pagerank(): e partitioned+sorted
    # by the per-round join key, out_deg derived from the cache
    e = _keyed_cache(edges.select("src", "dst"), "src")
    ecount = e.count()
    out_deg = (e.groupBy(F.col("src").alias("nodeId"))
               .agg(F.count("*").alias("out_deg")))
    seed = seeds.select("nodeId").distinct() \
        .withColumn("is_seed", F.lit(True))
    base = _keyed_cache(
        n_nodes.join(out_deg, "nodeId", "left")
        .join(F.broadcast(seed), "nodeId", "left")
        .select("nodeId",
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                F.coalesce("is_seed", F.lit(False)).alias("is_seed")),
        "nodeId")
    n_seeds = base.filter("is_seed").count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs at least one seed "
                         "present in the node set")
    total = base.count()
    # same per-round shape gate as pagerank(); ranks here carries 4 cols
    if (ecount >= AGGKEY_SWAP_MIN_EDGES
            and _fits_broadcast(total, 4, nodes.sparkSession)):
        e_iter = _keyed_cache(e, "dst")
        e_iter.count()
        _hint = F.broadcast
    else:
        e_iter, _hint = e, (lambda df: df)

    # start all mass on the seeds (the PPR stationary measure support)
    ranks = base.select(
        "nodeId", "out_deg", "is_seed",
        F.when(F.col("is_seed"), F.lit(1.0 / n_seeds)).otherwise(0.0)
        .alias("rank"))
    for i in range(n_iter):
        dangling = (ranks.filter(F.col("out_deg") == 0)
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dmass")))
        contrib = (
            e_iter.join(_hint(ranks.filter(F.col("out_deg") > 0)),
                        F.col("src") == F.col("nodeId"))
            .select(F.col("dst").alias("nodeId"),
                    (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("nodeId").agg(F.sum("c").alias("in_mass")))
        ranks = (
            base.join(contrib, "nodeId", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "nodeId", "out_deg", "is_seed",
                (F.when(F.col("is_seed"),
                        F.lit((1.0 - alpha) / n_seeds)
                        + F.lit(alpha) * F.col("dmass") / n_seeds)
                 .otherwise(0.0)
                 + F.lit(alpha) * F.coalesce("in_mass", F.lit(0.0)))
                .alias("rank")))
        # eager per-round — same measured rationale as pagerank()
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("nodeId", "rank").localCheckpoint(eager=True)
    base.unpersist()
    if e_iter is not e:
        e_iter.unpersist()
    e.unpersist()
    return out


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Exact per-node triangle counts by degree-ordered orientation
    (the node-iterator of Suri & Vassilvitskii 2011, "Counting
    Triangles and the Curse of the Last Reducer").

    Orient each undirected edge from its lower-(degree, id) endpoint to
    the higher; every triangle then has exactly one apex whose two
    out-edges cover it, so counting = enumerate out-neighbor pairs per
    apex and close them against the edge set.  The orientation bounds
    every out-degree by O(sqrt(|E|)), so wedge enumeration is
    O(|E|^1.5) worst-case TOTAL and no single hub dominates a reducer —
    THE fix for the last-reducer skew a naive neighbor join hits at
    100 TB.  Input may carry both directions and self-loops; both are
    canonicalized away.  Returns (n, triangles): per-node participation
    (sum/3 = total triangles)."""
    return _triangle_parts(edges, src_col, dst_col)[2]


def _triangle_parts(edges: DataFrame, src_col: str,
                    dst_col: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(canonical edges, degrees, per-node triangle counts), the shared
    building blocks of :func:`triangle_count` and
    :func:`clustering_coefficient`.  The canonical edge set, the degree
    table, and the oriented edge list are each LAZILY localCheckpoint'd:
    every one is consumed by 2+ downstream branches, and Catalyst plans
    duplicated subtrees independently — without the checkpoints the
    dedup-DISTINCT over the raw edge list is recomputed ~5× and the
    orientation join 2× (measured 30+ relation references in the
    optimized plan; with them, every input is computed exactly once)."""
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .distinct()
         .localCheckpoint(eager=False))
    deg = (e.select(F.col("a").alias("n"))
           .unionByName(e.select(F.col("b").alias("n")))
           .groupBy("n").agg(F.count("*").alias("deg"))
           .localCheckpoint(eager=False))
    oa = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    ob = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) \
        | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    oriented = (e.join(oa, "a").join(ob, "b")
                .select(F.when(a_first, F.col("a")).otherwise(F.col("b"))
                        .alias("apex"),
                        F.when(a_first, F.col("b")).otherwise(F.col("a"))
                        .alias("nb"))
                .localCheckpoint(eager=False))
    o1 = oriented.select("apex", F.col("nb").alias("p"))
    o2 = oriented.select("apex", F.col("nb").alias("q"))
    wedges = (o1.join(o2, "apex")
              .filter(F.col("p") < F.col("q")))  # id-ordered pair, once
    tri = wedges.join(
        e, (F.col("p") == F.col("a")) & (F.col("q") == F.col("b")))
    per_node = (tri.select(F.col("apex").alias("n"))
                .unionByName(tri.select(F.col("p").alias("n")))
                .unionByName(tri.select(F.col("q").alias("n")))
                .groupBy("n").agg(F.count("*").alias("triangles")))
    return e, deg, per_node


def clustering_coefficient(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst") -> DataFrame:
    """Local clustering coefficient per node: triangles / C(deg, 2)
    over the simple undirected graph (0.0 for degree < 2) — the
    standard cohesion signal on top of :func:`triangle_count`, same
    skew-bounded plan plus one degree aggregate and a left join
    (sharing the canonical-edge/degree checkpoints with the triangle
    pass instead of rebuilding them)."""
    deg, tri = _triangle_parts(edges, src_col, dst_col)[1:]
    pairs = (F.col("deg") * (F.col("deg") - 1) / 2.0)
    return (deg.join(tri, "n", "left")
            .select("n", "deg",
                    F.when(F.col("deg") >= 2,
                           F.coalesce("triangles", F.lit(0)) / pairs)
                    .otherwise(F.lit(0.0)).alias("lcc")))


def adamic_adar(edges: DataFrame, src_col: str = "src",
                dst_col: str = "dst",
                max_mid_degree: int | None = None) -> DataFrame:
    """Adamic-Adar link-prediction scores for unconnected node pairs:
    AA(x, y) = sum over common neighbors z of 1 / ln(deg(z)).

    Wedge enumeration through a hub z costs C(deg(z), 2) pairs — the
    100 TB mitigation is ``max_mid_degree``: skip mids above the cap
    (standard practice; a super-hub contributes ~1/ln(huge) ≈ 0 per
    pair while generating quadratic work, so the cap trades negligible
    score mass for bounded skew).  None = exact.  Already-connected
    pairs are anti-joined away (the score predicts NEW links).
    Returns (x, y, aa) with x < y.

    The canonical edge set and the degree-carrying neighbor list are
    lazily localCheckpoint'd — each feeds 2-3 downstream branches that
    Catalyst would otherwise re-plan from the raw edge scan (same
    shared-subtree discipline as :func:`_triangle_parts`)."""
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .distinct()
         .localCheckpoint(eager=False))
    nb = (e.select(F.col("a").alias("z"), F.col("b").alias("x"))
          .unionByName(e.select(F.col("b").alias("z"),
                                F.col("a").alias("x"))))
    deg = nb.groupBy("z").agg(F.count("*").alias("deg"))
    mids = deg if max_mid_degree is None else \
        deg.filter(F.col("deg") <= max_mid_degree)
    nbd = nb.join(mids, "z").localCheckpoint(eager=False)
    n1 = nbd.select("z", "deg", F.col("x").alias("x"))
    n2 = nbd.select("z", F.col("x").alias("y"))
    wedges = (n1.join(n2, "z")
              .filter(F.col("x") < F.col("y")))
    scores = (wedges
              .groupBy("x", "y")
              .agg(F.sum(F.lit(1.0) / F.log("deg")).alias("aa")))
    return scores.join(
        e, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "left_anti")


def k_core(edges: DataFrame, k: int, max_iter: int = 50,
           src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Nodes of the k-core: iteratively peel nodes of degree < k from
    the simple undirected graph until stable.  Each round is one
    degree aggregate + two semi-joins over the shrinking edge frame,
    localCheckpointed (same per-round materialization discipline as
    PageRank / connected components).  Rounds are bounded by the
    peeling depth — small on real graphs; a path graph degenerates to
    O(n), so ``max_iter`` raises instead of silently looping.
    Returns (n, deg): surviving nodes with their in-core degree."""
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .distinct()
         .localCheckpoint(eager=True))
    for _ in range(max_iter):
        deg = (e.select(F.col("a").alias("n"))
               .unionByName(e.select(F.col("b").alias("n")))
               .groupBy("n").agg(F.count("*").alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select("n")
        # lazy checkpoint: the count() below materializes it (one job)
        e2 = (e.join(keep.withColumnRenamed("n", "a"), "a", "semi")
              .join(keep.withColumnRenamed("n", "b"), "b", "semi")
              .select("a", "b")
              .localCheckpoint(eager=False))
        if e2.count() == e.count():
            e = e2
            break
        e = e2
    else:
        raise RuntimeError(f"k_core did not stabilize in {max_iter} "
                           "rounds; raise max_iter")
    return (e.select(F.col("a").alias("n"))
            .unionByName(e.select(F.col("b").alias("n")))
            .groupBy("n").agg(F.count("*").alias("deg")))


def label_propagation(nodes: DataFrame, edges: DataFrame,
                      rounds: int = 3,
                      checkpoint_every: int = 1) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) community
    detection, made DETERMINISTIC: labels init to nodeId; each round
    every node adopts the MOST FREQUENT label among its neighbors AND
    itself (the self-vote breaks the 2-cycle oscillation synchronous
    LPA exhibits on bipartite-ish structure — a lone edge never
    settles without it), ties broken by the smaller label.  Fixed
    ``rounds`` (no convergence test) keeps the result engine-portable
    and SQL-replayable — the classic async LPA is order-dependent and
    unreproducible, which is useless for a graded pipeline.

    Per round: one join (labels ⋈ undirected edges on dst) + one
    (node, label) count + one per-node argmax — all key-partitioned
    shuffles, no quadratic work.  Labels are |V| two-column rows,
    checkpointed per round like pagerank (referenced once per round,
    but lineage still compounds across rounds).

    ``edges`` is a DIRECTED frame; both binding directions are derived
    here so callers pass ``graph.edges`` directly."""
    # cache the union-edge frame partitioned+sorted by a per-round key
    # (guide §2.4) — it was re-derived AND re-shuffled every round; the
    # node id frame likewise feeds one join per round.  WHICH key
    # depends on whether the |V|-row label frame broadcasts: if yes,
    # the join needs no partitioning at all, so keying by the
    # AGGREGATION side (src) makes both per-round groupBys
    # (src,label → src) ride the cached partitioning exchange-free and
    # leaves `best` co-partitioned with `ids` for the final join; if
    # not (the 100 TB shape), key by the JOIN side (dst) so the edge
    # frame never re-exchanges under the label shuffle.
    ids = _keyed_cache(nodes.select("nodeId"), "nodeId")
    nv = ids.count()
    swap = _fits_broadcast(nv, 2, nodes.sparkSession)
    _hint = F.broadcast if swap else (lambda df: df)
    und = _keyed_cache(
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .unionAll(nodes.select(F.col("nodeId").alias("src"),
                               F.col("nodeId").alias("dst"))),
        "src" if swap else "dst")
    und.count()
    labels = nodes.select("nodeId", F.col("nodeId").alias("label"))
    for r in range(rounds):
        nbr = (und.join(_hint(labels.select(F.col("nodeId").alias("dst"),
                                            "label")), "dst")
               .groupBy(F.col("src").alias("nodeId"), "label")
               .agg(F.count("*").alias("c")))
        best = (nbr.groupBy("nodeId")
                .agg(F.max(F.struct(F.col("c"),
                                    (-F.col("label")).alias("nl")))
                     .alias("b"))
                .select("nodeId", (-F.col("b.nl")).alias("label")))
        labels = (ids
                  .join(best, "nodeId", "left")
                  .select("nodeId",
                          F.coalesce(F.col("label"), F.col("nodeId"))
                          .alias("label")))
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            # eager: the next round's first consumer would be a
            # broadcast build of the small label frame — the same shape
            # the pagerank A/B measured slower under a lazy checkpoint
            labels = labels.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    und.unpersist()
    ids.unpersist()
    return labels


def hits(nodes: DataFrame, edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the directed graph
    (nodes: nodeId; edges: src, dst).  Returns (nodeId, hub, authority),
    each vector L1-normalized per iteration (sum = 1) so scores are
    engine-portable fractions — an unrolled-SQL oracle reproduces them
    exactly at small n_iter.

    Per round: authority ← Σ hub over in-edges, hub ← Σ authority over
    out-edges — two keyed join+aggregate shuffles over the edge list.
    Frames stay SPARSE (only nodes with a nonzero score; absent = 0,
    which contributes nothing to sums or totals) so the per-round work
    is proportional to the edge list, not |V| extra left-joins; zero
    rows join back once at the end.  Each half-step is eagerly
    lineage-truncated BEFORE the normalization total branches off it —
    the score frame is consumed twice per half-step (value path +
    total), and un-truncated double-branching re-executes the whole
    prefix, doubling work per half-step (measured 4x on the bench
    line).  The totals remain executor-side 1-row broadcast aggregates
    over the truncated frame, never a driver collect.

    Edges are semi-joined against ``nodes`` on BOTH endpoints up front:
    the sparse frames would otherwise carry mass for phantom endpoints
    (edges referencing ids absent from ``nodes``) through every
    normalization total and only drop them at the final join — a silent
    numeric divergence from the dense formulation, which re-anchored on
    node membership each half-step."""
    if n_iter < 1:
        raise ValueError(f"hits() requires n_iter >= 1, got {n_iter}")
    n_nodes = nodes.select("nodeId").distinct().persist()
    e0 = (edges.select("src", "dst")
          .join(n_nodes.select(F.col("nodeId").alias("src")),
                "src", "left_semi")
          .join(n_nodes.select(F.col("nodeId").alias("dst")),
                "dst", "left_semi")
          .select("src", "dst"))
    # the half-steps alternate join/aggregation keys (authority: join on
    # src, aggregate by dst; hub: join on dst, aggregate by src) — keep
    # one partitioned+sorted cached copy PER KEY so no round ever
    # re-exchanges or re-sorts the edge list (guide §2.4; the module
    # docstring's bucketed-deployment note, applied in-session)
    e_src = _keyed_cache(e0, "src")
    e_src.count()
    e_dst = _keyed_cache(e_src, "dst")
    e_dst.count()
    # Which cache each half-step reads depends on whether the score
    # frame broadcasts (guide §2.4/§3.1): if yes, the join key needs no
    # partitioning, so read the cache keyed by the half-step's
    # AGGREGATION key and the groupBy rides it exchange-free (a_raw:
    # join src / agg dst → e_dst; h_raw: join dst / agg src → e_src);
    # if not (the 100 TB shape), read the cache keyed by the JOIN key
    # so the edge side never re-exchanges under the score shuffle.
    nv = n_nodes.count()
    swap = _fits_broadcast(nv, 2, nodes.sparkSession)
    _hint = F.broadcast if swap else (lambda df: df)
    e_for_a = e_dst if swap else e_src
    e_for_h = e_src if swap else e_dst

    def _normalize(raw: DataFrame, raw_col: str, out_col: str) -> DataFrame:
        # zero-guard: an edgeless graph (or all-zero round) has t=0;
        # dividing would yield NULL and poison every later round
        if swap:
            # BROADCAST-SIZED score frames (the swap gate already
            # asserts |V| fits a broadcast): attach the L1 total with a
            # single-partition window ON TOP of the half-step aggregate
            # — one linear pipeline, so the half-step frame has exactly
            # ONE consumer (the next half-step's broadcast join) and
            # needs NO materialization.  The whole n_iter-round
            # iteration then runs as one job whose per-half-step
            # broadcast exchanges are each built once (identical
            # BroadcastExchange subtrees dedupe via ReusedExchange) —
            # dropping the 2·n_iter eager-checkpoint jobs plus their
            # per-half-step total-broadcast builds.  The 1-partition
            # window over |V| rows is safe exactly where the broadcast
            # of those same rows is; the unguarded-scale path below
            # keeps the checkpoint+broadcast-total shape.
            from pyspark.sql import Window
            t = F.sum(raw_col).over(Window.partitionBy())
            return raw.select("nodeId",
                              F.when(t != 0, F.col(raw_col) / t)
                              .otherwise(F.lit(0.0)).alias(out_col))
        tot = raw.agg(F.sum(raw_col).alias("t"))
        return (raw.crossJoin(F.broadcast(tot))
                .select("nodeId",
                        F.when(F.col("t") != 0,
                               F.col(raw_col) / F.col("t"))
                        .otherwise(F.lit(0.0)).alias(out_col)))

    auth = hub = None
    for i in range(n_iter):
        if i == 0:
            # hub⁰ = 1.0 everywhere ⇒ first a_raw is just the in-degree
            # (e_dst: the aggregation key matches the cached
            # partitioning, so even this groupBy is exchange-free)
            a_raw = (e_dst.groupBy(F.col("dst").alias("nodeId"))
                     .agg(F.count("*").cast("double").alias("a_raw")))
        else:
            a_raw = (e_for_a.join(
                _hint(hub.select(F.col("nodeId").alias("src"), "hub")),
                "src")
                .groupBy(F.col("dst").alias("nodeId"))
                .agg(F.sum("hub").alias("a_raw")))
        if not swap:
            # eager, deliberately: on this path the first consumer of
            # each half-step is the normalization total's 1-row
            # BROADCAST aggregate, and the pagerank A/B measured the
            # lazy-materialize-inside-broadcast shape consistently
            # slower than the dedicated eager job
            a_raw = a_raw.localCheckpoint(eager=True)
        auth = _normalize(a_raw, "a_raw", "authority")
        h_raw = (e_for_h.join(
            _hint(auth.select(F.col("nodeId").alias("dst"), "authority")),
            "dst")
            .groupBy(F.col("src").alias("nodeId"))
            .agg(F.sum("authority").alias("h_raw")))
        if not swap:
            h_raw = h_raw.localCheckpoint(eager=True)
        hub = _normalize(h_raw, "h_raw", "hub")
    out = (n_nodes.join(auth, "nodeId", "left")
           .join(hub, "nodeId", "left")
           .select("nodeId",
                   F.round(F.coalesce("hub", F.lit(0.0)), 9).alias("hub"),
                   F.round(F.coalesce("authority", F.lit(0.0)), 9)
                   .alias("authority"))
           .localCheckpoint(eager=True))
    # materialize the result, then release the persisted frames (a
    # long session would otherwise accumulate cached frames per call)
    e_src.unpersist()
    e_dst.unpersist()
    n_nodes.unpersist()
    return out


def bipartite_project(edges: DataFrame, left: str = "src",
                      right: str = "dst", min_count: int = 1,
                      max_degree: int | None = None) -> DataFrame:
    """Project a bipartite edge list onto its ``left`` side: weighted
    co-occurrence pairs (a, b, weight) where weight = number of shared
    ``right`` neighbors — the market-basket / co-citation / co-view
    graph builder (items co-ordered, papers co-cited, docs sharing
    terms).

    Scale shape: dedup membership, then a self-join keyed on the
    ``right`` node — per-neighbor work is C(deg, 2), so hub neighbors
    are the quadratic axis (a 'the' term, a mega-order).  ``max_degree``
    drops right-nodes above the cap BEFORE the join (one aggregate +
    semi-join), the same star-cap recall trade the LSH bucket cap
    documents: hubs contribute the least co-occurrence signal per pair
    and all of the blowup.  Pairs are emitted once (a < b); map-side
    combine applies to the final count.

    The membership dedup rides the SAME r-keyed exchange the self-join
    needs (guide §2.4 — two operations keyed compatibly share one
    exchange): hash-partitioning on ``r`` co-locates every (l, r) pair,
    so dropDuplicates needs no second shuffle, both self-join sides
    reuse the one exchange, and the degree cap's aggregate + semi-join
    are co-partitioned too.  The old distinct-then-join shape paid a
    full (l, r) exchange AND an r exchange back-to-back (measured
    ~0.6× on the co-purchase line; rows identical).

    TRADE (r13 advice): the shared exchange ships RAW (pre-dedup) rows
    with no map-side partial aggregation, and keying on ``r`` alone
    disables AQE skew splitting for the dedup — a hub right-node or a
    heavily-duplicated input concentrates dedup work on one partition.
    On such inputs fall back to distinct-then-join (map-side combine
    compresses the duplication before the exchange) or salt the dedup
    key; ``max_degree`` already bounds the hub's JOIN cost either way."""
    n_part = int(edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    m = (edges.select(F.col(left).alias("l"), F.col(right).alias("r"))
         .repartition(n_part, F.col("r"))
         .dropDuplicates(["l", "r"]))
    if max_degree is not None:
        ok = (m.groupBy("r").agg(F.count("*").alias("d"))
              .filter(F.col("d") <= max_degree).select("r"))
        m = m.join(ok, "r", "left_semi")
    a, b = m.alias("a"), m.alias("b")
    return (a.join(b, (F.col("a.r") == F.col("b.r"))
                   & (F.col("a.l") < F.col("b.l")))
            .groupBy(F.col("a.l").alias("a"), F.col("b.l").alias("b"))
            .agg(F.count("*").alias("weight"))
            .filter(F.col("weight") >= min_count))


def strongly_connected_components(nodes: DataFrame, edges: DataFrame,
                                  max_peel: int = 25,
                                  max_prop: int = 40) -> DataFrame:
    """Strongly connected components of a directed graph (nodes: id;
    edges: src, dst) — the coloring algorithm (Orzan 2004 / FB-Trim):

    per peel round, (1) TRIM nodes with no in- or no out-edge among the
    remaining graph (singleton SCCs, removed to fixpoint — kills DAG
    tails without touching the expensive phases), (2) COLOR: propagate
    min id along FORWARD edges to fixpoint, so color(v) = min id that
    reaches v and every SCC is monochrome, (3) for every color ROOT
    (color(v) == v), collect the BACKWARD-reachable set within its own
    color class — exactly the root's SCC — emit and remove.  All color
    classes peel in parallel, so rounds ≈ O(#SCCs on the longest
    inter-SCC chain), not O(#SCCs).

    Every phase is join+aggregate over the edge list (pagerank plan
    shape); frontier/label frames are localCheckpoint-truncated like
    :func:`graphraft_spark.ops.dedup.connected_components` and the
    edge list is re-checkpointed per peel so later rounds scan the
    SHRUNKEN graph.  Ids need only be orderable (strings work).
    Returns (id, scc, scc_size) with scc = min member id."""
    base = nodes.select(F.col("id")).distinct()
    remaining = base.localCheckpoint(eager=True)
    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst")).distinct()
         .localCheckpoint(eager=True))
    done_parts = []

    def _finish():
        done = remaining.limit(0).withColumn("scc", F.col("id"))
        for p in done_parts:
            done = done.unionByName(p)
        sizes = done.groupBy("scc").agg(F.count("*").alias("scc_size"))
        return done.join(sizes, "scc").select("id", "scc", "scc_size")

    for _ in range(max_peel):
        # --- trim to fixpoint: no in-edge or no out-edge => own SCC
        while True:
            srcs = e.select(F.col("src").alias("id")).distinct()
            dsts = e.select(F.col("dst").alias("id")).distinct()
            core = srcs.join(dsts, "id", "left_semi") \
                .localCheckpoint(eager=True)
            # lazy + count fusion (same as connected_components): the
            # count materializes and truncates in one job
            trimmed = remaining.join(core, "id", "left_anti") \
                .localCheckpoint(eager=False)
            if trimmed.count() == 0:
                break
            done_parts.append(trimmed.withColumn("scc", F.col("id")))
            remaining = core
            e = (e.join(remaining.withColumnRenamed("id", "src"), "src",
                        "left_semi")
                 .join(remaining.withColumnRenamed("id", "dst"), "dst",
                       "left_semi")
                 .select("src", "dst").localCheckpoint(eager=True))
        if remaining.count() == 0:
            return _finish()
        # --- color: min-id forward propagation to fixpoint
        colors = remaining.withColumn("color", F.col("id")) \
            .localCheckpoint(eager=True)
        for _ in range(max_prop):
            nbr = (e.join(colors.withColumnRenamed("id", "src")
                          .withColumnRenamed("color", "c_src"), "src")
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.min("c_src").alias("c_in")))
            new = (colors.withColumnRenamed("color", "old")
                   .join(nbr, "id", "left")
                   .select("id", F.least(
                       "old", F.coalesce("c_in", "old")).alias("color"),
                       "old").localCheckpoint(eager=False))
            changed = new.filter(F.col("color") != F.col("old")).count()
            colors = new.drop("old")
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc color propagation did not converge in {max_prop} "
                "rounds — raise max_prop")
        # --- backward reach from each color root within its color
        reached = colors.filter(F.col("color") == F.col("id")) \
            .localCheckpoint(eager=True)
        frontier = reached
        while True:
            # predecessors of the frontier that share the same color
            pred = (e.join(frontier.withColumnRenamed("id", "dst"), "dst")
                    .select(F.col("src").alias("id"), "color")
                    .distinct())
            pred = (pred.join(colors.withColumnRenamed("color", "c_own"),
                              "id")
                    .filter(F.col("color") == F.col("c_own"))
                    .select("id", "color"))
            frontier = pred.join(reached, "id", "left_anti") \
                .localCheckpoint(eager=False)
            if frontier.count() == 0:
                break
            reached = reached.unionByName(frontier) \
                .localCheckpoint(eager=True)
        done_parts.append(reached.select(
            "id", F.col("color").alias("scc")))
        remaining = remaining.join(reached, "id", "left_anti") \
            .localCheckpoint(eager=False)
        if remaining.count() == 0:
            return _finish()
        e = (e.join(remaining.withColumnRenamed("id", "src"), "src",
                    "left_semi")
             .join(remaining.withColumnRenamed("id", "dst"), "dst",
                   "left_semi")
             .select("src", "dst").localCheckpoint(eager=True))
    raise RuntimeError(
        f"scc did not finish in {max_peel} peel rounds — raise max_peel")


def betweenness_sampled(nodes: DataFrame, edges: DataFrame,
                        sources: list | None = None,
                        n_sources: int = 8,
                        max_depth: int = 20,
                        settled_filter: str = "exact",
                        bloom_bits: int = 1 << 22,
                        bloom_k: int = 4,
                        auto_switch_at: int = 10_000_000) -> DataFrame:
    """Betweenness centrality (Brandes 2001), exact over a SOURCE
    SAMPLE: run the forward BFS/σ-counting and backward dependency
    accumulation for ``sources`` (default: the ``n_sources`` smallest
    node ids — deterministic; pass a random sample for the Riondato-
    Kornaropoulos estimator) and sum δ over sources.  With sources =
    all nodes this IS exact directed betweenness; sampling scales the
    same plans to big graphs at bounded cost.

    All phases are frames keyed (source, node), so every sampled
    source advances in the SAME join — per level: frontier ⨝ edges →
    sum σ by (source, dst) (forward), and level-(d+1) deltas ⨝
    reversed edges ⨝ σ (backward).  Rounds = 2 × eccentricity bound;
    frames localCheckpoint-truncated per level like the other
    iterative algorithms here.  Returns (nodeId, betweenness) over all
    nodes (zeros included), deltas summed over the sample — divide by
    len(sources)/|V| externally to estimate the full sum.

    ``settled_filter`` routes the forward phase's already-settled
    check exactly as in :func:`bfs_distances` (exact anti-join /
    bloom map-side probe / auto switch at ``auto_switch_at`` settled
    pairs) — σ rides through the router untouched, so every path is
    value-identical; the flag-equality test pins it."""
    ids = nodes.select(F.col("nodeId")).distinct().persist()
    # forward levels join on e.src, backward dependency rounds on e.dst:
    # one partitioned+sorted cached copy per key (guide §2.4) so the
    # per-level joins stream the edge list exchange- and sort-free.
    # The dedup rides the SAME exchange as the src-keyed layout:
    # hash-partitioning on src co-locates every (src, dst) pair, so the
    # dropDuplicates aggregate needs no second shuffle (guide §2.4 —
    # two operations keyed compatibly share one exchange; the old
    # distinct-then-repartition shape paid an extra full exchange).
    n_part = int(edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    # The dst-keyed copy is the one EVERY phase reads (forward levels
    # under the broadcast gate join it so the (source, dst) aggregation
    # rides hash(dst); every backward round joins it on dst), so the
    # dedup rides ITS exchange and it is built first, straight from the
    # raw edges.  The src-keyed copy is only consumed by forward levels
    # whose frontier does NOT fit a broadcast — build it lazily from
    # the deduped cache on first such level (guide §1.2: at bench scale
    # every level broadcasts and the src-keyed exchange+persist+count
    # was a dead setup job; the 100 TB wide-middle-level path builds it
    # once on demand, from |E| already-deduped cached rows).
    e_rev = (edges.select("src", "dst")
             .filter(F.col("src") != F.col("dst"))
             .repartition(n_part, F.col("dst"))
             .dropDuplicates(["src", "dst"])
             .sortWithinPartitions("dst")
             .persist())
    e_rev.count()
    e = None

    def _e_src() -> DataFrame:
        nonlocal e
        if e is None:
            e = _keyed_cache(e_rev, "src")
            e.count()
        return e
    if sources is None:
        sources = [r.nodeId for r in
                   ids.orderBy("nodeId").limit(n_sources).collect()]
    spark = nodes.sparkSession
    id_type = ids.schema["nodeId"].dataType.simpleString()
    src_df = spark.createDataFrame([(s,) for s in sources],
                                   f"s {id_type}")
    # settled(source, node, dist, sigma); frontier = the current level
    frontier = src_df.select(F.col("s").alias("source"),
                             F.col("s").alias("node"),
                             F.lit(0).alias("dist"),
                             F.lit(1.0).alias("sigma")) \
        .localCheckpoint(eager=True)
    levels = [frontier]
    frontier_rows = len(sources)
    from functools import reduce

    router = _SettledRouter(settled_filter, bloom_bits, bloom_k,
                            auto_switch_at, frontier)
    # settled is a LAZY union of the checkpointed levels (same
    # rationale as bfs_distances: per-level settled rewrites cost
    # O(levels x |settled|) materialization traffic).  Grown
    # INCREMENTALLY — re-reducing the whole union each level costs
    # O(levels²) DataFrame calls, and on a slow-py4j driver (measured
    # ~1.1 ms/round-trip, ~14 ms/DataFrame op on this host) that
    # driver-side chatter was a visible slice of the line.
    settled_v = frontier.select("source", "node")
    for d in range(1, max_depth + 1):
        router.maybe_switch(levels)
        # Per-LEVEL shape gate (guide §2.4/§3.1): the frontier's exact
        # row count is already known from the previous termination
        # probe.  When it fits a broadcast, join against the DST-keyed
        # cache so the (source, dst) aggregation rides hash(dst)
        # exchange-free (hash on a subset of the grouping keys still
        # co-locates every group); when it does not (wide middle levels
        # or the 100 TB shape), the src-keyed cache keeps the edge side
        # exchange-free under the frontier shuffle.  σ sums are exact
        # small integers in doubles, so accumulation order is free.
        if _fits_broadcast(frontier_rows, 4, spark):
            cand = (F.broadcast(frontier)
                    .join(e_rev, frontier.node == e_rev.src)
                    .groupBy("source", F.col("dst").alias("node"))
                    .agg(F.sum("sigma").alias("sigma")))
        else:
            e_src = _e_src()
            cand = (frontier.join(e_src, frontier.node == e_src.src)
                    .groupBy("source", F.col("dst").alias("node"))
                    .agg(F.sum("sigma").alias("sigma")))
        # LAZY checkpoint + count: the count() is the materializing
        # action, so plan-truncation and the termination probe share ONE
        # job instead of paying a dedicated eager-checkpoint job per
        # level (guide §1.2 — fewer passes; on a steal-prone host every
        # extra job is another chance to eat a multi-second stall)
        nxt = (router.filter_new(cand, settled_v)
               .withColumn("dist", F.lit(d))
               .select("source", "node", "dist", "sigma")
               .localCheckpoint(eager=False))
        n_new = nxt.count()
        if n_new == 0:
            break
        router.observe(nxt, n_new)
        frontier = nxt
        frontier_rows = n_new
        levels.append(nxt)
        settled_v = settled_v.unionByName(nxt.select("source", "node"))
    else:
        raise RuntimeError(
            f"betweenness BFS exceeded max_depth={max_depth}")
    # backward: per-LEVEL delta frames, deepest→1.  In the unweighted
    # shortest-path DAG every edge crosses exactly one level, so a
    # node's delta is FINAL as soon as the level below it is processed
    # — delta(v) = Σ sigma_v/sigma_w · (1 + delta_w) over DAG edges
    # v→w with w one level down.  Carrying one frame per level keeps
    # each round's join + checkpoint at that level's size; a global
    # (source × settled) delta frame rewritten per round would cost
    # O(levels × settled) materialization traffic — the super-linear
    # term measured in the BFS settled-rewrite soak (BASELINE.md r9).
    # Backward deltas are LAZY checkpoints: each call still compiles and
    # truncates the plan (downstream rounds see a LogicalRDD leaf, so
    # plan size stays per-round), but materialization cascades into the
    # final eager checkpoint — one job DAG for the whole backward phase
    # instead of one driver-scheduled job per level.  Every delta frame
    # is cached on first compute (localCheckpoint persists), so the two
    # consumers (next round's join + the final union) still compute it
    # exactly once.
    # Each delta frame CARRIES its level's sigma, so the next round
    # reads (sigma_w, delta_w) from ONE frame instead of re-joining
    # levels[d] ⨝ deltas[d] on (source, node) — one fewer join (and its
    # exchanges) per round (guide §1.2).  sigma is a carried column,
    # never recomputed, so the dependency arithmetic and its float
    # evaluation order are untouched.
    deltas: list[DataFrame] = [None] * len(levels)
    deltas[-1] = (levels[-1].select("source", "node", "sigma",
                                    F.lit(0.0).alias("delta"))
                  .localCheckpoint(eager=False))
    for d in range(len(levels) - 1, 0, -1):
        down = deltas[d].select("source",
                                F.col("node").alias("w"),
                                F.col("sigma").alias("sigma_w"),
                                F.col("delta").alias("delta_w"))
        contrib = (down.join(e_rev, down.w == e_rev.dst)
                   .select("source", F.col("src").alias("node"),
                           "sigma_w", "delta_w"))
        contrib = (contrib.join(
            levels[d - 1].select("source", "node", "sigma"),
            ["source", "node"])
            .groupBy("source", "node")
            .agg(F.sum(F.col("sigma") / F.col("sigma_w")
                       * (F.lit(1.0) + F.col("delta_w")))
                 .alias("add")))
        deltas[d - 1] = (levels[d - 1].select("source", "node", "sigma")
                         .join(contrib, ["source", "node"], "left")
                         .select("source", "node", "sigma",
                                 F.coalesce("add", F.lit(0.0))
                                 .alias("delta"))
                         .localCheckpoint(eager=False))
    delta = reduce(lambda a, b: a.unionByName(b),
                   [dl.select("source", "node", "delta") for dl in deltas])
    acc = (delta.filter(F.col("node") != F.col("source"))
           .groupBy(F.col("node").alias("nodeId"))
           .agg(F.sum("delta").alias("betweenness")))
    out = (ids.join(acc, "nodeId", "left")
           .select("nodeId",
                   F.round(F.coalesce("betweenness", F.lit(0.0)), 9)
                   .alias("betweenness"))
           .localCheckpoint(eager=True))
    if e is not None:
        e.unpersist()
    e_rev.unpersist()
    ids.unpersist()
    return out


class _SettledRouter:
    """Settled-pair filtering shared by the level-synchronous
    traversals (:func:`bfs_distances`, :func:`betweenness_sampled`'s
    forward phase): per level, route candidate (source, node) pairs
    into definitely-new vs maybe-seen.

    * ``exact``: candidates LEFT ANTI the settled union — always
      correct, but the whole settled set is the anti-join's build side
      every level (the O(levels × settled) exchange+sort the ×50 soak
      named).
    * ``bloom``: maintain a fixed-size bloom over settled pairs; probe
      misses are DEFINITELY new (no false negatives) and skip the
      settled pass, only the maybe-seen remainder is exact-verified via
      broadcast joins that SCAN settled map-side.  The bloom only
      routes rows, never decides membership — output identical.
    * ``auto``: start exact, switch to bloom once the cumulative
      settled count (known exactly from the per-level termination
      counts) crosses ``auto_switch_at``.

    Extra candidate columns (e.g. σ in the Brandes forward phase) ride
    through every path unchanged."""

    def __init__(self, mode: str, bloom_bits: int, bloom_k: int,
                 auto_switch_at: int, first_level: DataFrame):
        if mode not in ("exact", "bloom", "auto"):
            raise ValueError(f"settled_filter must be 'exact', 'bloom' "
                             f"or 'auto', got {mode!r}")
        self.mode = mode
        self.bits, self.k = bloom_bits, bloom_k
        self.auto_at = auto_switch_at
        self.use_bloom = mode == "bloom"
        self.settled_n = first_level.count() if mode == "auto" else 0
        self.bloom = (self._build_over([first_level])
                      if self.use_bloom else None)

    @staticmethod
    def _pair_key(df: DataFrame) -> DataFrame:
        return df.select(F.concat_ws(":", F.col("source"),
                                     F.col("node")).alias("_k"))

    def _build_over(self, frames, checkpoint: bool = True) -> DataFrame:
        from functools import reduce

        from graphraft_spark.ops.sketches import bloom_build

        keys = reduce(lambda a, b: a.unionByName(b),
                      [self._pair_key(f) for f in frames])
        built = bloom_build(keys, "_k", self.bits, self.k, "xx")
        return built.localCheckpoint(eager=True) if checkpoint else built

    def _probe(self, cand: DataFrame) -> DataFrame:
        """cand.* + ``maybe`` — k MAP-SIDE broadcast joins, one per
        probe, instead of an explode+groupBy (which re-shuffles
        k×|cand| rows per level — measured SLOWER than the exact
        anti-join it was replacing on the ×50 soak).  Each join is a
        broadcast hash lookup against the ≤ bits/64-word filter; the
        candidate frame is never exchanged."""
        from graphraft_spark.ops.sketches import _bloom_pos

        key = F.concat_ws(":", F.col("source"), F.col("node"))
        out = cand
        tests = []
        for i in range(self.k):
            pos = _bloom_pos(key, F.lit(i), self.bits, "xx")
            out = (out.withColumn(f"_w{i}",
                                  (pos / 64).cast("bigint"))
                   .withColumn(f"_m{i}", F.call_function(
                       "shiftleft", F.lit(1).cast("bigint"),
                       (pos % 64).cast("int")))
                   .join(F.broadcast(
                       self.bloom.select(F.col("word").alias(f"_w{i}"),
                                         F.col("bits").alias(f"_b{i}"))),
                       f"_w{i}", "left"))
            tests.append(F.coalesce(F.col(f"_b{i}"), F.lit(0))
                         .bitwiseAND(F.col(f"_m{i}")) != 0)
        maybe_col = tests[0]
        for t in tests[1:]:
            maybe_col = maybe_col & t
        return out.select(*cand.columns, maybe_col.alias("maybe"))

    def maybe_switch(self, levels) -> None:
        """One-time auto→bloom switch: build the filter over everything
        settled so far (a single pass — maintenance is incremental per
        level from here on)."""
        if (self.mode == "auto" and not self.use_bloom
                and self.settled_n > self.auto_at):
            self.use_bloom = True
            self.bloom = self._build_over(levels)

    def filter_new(self, cand: DataFrame, settled_v: DataFrame) -> DataFrame:
        """Rows of ``cand`` whose (source, node) is NOT in settled_v,
        all other cand columns preserved."""
        if not self.use_bloom:
            return cand.join(settled_v, ["source", "node"], "left_anti")
        probed = self._probe(cand)
        # maybe-seen remainder: true revisits + bloom fp — small,
        # checkpointed once, then used twice (semi-join probe + final
        # anti), both broadcast-side
        maybe = (probed.filter(F.col("maybe")).drop("maybe")
                 .localCheckpoint(eager=True))
        seen = settled_v.join(
            F.broadcast(maybe.select("source", "node")),
            ["source", "node"], "left_semi")
        return (probed.filter(~F.col("maybe")).drop("maybe")
                .unionByName(maybe.join(F.broadcast(seen),
                                        ["source", "node"],
                                        "left_anti")))

    def observe(self, nxt: DataFrame, n_new: int) -> None:
        """Fold a newly settled level into the running state."""
        from graphraft_spark.ops.sketches import bloom_merge

        self.settled_n += n_new
        if self.use_bloom:
            # the per-level build stays lazy — only the MERGED filter
            # is checkpointed (one eager pass per level, not two)
            self.bloom = bloom_merge(
                self.bloom, self._build_over([nxt], checkpoint=False)) \
                .localCheckpoint(eager=True)


def bfs_distances(nodes: DataFrame, edges: DataFrame,
                  sources: DataFrame,
                  max_depth: int = 20,
                  settled_filter: str = "exact",
                  bloom_bits: int = 1 << 22,
                  bloom_k: int = 4,
                  auto_switch_at: int = 10_000_000) -> DataFrame:
    """Multi-source BFS shortest-path distances on the directed graph:
    for every (source, node) pair with node reachable from source,
    the hop distance — the building block under :func:`betweenness_
    sampled`'s forward phase, exposed because reachability-with-depth
    is its own workhorse (k-hop neighborhoods, influence radii,
    dependency closure depth).

    ``sources`` is a 1-column frame (``s``); ALL sources advance in
    the same level-synchronous join, so the round count is the max
    eccentricity, not sources × depth.  Frames localCheckpoint per
    level like the other iterative algorithms.  Returns (source,
    node, dist) including (s, s, 0); unreachable pairs are absent.

    ``settled_filter`` picks how each level removes already-settled
    pairs — the ×50 soak named this step's exact anti-join as the one
    super-linear term (per level, the whole settled union is the
    anti-join's build side: an O(levels × settled) exchange+sort):

    * ``"exact"`` (default): candidates LEFT ANTI settled — simple,
      always correct, fine while settled fits a per-level shuffle.
    * ``"bloom"``: maintain a fixed-size bloom filter (``bloom_bits``
      bits, ``bloom_k`` probes, xxhash — fp survivors are exact-
      verified so bit portability buys nothing) over settled pairs.
      Candidates whose probe misses are DEFINITELY new (blooms have no
      false negatives) and skip the settled pass entirely; only the
      maybe-seen remainder (true revisits + fp) is exact-checked, via
      a broadcast semi-join that SCANS settled map-side instead of
      shuffling and sorting it.  Exact same output — the bloom only
      routes rows, never decides membership.  Assumes the per-level
      maybe-seen remainder fits a broadcast (true in expansion-heavy
      graphs where most candidates are new); size ``bloom_bits`` ≥
      ~10× the expected settled-pair count for ~1% fp (the 10×-bits
      rule, ops/curation.py).
    * ``"auto"``: start exact, switch to bloom once the cumulative
      settled-pair count (known EXACTLY for free — every level is
      already counted for the termination check) crosses
      ``auto_switch_at`` — the same measured-crossover policy shape as
      ``curate_corpus(decontaminate="auto")``.  At the switch the
      filter is built once over all settled levels; output is
      identical on every path."""
    from functools import reduce

    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst")).distinct()
         .persist())
    e.count()
    frontier = sources.select(F.col("s").alias("source"),
                              F.col("s").alias("node"),
                              F.lit(0).alias("dist")) \
        .localCheckpoint(eager=True)
    # settled stays a LAZY union of the per-level checkpointed frames —
    # re-materializing the whole settled set every level costs
    # O(levels x |settled|) rewrite traffic for nothing (measured
    # super-linear on the x50 graph soak); the anti-join reads the
    # union directly, and lineage stays flat (each input is truncated)
    levels = [frontier]
    router = _SettledRouter(settled_filter, bloom_bits, bloom_k,
                            auto_switch_at, frontier)
    # grown incrementally — one unionByName per level instead of
    # re-reducing the whole union (O(levels²) DataFrame calls; see
    # betweenness_sampled)
    settled_v = frontier.select("source", "node")
    for d in range(1, max_depth + 1):
        router.maybe_switch(levels)
        cand = (frontier.join(e, frontier.node == e.src)
                .select("source", F.col("dst").alias("node"))
                .distinct())
        # lazy checkpoint + count: the count() is the materializing
        # action, so truncation and the termination probe share one job
        # (same fusion as betweenness_sampled's forward phase)
        nxt = (router.filter_new(cand, settled_v)
               .withColumn("dist", F.lit(d))
               .localCheckpoint(eager=False))
        n_new = nxt.count()
        if n_new == 0:
            break
        router.observe(nxt, n_new)
        levels.append(nxt)
        frontier = nxt
        settled_v = settled_v.unionByName(nxt.select("source", "node"))
    else:
        raise RuntimeError(f"bfs exceeded max_depth={max_depth}")
    e.unpersist()
    return reduce(lambda a, b: a.unionByName(b), levels)
