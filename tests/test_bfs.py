"""bfs_distances (graph/algos.py): multi-source hop distances vs a
pure-Python BFS."""

from collections import deque

from graphraft_spark.graph.algos import bfs_distances


def test_multi_source_distances_match(spark):
    n = list(range(8))
    e = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 0), (5, 6)]
    nodes = spark.createDataFrame([(v,) for v in n], "id bigint")
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    srcs = spark.createDataFrame([(0,), (5,), (7,)], "s bigint")
    got = {(r.source, r.node): r.dist
           for r in bfs_distances(nodes, edges, srcs).collect()}

    adj = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    want = {}
    for s in (0, 5, 7):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            want[(s, v)] = d
    assert got == want
    assert (7, 7) in got and got[(7, 7)] == 0   # isolated source
    assert (5, 0) not in got                    # unreachable absent


def test_bloom_settled_filter_equals_exact(spark):
    """settled_filter="bloom" must return the exact same (source, node,
    dist) set as the default exact anti-join — the bloom only routes
    rows to the cheap definitely-new path, never decides membership.
    Graph includes back-edges and a cycle so revisited (maybe-seen)
    pairs actually exercise the exact-verify remainder; a tiny filter
    (high fp rate) forces many candidates through it too."""
    n = list(range(10))
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 3), (4, 5),
         (5, 6), (6, 4), (7, 8), (2, 1)]
    nodes = spark.createDataFrame([(v,) for v in n], "id bigint")
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    srcs = spark.createDataFrame([(0,), (7,), (9,)], "s bigint")
    exact = {(r.source, r.node, r.dist)
             for r in bfs_distances(nodes, edges, srcs).collect()}
    bloom = {(r.source, r.node, r.dist)
             for r in bfs_distances(nodes, edges, srcs,
                                    settled_filter="bloom",
                                    bloom_bits=256).collect()}
    assert bloom == exact and len(exact) >= 10


def test_bfs_rejects_unknown_settled_filter(spark):
    import pytest as _pt

    nodes = spark.createDataFrame([(1,)], "id bigint")
    edges = spark.createDataFrame([(1, 1)], "src bigint, dst bigint")
    srcs = spark.createDataFrame([(1,)], "s bigint")
    with _pt.raises(ValueError, match="settled_filter"):
        bfs_distances(nodes, edges, srcs, settled_filter="nope")


def test_auto_settled_filter_switches_and_matches(spark):
    """settled_filter="auto" with a tiny switch threshold must force
    the mid-run exact→bloom switch (filter built over all prior
    levels) and still return the exact result; with the default
    threshold it stays on the exact path — same result either way."""
    n = list(range(10))
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 3), (4, 5),
         (5, 6), (6, 4), (7, 8), (2, 1)]
    nodes = spark.createDataFrame([(v,) for v in n], "id bigint")
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    srcs = spark.createDataFrame([(0,), (7,), (9,)], "s bigint")
    exact = {(r.source, r.node, r.dist)
             for r in bfs_distances(nodes, edges, srcs).collect()}
    forced = {(r.source, r.node, r.dist)
              for r in bfs_distances(nodes, edges, srcs,
                                     settled_filter="auto",
                                     auto_switch_at=2,
                                     bloom_bits=256).collect()}
    default = {(r.source, r.node, r.dist)
               for r in bfs_distances(nodes, edges, srcs,
                                      settled_filter="auto").collect()}
    assert forced == exact and default == exact


def test_betweenness_settled_filter_paths_match(spark):
    """betweenness_sampled's forward phase routes its settled check
    through the same _SettledRouter as bfs_distances — σ must ride the
    bloom path untouched, so exact / bloom / forced-auto all return
    identical centrality values.  Cyclic graph with cross-edges so
    multiple shortest paths (σ > 1) cross the maybe-seen remainder."""
    from graphraft_spark.graph.algos import betweenness_sampled

    n = list(range(10))
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 3), (4, 5),
         (5, 6), (6, 4), (7, 8), (2, 1), (1, 3), (0, 2)]
    nodes = spark.createDataFrame([(v,) for v in n], "nodeId bigint")
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    kw = dict(sources=[0, 4, 7, 9])
    exact = {(r.nodeId, r.betweenness)
             for r in betweenness_sampled(nodes, edges, **kw).collect()}
    bloom = {(r.nodeId, r.betweenness)
             for r in betweenness_sampled(nodes, edges, **kw,
                                          settled_filter="bloom",
                                          bloom_bits=256).collect()}
    auto = {(r.nodeId, r.betweenness)
            for r in betweenness_sampled(nodes, edges, **kw,
                                         settled_filter="auto",
                                         auto_switch_at=2,
                                         bloom_bits=256).collect()}
    assert bloom == exact and auto == exact
    assert any(b > 0 for _, b in exact)
