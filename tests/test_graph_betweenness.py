"""Betweenness (graph/algos.py betweenness_sampled) parity against an
independent pure-Python Brandes on handcrafted and random digraphs."""

import random
from collections import deque

from graphraft_spark.graph.algos import betweenness_sampled


def brandes(n_ids, edge_list, sources):
    adj = {v: [] for v in n_ids}
    for a, b in edge_list:
        if a != b and b not in adj[a]:
            adj[a].append(b)
    bc = {v: 0.0 for v in n_ids}
    for s in sources:
        stack = []
        pred = {v: [] for v in n_ids}
        sigma = {v: 0.0 for v in n_ids}
        dist = {v: -1 for v in n_ids}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in n_ids}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def run_both(spark, n_ids, edge_list, sources):
    nodes = spark.createDataFrame([(v,) for v in n_ids], "nodeId bigint")
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = {r.nodeId: r.betweenness
           for r in betweenness_sampled(nodes, edges,
                                        sources=sources).collect()}
    want = brandes(n_ids, edge_list, sources)
    assert set(got) == set(want)
    for v in n_ids:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    return got


def test_path_graph_middle_dominates(spark):
    n = [1, 2, 3, 4, 5]
    e = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = run_both(spark, n, e, sources=n)
    # directed path: node 3 lies on 1->{4,5}, 2->{4,5} etc.
    assert got[3] > got[2] > 0 and got[1] == 0.0


def test_diamond_split_paths(spark):
    # two equal shortest paths 1->2->4 and 1->3->4: sigma split 0.5/0.5
    n = [1, 2, 3, 4, 5]
    e = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    got = run_both(spark, n, e, sources=n)
    assert abs(got[2] - got[3]) < 1e-9
    assert got[4] > got[2]


def test_random_digraphs_match_brandes(spark):
    for seed in (3, 19):
        rng = random.Random(seed)
        n = list(range(25))
        e = [(a, b) for a in n for b in n
             if a != b and rng.random() < 0.08]
        run_both(spark, n, e, sources=[0, 5, 10, 15])


def test_default_source_sample_deterministic(spark):
    n = list(range(10))
    e = [(i, i + 1) for i in range(9)]
    nodes = spark.createDataFrame([(v,) for v in n], "nodeId bigint")
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    a = {r.nodeId: r.betweenness
         for r in betweenness_sampled(nodes, edges,
                                      n_sources=4).collect()}
    b = {r.nodeId: r.betweenness
         for r in betweenness_sampled(nodes, edges,
                                      n_sources=4).collect()}
    assert a == b == {v: brandes(n, e, [0, 1, 2, 3])[v] for v in n}


def test_betweenness_top_value_matched_at_sf0001(spark):
    """r10 verdict item 5: the top-20 registry line stays rows-only
    under driver grading (a float-rank LIMIT can tie at larger sf),
    but at sf0.001 the boundary is provably un-tied, so the full
    ordered result — ids, labels, names, scores — is value-checked
    here against the same closure-restricted walk oracle that
    hash-matches g_betweenness_fixed."""
    import duckdb

    from graphraft_spark.graph import GRAPH_ORACLE_CTE
    from graphraft_spark.registry.graph_queries import (
        _betweenness_fixed_sql,
        g_betweenness_top,
    )

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders "
              "lineitem").split():
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    scores = {int(r[0]): float(r[1]) for r in con.execute(
        f"SELECT * FROM ({_betweenness_fixed_sql(6)}) x").fetchall()}
    names = {int(r[0]): (r[1], r[2]) for r in con.execute(
        GRAPH_ORACLE_CTE + "SELECT nodeId, label, name FROM nodes"
    ).fetchall()}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    # the boundary must be un-tied beyond the 9dp oracle rounding,
    # otherwise this sf is not value-checkable and the test is wrong
    if len(ranked) > 20:
        assert ranked[19][1] - ranked[20][1] > 2e-9
    want = [(nid, names[nid][0], names[nid][1], b)
            for nid, b in ranked[:20]]

    got = [(r.nodeId, r.label, r.name, r.betweenness)
           for r in g_betweenness_top(spark, sf_dir).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert abs(g[3] - w[3]) < 1e-6, (g, w)
