"""sf0.001 value anchors for the remaining top-k/rows-only graph
lines (r11, same recipe as the g_betweenness_top anchor in
test_graph_betweenness.py): run the EXACT registry query on real
sf0.001 data and compare the full ordered result against an
independent dense replay — ids, labels, names, AND values — with the
top-k tie boundary asserted un-tied so the ordering check is
meaningful.  The registry lines stay rows-only by declared design at
larger sf (float-rank LIMIT can tie); these tests are their value
evidence."""

import numpy as np

from graphraft_spark.graph.tpch import tpch_graph

SF = "/root/testdata/sf0.001"


def _collect_graph(spark):
    g = tpch_graph(spark, SF)
    nodes = [(r.nodeId, r.label, r.name)
             for r in g.nodes.select("nodeId", "label", "name").collect()]
    edges = [(r.src, r.dst)
             for r in g.edges.select("src", "dst").collect()]
    uedges = [(r.src, r.dst)
              for r in g.undirected_edges.select("src", "dst").collect()]
    return g, nodes, edges, uedges


def _np_pagerank(ids, edge_list, alpha=0.85, n_iter=10, seeds=None):
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[idx[s]] += 1
    if seeds is None:
        tele = np.full(n, 1.0 / n)
    else:
        tele = np.zeros(n)
        tele[[idx[s] for s in seeds]] = 1.0 / len(seeds)
    r = tele.copy()
    for _ in range(n_iter):
        nxt = (1.0 - alpha) * tele
        nxt = nxt + alpha * r[out_deg == 0].sum() * tele
        for s, d in edge_list:
            nxt[idx[d]] += alpha * r[idx[s]] / out_deg[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in ids}


def _check_top20(got_rows, ranks, names):
    """Shared assertion: engine top-20 == replay's (-rank, nodeId)
    head, boundary un-tied beyond the 9dp rounding."""
    ranked = sorted(((v, round(r, 9)) for v, r in ranks.items()
                     if round(r, 9) > 0),
                    key=lambda kv: (-kv[1], kv[0]))
    if len(ranked) > 20:
        assert ranked[19][1] - ranked[20][1] > 2e-9, "tied boundary"
    want = ranked[:20]
    assert len(got_rows) == len(want)
    for g, (nid, rank) in zip(got_rows, want):
        assert g.nodeId == nid, (g, nid)
        assert (g.label, g.name) == names[nid]
        assert abs(g.rank - rank) < 1e-6, (g.rank, rank)


def test_pagerank_top_value_matched_at_sf0001(spark):
    from graphraft_spark.registry.graph_queries import g_pagerank_top

    _, nodes, edges, _ = _collect_graph(spark)
    names = {nid: (lab, nm) for nid, lab, nm in nodes}
    ranks = _np_pagerank([n[0] for n in nodes], edges, n_iter=10)
    _check_top20(g_pagerank_top(spark, SF).collect(), ranks, names)


def test_ppr_top_value_matched_at_sf0001(spark):
    from graphraft_spark.registry.graph_queries import ANCHORS, g_ppr_top

    _, nodes, _, uedges = _collect_graph(spark)
    names = {nid: (lab, nm) for nid, lab, nm in nodes}
    seeds = [nid for nid, _, nm in nodes if nm in ANCHORS]
    assert seeds, "anchor entities must exist at sf0.001"
    ranks = _np_pagerank([n[0] for n in nodes], uedges,
                         n_iter=10, seeds=seeds)
    _check_top20(g_ppr_top(spark, SF).collect(), ranks, names)


def test_kcore_value_matched_at_sf0001(spark):
    """g_kcore's output is integer-exact (surviving node, in-core
    degree) — the full result compares EXACTLY against an independent
    python peeling on the same sf0.001 edges, no top-k subtlety."""
    from graphraft_spark.registry.graph_queries import g_kcore

    _, _, edges, _ = _collect_graph(spark)
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < 3}
        if not drop:
            break
        es = {(a, b) for a, b in es
              if a not in drop and b not in drop}
    want = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    got = {r.n: r.deg for r in g_kcore(spark, SF).collect()}
    assert got == want
