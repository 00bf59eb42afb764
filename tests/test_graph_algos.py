"""PageRank / degree centrality vs an independent dense numpy power
iteration on hand-built graphs (dangling nodes, cycles, hubs)."""

import numpy as np
import pytest

from graphraft_spark.graph.algos import degrees, pagerank


def np_pagerank(n, edge_list, alpha=0.85, n_iter=20):
    """Dense reference: same fixed-iteration, dangling-redistribution
    scheme, written independently of the Spark plan."""
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - alpha) / n)
        dangling = r[out_deg == 0].sum()
        nxt += alpha * dangling / n
        for s, d in edge_list:
            nxt[d] += alpha * r[s] / out_deg[s]
        r = nxt
    return r


GRAPHS = {
    # chain with dangling tail: 0→1→2→3 (3 dangles)
    "chain_dangling": (4, [(0, 1), (1, 2), (2, 3)]),
    # cycle + hub: everyone points at 0, 0 points around
    "hub": (5, [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]),
    # two components, one a 2-cycle
    "two_comp": (5, [(0, 1), (1, 0), (2, 3)]),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_numpy(spark, name):
    n, edge_list = GRAPHS[name]
    nodes = spark.createDataFrame([(i,) for i in range(n)],
                                  "nodeId bigint")
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = {r["nodeId"]: r["rank"]
           for r in pagerank(nodes, edges, n_iter=8, checkpoint_every=4).collect()}
    want = np_pagerank(n, edge_list, n_iter=8)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12), (name, i)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_ranks_highest(spark):
    # The hub/spoke pair converges by damped oscillation (0's rank and
    # 1's rank swap dominance early on), so this ordering property needs
    # the longer budget the parity tests don't.
    n, edge_list = GRAPHS["hub"]
    nodes = spark.createDataFrame([(i,) for i in range(n)],
                                  "nodeId bigint")
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = {r["nodeId"]: r["rank"]
           for r in pagerank(nodes, edges, n_iter=20).collect()}
    assert got[0] == max(got.values())


def test_degrees_counts_both_endpoints(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (1, 3)],
                                  "src bigint, dst bigint")
    got = {r["nodeId"]: r["degree"] for r in degrees(edges).collect()}
    assert got == {0: 1, 1: 3, 2: 1, 3: 1}


def np_ppr(n, edge_list, seeds, alpha=0.85, n_iter=8):
    import numpy as np
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.zeros(n)
    r[list(seeds)] = 1.0 / len(seeds)
    tele = np.zeros(n)
    tele[list(seeds)] = 1.0 / len(seeds)
    for _ in range(n_iter):
        nxt = (1.0 - alpha) * tele
        nxt += alpha * r[out_deg == 0].sum() * tele
        for s, d in edge_list:
            nxt[d] += alpha * r[s] / out_deg[s]
        r = nxt
    return r


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_personalized_pagerank_matches_numpy(spark, name):
    from graphraft_spark.graph.algos import personalized_pagerank

    n, edge_list = GRAPHS[name]
    seeds = {0, min(2, n - 1)}
    nodes = spark.createDataFrame([(i,) for i in range(n)],
                                  "nodeId bigint")
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    seed_df = spark.createDataFrame([(s,) for s in sorted(seeds)],
                                    "nodeId bigint")
    got = {r["nodeId"]: r["rank"]
           for r in personalized_pagerank(nodes, edges, seed_df,
                                          n_iter=8).collect()}
    want = np_ppr(n, edge_list, seeds, n_iter=8)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12), (name, i)


def test_ppr_concentrates_near_seed(spark):
    from graphraft_spark.graph.algos import personalized_pagerank

    # chain 0->1->2->3: seeding at 0 must rank 1 above 3
    nodes = spark.createDataFrame([(i,) for i in range(4)],
                                  "nodeId bigint")
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                  "src bigint, dst bigint")
    seed_df = spark.createDataFrame([(0,)], "nodeId bigint")
    got = {r["nodeId"]: r["rank"]
           for r in personalized_pagerank(nodes, edges, seed_df,
                                          n_iter=12).collect()}
    assert got[0] > got[1] > got[2] > got[3]


def test_ppr_requires_seed(spark):
    from graphraft_spark.graph.algos import personalized_pagerank

    nodes = spark.createDataFrame([(0,), (1,)], "nodeId bigint")
    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    empty = spark.createDataFrame([], "nodeId bigint")
    with pytest.raises(ValueError):
        personalized_pagerank(nodes, edges, empty)


def test_triangle_count_hand_graph(spark):
    """K4 plus a pendant: each K4 node sits on C(3,2)=3 triangles,
    the pendant on none; directions/duplicates/self-loops ignored."""
    from graphraft_spark.graph.algos import triangle_count

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b]  # K4 both dirs
        + [(3, 9), (9, 9)],                                     # pendant + loop
        "src bigint, dst bigint")
    got = {r.n: r.triangles for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(got.values()) // 3 == 4  # K4 has 4 triangles


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from graphraft_spark.graph.algos import triangle_count

    rng = random.Random(7)
    nodes = list(range(30))
    edges = {(a, b) for a in nodes for b in nodes
             if a < b and rng.random() < 0.25}
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= edges:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(list(edges), "src bigint, dst bigint")
    got = {r.n: r.triangles for r in triangle_count(df).collect()}
    assert got == want


def test_clustering_coefficient_hand_graph(spark):
    """Triangle 0-1-2 plus node 3 attached to 0 and 1: lcc(3)=1.0
    (its two neighbors are connected), lcc(0)=lcc(1)=2/3 (deg 3, two
    of three neighbor pairs closed), lcc(2)=1.0, pendant 4 → 0.0."""
    from graphraft_spark.graph.algos import clustering_coefficient

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 0), (3, 1), (4, 2)],
        "src bigint, dst bigint")
    got = {r.n: (r.deg, round(r.lcc, 6))
           for r in clustering_coefficient(edges).collect()}
    assert got == {0: (3, round(2 / 3, 6)), 1: (3, round(2 / 3, 6)),
                   2: (3, round(1 / 3, 6)), 3: (2, 1.0), 4: (1, 0.0)}


def test_adamic_adar_hand_graph(spark):
    """Path 1-3-2 plus 1-4, 2-4: pair (1,2) has common neighbors {3,4}
    → AA = 1/ln(2) + 1/ln(2); connected pairs are excluded; the hub cap
    drops the listed mid."""
    import math

    from graphraft_spark.graph.algos import adamic_adar

    edges = spark.createDataFrame(
        [(1, 3), (3, 2), (1, 4), (2, 4)], "src bigint, dst bigint")
    got = {(r.x, r.y): r.aa for r in adamic_adar(edges).collect()}
    # deg(3)=2, deg(4)=2; (1,2) via both mids; (3,4) via mids 1 and 2
    want_12 = 1 / math.log(2) + 1 / math.log(2)
    assert got[(1, 2)] == pytest.approx(want_12, abs=1e-12)
    assert got[(3, 4)] == pytest.approx(want_12, abs=1e-12)
    assert (1, 3) not in got  # connected pairs excluded
    # cap below every mid degree → no wedges at all
    capped = adamic_adar(edges, max_mid_degree=1).collect()
    assert capped == []


def test_k_core_matches_python_peeling(spark):
    import random

    from graphraft_spark.graph.algos import k_core

    rng = random.Random(11)
    edges = {(a, b) for a in range(25) for b in range(25)
             if a < b and rng.random() < 0.2}
    # python reference peeling
    es = set(edges)
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < 3}
        if not drop:
            break
        es = {(a, b) for a, b in es if a not in drop and b not in drop}
    want = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    df = spark.createDataFrame(list(edges), "src bigint, dst bigint")
    got = {r.n: r.deg for r in k_core(df, 3).collect()}
    assert got == want


def test_k_core_triangle_with_tail(spark):
    from graphraft_spark.graph.algos import k_core

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)],
        "src bigint, dst bigint")
    got = {r.n: r.deg for r in k_core(edges, 2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}  # the triangle survives, tail peels
