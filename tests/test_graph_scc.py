"""SCC (graph/algos.py strongly_connected_components) parity against
an independent iterative Tarjan on handcrafted and random digraphs."""

import random

from pyspark.sql import functions as F

from graphraft_spark.graph.algos import strongly_connected_components


def tarjan_scc(n_ids, edge_list):
    """Iterative Tarjan; returns {id: scc_label} with label = min member."""
    adj = {v: [] for v in n_ids}
    for a, b in edge_list:
        if a != b:
            adj[a].append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comps = []
    counter = [0]
    for root in n_ids:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                comps.append(comp)
    return {v: min(c) for c in comps for v in c}


def run_spark_scc(spark, n_ids, edge_list, **kw):
    nodes = spark.createDataFrame([(v,) for v in n_ids], "id bigint")
    if edge_list:
        edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    else:
        edges = nodes.limit(0).select(F.col("id").alias("src"),
                                      F.col("id").alias("dst"))
    out = strongly_connected_components(nodes, edges, **kw)
    rows = out.collect()
    assert len(rows) == len(set(n_ids))
    sizes = {}
    for r in rows:
        sizes.setdefault(r.scc, set()).add(r.id)
    for r in rows:
        assert r.scc_size == len(sizes[r.scc])
        assert r.scc == min(sizes[r.scc])
    return {r.id: r.scc for r in rows}


def test_handcrafted(spark):
    # two cycles bridged by a DAG edge + a tail + an isolated node
    n = list(range(1, 10))
    e = [(1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
         (3, 4),                          # bridge (one-way)
         (4, 5), (5, 6), (6, 4),          # SCC {4,5,6}
         (6, 7), (7, 8)]                  # tail; 9 isolated
    got = run_spark_scc(spark, n, e)
    assert got == tarjan_scc(n, e)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 4
    assert got[7] == 7 and got[8] == 8 and got[9] == 9


def test_self_loops_and_two_node_cycle(spark):
    n = [1, 2, 3]
    e = [(1, 1), (2, 3), (3, 2)]
    got = run_spark_scc(spark, n, e)
    assert got == {1: 1, 2: 2, 3: 2}


def test_single_giant_cycle(spark):
    n = list(range(20))
    e = [(i, (i + 1) % 20) for i in range(20)]
    got = run_spark_scc(spark, n, e)
    assert set(got.values()) == {0}


def test_random_digraphs_match_tarjan(spark):
    for seed in (7, 41):
        rng = random.Random(seed)
        n = list(range(40))
        e = [(a, b) for a in n for b in n
             if a != b and rng.random() < 0.06]
        assert run_spark_scc(spark, n, e) == tarjan_scc(n, e), seed
