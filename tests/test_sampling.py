"""Graph sampling: fanout caps, determinism, walk mechanics."""

import pytest


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub 0 → 1..9; 1 → 10, 2 → 20 (chains); 10 → 100
    rows = [(0, i) for i in range(1, 10)] + [(1, 10), (2, 20), (10, 100)]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_sample_neighbors_caps_and_is_deterministic(star_edges):
    from graphraft_spark.graph.sampling import sample_neighbors

    s1 = sorted((r.src, r.dst) for r in
                sample_neighbors(star_edges, 3, seed="x").collect())
    s2 = sorted((r.src, r.dst) for r in
                sample_neighbors(star_edges.repartition(7), 3,
                                 seed="x").collect())
    assert s1 == s2
    from collections import Counter
    per_src = Counter(s for s, _ in s1)
    assert per_src[0] == 3 and max(per_src.values()) <= 3
    s3 = sorted((r.src, r.dst) for r in
                sample_neighbors(star_edges, 3, seed="y").collect())
    assert {s for s, _ in s3} == {s for s, _ in s1}  # same srcs, new draw


def test_khop_sample_layers(star_edges):
    from graphraft_spark.graph.sampling import khop_sample

    seeds = star_edges.sparkSession.createDataFrame(
        [(0,)], "nodeId bigint")
    out = khop_sample(star_edges, seeds, fanouts=(2, 1)).collect()
    hop1 = [(r.src, r.dst) for r in out if r.hop == 1]
    hop2 = [(r.src, r.dst) for r in out if r.hop == 2]
    assert len(hop1) == 2 and all(s == 0 for s, _ in hop1)
    frontier = {d for _, d in hop1}
    assert all(s in frontier for s, _ in hop2)
    assert len(hop2) <= len(frontier)


def test_random_walks_follow_edges_and_stop_at_sinks(spark):
    from graphraft_spark.graph.sampling import random_walks

    # line graph: 0→1→2→3; 3 is a sink
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                  "src bigint, dst bigint")
    starts = spark.createDataFrame([(0, 0), (1, 2)],
                                   "walk_id bigint, node bigint")
    rows = random_walks(edges, starts, length=5).collect()
    w0 = sorted((r.step, r.node) for r in rows if r.walk_id == 0)
    w1 = sorted((r.step, r.node) for r in rows if r.walk_id == 1)
    assert w0 == [(0, 0), (1, 1), (2, 2), (3, 3)]  # deterministic line
    assert w1 == [(0, 2), (1, 3)]                  # stops at the sink


def test_skipgram_pairs_window(spark):
    from graphraft_spark.graph.sampling import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 13)],
        "walk_id bigint, step bigint, node bigint")
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(walks, window=1).collect()}
    # adjacent pairs only, both directions
    assert got == {(10, 11): 1, (11, 10): 1, (11, 12): 1, (12, 11): 1,
                   (12, 13): 1, (13, 12): 1}
