"""Label propagation (graph/algos.py): hand graph with two obvious
communities + determinism across partitionings."""

from graphraft_spark.graph.algos import label_propagation


def _g(spark):
    # two triangles bridged by one edge: {1,2,3} and {10,11,12}
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12)], "nodeId bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src bigint, dst bigint")
    return nodes, edges


def test_two_communities(spark):
    nodes, edges = _g(spark)
    out = {r["nodeId"]: r["label"]
           for r in label_propagation(nodes, edges, rounds=3).collect()}
    # each triangle collapses to its min label; the bridge endpoints
    # stay with their own triangle (2-vs-1 neighbor majority)
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12]
    assert out[10] != out[1]


def test_isolated_keeps_own_label(spark):
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "nodeId bigint")
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    out = {r["nodeId"]: r["label"]
           for r in label_propagation(nodes, edges, rounds=2).collect()}
    assert out[99] == 99
    assert out[1] == 1 and out[2] == 1
