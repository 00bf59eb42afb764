"""Property tests for the SGNS trainer's two-pass distributed
primitives (graph/embeddings.py): _rank_vocab must equal the global
sort rank for ANY input/partitioning, and _weighted_cdf's intervals
must exactly partition [0, W) in node order with widths == weights —
the invariants every negative draw depends on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**SETTINGS)
@given(nodes=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40,
                      unique=True),
       nparts=st.integers(1, 5))
def test_rank_vocab_equals_global_sort_rank(spark, nodes, nparts):
    from graphraft_spark.graph.embeddings import _rank_vocab

    df = spark.createDataFrame([(n,) for n in nodes], "node bigint") \
        .repartition(nparts)
    got = {r.node: r.idx for r in _rank_vocab(df).collect()}
    want = {n: i for i, n in enumerate(sorted(nodes))}
    assert got == want


@settings(**SETTINGS)
@given(weights=st.lists(
    st.tuples(st.integers(-500, 500), st.integers(1, 50)),
    min_size=1, max_size=30, unique_by=lambda t: t[0]),
    nparts=st.integers(1, 4))
def test_weighted_cdf_partitions_the_axis(spark, weights, nparts):
    from graphraft_spark.graph.embeddings import _weighted_cdf

    df = spark.createDataFrame(weights, "node bigint, wv bigint") \
        .repartition(nparts)
    rows = sorted(_weighted_cdf(df).collect(), key=lambda r: r.node)
    # node order == interval order; widths == weights; intervals are
    # contiguous from 0 and cover exactly [0, sum(wv))
    cursor = 0
    wmap = dict(weights)
    for r in rows:
        assert r.lo == cursor
        assert r.hi - r.lo == wmap[r.node] == r.wv
        cursor = r.hi
    assert cursor == sum(w for _, w in weights)
