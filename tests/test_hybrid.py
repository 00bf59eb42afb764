"""Reciprocal Rank Fusion: hand-computed fusion scores, absence
semantics, tiebreaks."""

import pytest


def test_rrf_hand_computed(spark):
    from graphraft_spark.search.hybrid import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id bigint, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)],
                              "doc_id bigint, rank int")
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k=60).collect()}
    assert got[11] == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=5e-7)
    assert got[10] == pytest.approx(round(1 / 61, 6), abs=5e-7)
    assert got[12] == pytest.approx(round(1 / 63, 6), abs=5e-7)
    assert got[13] == pytest.approx(round(1 / 62, 6), abs=5e-7)
    # doc in both lists must outrank any doc in one list
    order = [r.doc_id for r in rrf_fuse([a, b], k=60).collect()]
    assert order[0] == 11


def test_rrf_topk_and_tiebreak(spark):
    from graphraft_spark.search.hybrid import rrf_fuse

    # identical ranks in disjoint lists → equal scores → id tiebreak
    a = spark.createDataFrame([(5, 1)], "doc_id bigint, rank int")
    b = spark.createDataFrame([(3, 1)], "doc_id bigint, rank int")
    rows = rrf_fuse([a, b], k=60, topk=1).collect()
    assert [r.doc_id for r in rows] == [3]


def test_with_rank_is_dense_and_ordered(spark):
    import pyspark.sql.functions as F

    from graphraft_spark.search.hybrid import with_rank

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9)], "doc_id bigint, score double")
    got = {r.doc_id: r.rank
           for r in with_rank(df, [F.desc("score"), F.asc("doc_id")],
                              "doc_id").collect()}
    assert got == {2: 1, 3: 2, 1: 3}


def test_rrf_rejects_empty(spark):
    from graphraft_spark.search.hybrid import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
