"""Distributed bigram LM with stupid backoff: hand-computed
probabilities, backoff/OOV paths, and CCNet-style band filtering."""

import math

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    """Train on docs 0/2 (even), score includes unseen transitions."""
    train = spark.createDataFrame(
        [(0, "a b a b c"), (2, "a b c a")],
        "doc_id bigint, text string")
    return train


def test_counts_are_exact(frames):
    from graphraft_spark.ops.word_lm import train_bigram_lm

    bi, uni = train_bigram_lm(frames)
    bic = {(r.prev, r.cur): r.c_bi for r in bi.collect()}
    # transitions: doc0 = ab, ba, ab, bc; doc2 = ab, bc, ca
    assert bic == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 2,
                   ("c", "a"): 1}
    unic = {r.tok: r.c_uni for r in uni.collect()}
    assert unic == {"a": 4, "b": 3, "c": 2}


def test_seen_transition_probability(spark, frames):
    from graphraft_spark.ops.word_lm import (stupid_backoff_score,
                                             train_bigram_lm)

    bi, uni = train_bigram_lm(frames)
    score_docs = spark.createDataFrame(
        [(10, "a b c")], "doc_id bigint, text string")
    [row] = stupid_backoff_score(score_docs, bi, uni).collect()
    # P(b|a) = 3/4, P(c|b) = 2/3
    want = (math.log(3 / 4) + math.log(2 / 3)) / 2
    assert row.n_trans == 2
    assert row.lp_mean == pytest.approx(want, abs=1e-12)


def test_backoff_and_oov(spark, frames):
    from graphraft_spark.ops.word_lm import (stupid_backoff_score,
                                             train_bigram_lm)

    bi, uni = train_bigram_lm(frames)
    # "c b": bigram unseen, cur=b in vocab → alpha*(3+1)/(9+3)
    # "b z": cur OOV → alpha*(0+1)/(9+3); finite, not -inf
    score_docs = spark.createDataFrame(
        [(10, "c b"), (11, "b z")], "doc_id bigint, text string")
    got = {r.doc_id: r.lp_mean
           for r in stupid_backoff_score(score_docs, bi, uni).collect()}
    assert got[10] == pytest.approx(math.log(0.4 * 4 / 12), abs=1e-12)
    assert got[11] == pytest.approx(math.log(0.4 * 1 / 12), abs=1e-12)
    assert all(math.isfinite(v) for v in got.values())


def test_short_docs_are_excluded(spark, frames):
    from graphraft_spark.ops.word_lm import (stupid_backoff_score,
                                             train_bigram_lm)

    bi, uni = train_bigram_lm(frames)
    score_docs = spark.createDataFrame(
        [(10, "a"), (11, ""), (12, "a b")],
        "doc_id bigint, text string")
    rows = stupid_backoff_score(score_docs, bi, uni).collect()
    assert [r.doc_id for r in rows] == [12]


def test_in_domain_scores_above_gibberish(spark, frames):
    """The semantic point of the filter: training-like text gets a
    higher mean log-prob than OOV gibberish."""
    from graphraft_spark.ops.word_lm import (stupid_backoff_score,
                                             train_bigram_lm)

    bi, uni = train_bigram_lm(frames)
    score_docs = spark.createDataFrame(
        [(10, "a b c a b"), (11, "zz qq ww rr tt")],
        "doc_id bigint, text string")
    got = {r.doc_id: r.lp_mean
           for r in stupid_backoff_score(score_docs, bi, uni).collect()}
    assert got[10] > got[11]
