"""Perplexity corpus filter (ops/perplexity.py): in-domain text scores
lower than gibberish under the reference LM; distributed scores equal
the driver-side computation; the filter keeps the in-domain band."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lm():
    from graphraft_spark.llm.ngram_lm import CharNgramLM

    corpus = ["the quick brown fox jumps over the lazy dog",
              "the rain in spain stays mainly in the plain",
              "all work and no play makes jack a dull boy"] * 3
    return CharNgramLM(corpus, n=3, alpha=0.5)


def test_in_domain_beats_gibberish(spark, lm):
    from graphraft_spark.ops.perplexity import doc_perplexity

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the rain in spain"),
         (3, "zxq jkw vvvpq 9#@@"), (4, "")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["ppl"]
           for r in doc_perplexity(docs, lm).collect()}
    assert got[1] < got[3] and got[2] < got[3]
    assert math.isinf(got[4])


def test_matches_driver_side_scoring(spark, lm):
    from graphraft_spark.ops.perplexity import doc_perplexity

    texts = ["the quick", "spain plain rain", "qqqq"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r["ppl"]
           for r in doc_perplexity(docs.repartition(3), lm).collect()}
    for i, t in enumerate(texts):
        toks = list(t)
        total = sum(lm.logprob(toks[max(0, j - lm.n + 1):j], c)
                    for j, c in enumerate(toks))
        want = math.exp(-total / len(toks))
        assert got[i] == pytest.approx(want, rel=1e-12)


def test_filter_keeps_low_ppl_band(spark, lm):
    from graphraft_spark.ops.perplexity import doc_perplexity, \
        perplexity_filter

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zxq jkw vvvpq")],
        "doc_id bigint, text string")
    ppls = {r["doc_id"]: r["ppl"]
            for r in doc_perplexity(docs, lm).collect()}
    cut = (ppls[1] + ppls[2]) / 2
    kept = perplexity_filter(docs, lm, max_ppl=cut).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["text"] == "the quick brown fox"
