"""Benchmark decontamination (ops/decontaminate.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog every single day"),
        (2, "completely unrelated text about distributed query engines here"),
        (3, "another clean document with no benchmark overlap at all folks"),
        (4, "prefix words then the quick brown fox jumps over the lazy dog"),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def evalset(spark):
    # one eval question whose 9-gram appears in docs 1 and 4
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "qid bigint, text string")


def test_flags_exact_ngram_hits(spark, corpus, evalset):
    from graphraft_spark.ops.decontaminate import contamination_flags

    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in contamination_flags(corpus, evalset, n=9).collect()}
    assert out[1][1] and out[4][1]          # both contain the 9-gram
    assert not out[2][1] and not out[3][1]  # clean
    assert not out[5][1]                    # short doc, no overlap
    assert out[1][0] >= 1 and out[2][0] == 0


def test_hashed_path_agrees_with_strings(spark, corpus, evalset):
    from graphraft_spark.ops.decontaminate import contamination_flags

    s = {(r.doc_id, r.n_hits, r.contaminated)
         for r in contamination_flags(corpus, evalset, n=9,
                                      hashed=False).collect()}
    h = {(r.doc_id, r.n_hits, r.contaminated)
         for r in contamination_flags(corpus, evalset, n=9,
                                      hashed=True).collect()}
    assert s == h


def test_decontaminate_drops_only_contaminated(spark, corpus, evalset):
    from graphraft_spark.ops.decontaminate import decontaminate

    kept = {r.doc_id for r in decontaminate(corpus, evalset, n=9).collect()}
    assert kept == {2, 3, 5}


def test_short_benchmark_doc_flags_exact_copy(spark):
    """A benchmark doc shorter than n contributes its whole text as one
    gram, so an exact copy in the corpus still flags."""
    from graphraft_spark.ops.decontaminate import contamination_flags

    docs = spark.createDataFrame(
        [(1, "tiny secret answer"), (2, "something else entirely")],
        "doc_id bigint, text string")
    bench = docs.sparkSession.createDataFrame(
        [(9, "tiny secret answer")], "qid bigint, text string")
    out = {r.doc_id: r.contaminated
           for r in contamination_flags(docs, bench, n=13).collect()}
    assert out[1] and not out[2]


def test_repetition_features_known_values(spark):
    from graphraft_spark.ops.text_analysis import repetition_features

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),        # 6 words {a,b}; bigrams: ab ba ab ba ab
         (2, "all distinct words here now"),
         (3, "solo")],
        "doc_id bigint, text string")
    out = {r.doc_id: r.asDict() for r in repetition_features(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6
    assert r1["dup_word_frac"] == pytest.approx(1 - 2 / 6)
    assert r1["top_bigram_share"] == pytest.approx(3 / 5)   # 'a b' x3 of 5
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 2 / 5)
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_bigram_share"] == pytest.approx(1 / 4)
    r3 = out[3]  # single word: gram list degenerates to the word
    assert r3["n_words"] == 1 and r3["dup_word_frac"] == 0.0
    assert r3["top_bigram_share"] == 1.0
