"""curate_corpus (ops/curation.py): each gate kills exactly the doc
built to trip it, flags stay auditable, keep_final is the conjunction."""

from pyspark.sql import functions as F

from graphraft_spark.ops.curation import curate_corpus

GOOD = ("the quick brown fox and the lazy dog have agreed to be "
        "friends with every animal of the forest that came by " * 3)


def test_each_gate_kills_its_doc(spark):
    rows = [
        (1, GOOD),                                   # survives everything
        (2, GOOD + " lorem ipsum"),                  # c4 doc gate
        (3, "short text only"),                      # gopher word count
        (4, GOOD.replace("the", "le")
             .replace("and", "et")),                 # still en? see below
        (5, GOOD),                                   # exact dup of 1
        (6, GOOD + " unique tail of benchmark words "
             "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # benchmark contains an 8-gram lifted verbatim from doc 6's tail
    bench = spark.createDataFrame(
        [("one two three four five six seven eight",)], "text string")
    out = {r.doc_id: r for r in
           curate_corpus(docs, bench, n=8).collect()}
    assert len(out) == 6

    assert out[1].keep_final
    assert out[2].c4_kept is False and not out[2].keep_final
    assert out[3].gopher_kept is False and not out[3].keep_final
    assert out[5].is_canonical is False and not out[5].keep_final
    assert out[5].lang_pred == out[1].lang_pred == "en"
    assert out[6].contaminated and out[6].n_hits >= 1
    assert not out[6].keep_final
    # every row carries every flag (auditability)
    assert set(out[1].asDict()) == {
        "doc_id", "c4_kept", "gopher_kept", "lang_pred", "ok_lang",
        "is_canonical", "contaminated", "n_hits", "keep_final"}


def test_allowed_langs_gate(spark):
    docs = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    bench = spark.createDataFrame([("zzz " * 8,)], "text string")
    out = curate_corpus(docs, bench, allowed_langs=("fr",)).collect()[0]
    assert out.lang_pred == "en" and out.ok_lang is False
    assert not out.keep_final


def test_bloom_variant_identical(spark):
    rows = [(i, GOOD + f" tail variant {i} " + "filler words here " * i)
            for i in range(1, 8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [("tail variant 3 filler words here filler words",)],
        "text string")
    direct = curate_corpus(docs, bench, n=8, hashed=True)
    bloomed = curate_corpus(docs, bench, n=8, hashed=True, bloom=True)
    assert sorted(map(tuple, direct.collect())) \
        == sorted(map(tuple, bloomed.collect()))


def test_auto_policy_picks_direct_below_crossover(spark):
    from graphraft_spark.ops.decontaminate import choose_decontamination
    bench = spark.createDataFrame(
        [("one two three four five six seven eight",)], "text string")
    mode, bits = choose_decontamination(bench, n=8)
    assert mode == "direct" and bits == 0


def test_auto_policy_picks_bloom_above_crossover_with_sized_bits(spark):
    from graphraft_spark.ops.decontaminate import choose_decontamination
    bench = spark.createDataFrame(
        [(f"word{i} alpha beta gamma delta epsilon zeta eta theta",)
         for i in range(40)], "text string")
    # forced-low threshold exercises the bloom branch + the 10x-bits rule
    mode, bits = choose_decontamination(bench, n=8,
                                        min_grams_for_bloom=10)
    assert mode == "bloom"
    # next power of two >= 10x the distinct gram estimate, never tiny
    assert bits >= 10 * 40 and bits & (bits - 1) == 0 and bits >= 1 << 16


def test_curate_auto_matches_direct(spark):
    rows = [(i, GOOD + f" tail variant {i} " + "filler words here " * i)
            for i in range(1, 8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [("tail variant 3 filler words here filler words",)],
        "text string")
    auto = curate_corpus(docs, bench, n=8, decontaminate="auto")
    direct = curate_corpus(docs, bench, n=8, decontaminate="direct")
    assert sorted(map(tuple, auto.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_curate_rejects_unknown_mode(spark):
    import pytest
    docs = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    bench = spark.createDataFrame([("zzz " * 8,)], "text string")
    with pytest.raises(ValueError, match="unknown decontaminate"):
        curate_corpus(docs, bench, decontaminate="typo").collect()
