"""Round-8 operator edge cases the oracle queries don't pin:
SCD2 overlap/gap resolution, keep-best tie-breaks, TF-IDF empties."""

import pytest
from pyspark.sql import functions as F

from graphraft_spark.ops.dedup import keep_best_in_components
from graphraft_spark.ops.temporal import scd2_lookup
from graphraft_spark.ops.text_analysis import tfidf_top_terms


def test_scd2_gap_and_overlap(spark):
    facts = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 15), (3, 10, 25), (4, 10, 35), (5, 99, 5)],
        "fid int, k int, ts_sec bigint")
    dim = spark.createDataFrame(
        # v1 [0,10), v2 [10,20) — contiguous; GAP [20,30); v3 [30,40)
        # overlapping v4 [32,40): ts=35 must pick v4 (later valid_from)
        [(10, 0, 10, "v1"), (10, 10, 20, "v2"), (10, 30, 40, "v3"),
         (10, 32, 40, "v4")],
        "k int, valid_from bigint, valid_to bigint, ver string")
    got = {r.fid: r.ver for r in scd2_lookup(
        facts, dim, key="k", ts_col="ts_sec",
        payload=("ver",)).collect()}
    assert got == {1: "v1", 2: "v2", 3: None,  # gap -> null
                   4: "v4",                    # overlap -> latest start
                   5: None}                    # unknown key -> null


def test_scd2_boundary_semantics(spark):
    # from <= ts < to: ts exactly at a boundary belongs to the NEW version
    facts = spark.createDataFrame([(1, 1, 10)],
                                  "fid int, k int, ts_sec bigint")
    dim = spark.createDataFrame(
        [(1, 0, 10, "old"), (1, 10, 20, "new")],
        "k int, valid_from bigint, valid_to bigint, ver string")
    [row] = scd2_lookup(facts, dim, key="k", ts_col="ts_sec",
                        payload=("ver",)).collect()
    assert row.ver == "new"


def test_keep_best_tie_breaks_to_min_id(spark):
    items = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 4)], "id bigint, score bigint")
    pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                  "id_a bigint, id_b bigint")
    got = {r.id: (r.comp, r.is_kept)
           for r in keep_best_in_components(items, pairs, "score").collect()}
    assert got[2] == (1, True)      # best score, tie broken to id 2 < 3
    assert got[3] == (1, False)
    assert got[1] == (1, False)
    assert got[7] == (7, True)      # singleton keeps itself


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpha shared"), (2, "beta shared"), (3, "shared")],
        "doc_id bigint, text string")
    got = tfidf_top_terms(docs, m=1).collect()
    by_doc = {r.doc_id: r.term for r in got}
    # each doc's distinctive term wins over the corpus-wide one
    assert by_doc[1] == "alpha" and by_doc[2] == "beta"
    assert by_doc[3] == "shared"  # only term it has
    assert all(r.rank == 1 for r in got)


def test_tfidf_empty_text_yields_no_rows(spark):
    docs = spark.createDataFrame([(1, ""), (2, "  "), (3, "word")],
                                 "doc_id bigint, text string")
    got = tfidf_top_terms(docs).collect()
    assert {r.doc_id for r in got} == {3}
