"""Exact-substring span dedup (Lee et al. 2022) — hand-built corpora
with known duplicated substrings, asserting exact span boundaries,
first-occurrence retention, island merging, and scrub reconstruction."""

from graphraft_spark.ops.dedup import (
    duplicate_spans,
    exact_substring_scrub,
)

# 12 shared tokens embedded in two different documents at different
# offsets; k=4 → windows at 9 positions inside the shared run.
SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"unique one two {SHARED} tail1 tail2"),
            (2, f"{SHARED} completely different ending here"),
            (3, "no duplicated content in this document at all"),
        ],
        "doc_id bigint, text string")


def test_duplicate_spans_flags_second_occurrence_only(spark):
    spans = duplicate_spans(_docs(spark), k=4).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 holds the first global occurrence (smaller doc id) → clean;
    # doc 3 shares nothing → clean.
    assert 1 not in by_doc and 3 not in by_doc
    # doc 2: the shared run covers tokens 1..12, every k-window inside
    # it (positions 1..9) is a repeat → one merged maximal span.
    assert len(by_doc[2]) == 1
    s = by_doc[2][0]
    assert (s["span_start"], s["span_end"]) == (1, 12)
    assert s["n_windows"] == 9


def test_island_merge_keeps_disjoint_spans_separate(spark):
    # Two repeated 4-token runs separated by unique filler → two spans,
    # not one merged span.
    docs = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(4, "alpha beta gamma delta FILLERX FILLERY "
                 "theta iota kappa lam wholly new ending")],
            "doc_id bigint, text string"))
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in duplicate_spans(docs, k=4).collect()}
    assert (4, 1, 4) in spans    # first run (lowercased match)
    assert (4, 7, 10) in spans   # second run, disjoint island
    assert not any(d == 4 and (a, b) == (1, 10) for d, a, b in spans)


def test_scrub_removes_spans_preserves_order(spark):
    out = {r["doc_id"]: r for r in
           exact_substring_scrub(_docs(spark), k=4).collect()}
    # doc 1 untouched (first occurrence survives).
    assert out[1]["text"].startswith("unique one two alpha")
    assert out[1]["n_tokens_kept"] == 17
    # doc 2 loses the 12 shared tokens, keeps its unique tail in order.
    assert out[2]["text"] == "completely different ending here"
    assert out[2]["n_tokens_kept"] == 4
    # doc 3 untouched.
    assert out[3]["n_tokens_kept"] == 8


def test_short_documents_yield_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "one two three")],
        "doc_id bigint, text string")
    # 3 tokens < k=4: no windows, no spans, scrub is the identity.
    assert duplicate_spans(docs, k=4).count() == 0
    out = {r["doc_id"]: r["text"]
           for r in exact_substring_scrub(docs, k=4).collect()}
    assert out == {1: "one two three", 2: "one two three"}
