"""Exact-substring span dedup (Lee et al. 2022) — hand-built corpora
with known duplicated substrings, asserting exact span boundaries,
first-occurrence retention, island merging, and scrub reconstruction."""

from pyspark.sql import functions as F

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


def test_rolling_variant_matches_md5_at_small_and_large_k(spark):
    """hash_fn='rolling' (numpy rolling hash, the k≈50 construction)
    must produce the exact span set of the md5 expression variant —
    including at a k larger than the poly path can even analyze."""
    sf = "/root/testdata/sf0.001"
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text"))
    # duplicate half the corpus under new ids so spans actually exist
    dup = docs.filter(F.col("doc_id") % 2 == 0) \
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup)
    for k in (8, 40):
        a = {tuple(r) for r in
             duplicate_spans(corpus, k=k, hash_fn="md5").collect()}
        b = {tuple(r) for r in
             duplicate_spans(corpus, k=k, hash_fn="rolling").collect()}
        assert a == b and len(a) > 0, f"k={k}"


def test_poly_rejects_large_k(spark):
    """2(k-1) unrolled zip_with passes exceed the analyzer's iteration
    budget — refuse with a pointer at the rolling variant instead of
    failing deep inside analysis."""
    import pytest

    docs = spark.createDataFrame([(1, "a b c")],
                                 "doc_id bigint, text string")
    with pytest.raises(ValueError, match="rolling"):
        duplicate_spans(docs, k=50, hash_fn="poly")


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment 1.0 while
    Jaccard is diluted below any usable threshold."""
    import pyspark.sql.functions as F

    from graphraft_spark.ops.dedup import containment, jaccard, shingles

    short = "alpha beta gamma delta epsilon"
    longd = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, short), (2, longd)],
                               "doc_id bigint, text string")
    sh = df.select("doc_id", shingles(F.col("text"), 3).alias("s"))
    a = sh.filter("doc_id = 1").select(F.col("s").alias("sa"))
    b = sh.filter("doc_id = 2").select(F.col("s").alias("sb"))
    [r] = a.crossJoin(b).select(
        containment(F.col("sa"), F.col("sb")).alias("c"),
        jaccard(F.col("sa"), F.col("sb")).alias("j")).collect()
    assert r.c == 1.0
    assert r.j < 0.1
