"""Per-source KL drift monitor: zero for an identical distribution,
monotone in skew, finite on disjoint vocabulary."""

import pytest


def _kl(spark, rows):
    from graphraft_spark.ops.text_analysis import source_divergence

    df = spark.createDataFrame(rows, "doc_id bigint, source string, "
                                     "text string")
    return {r.source: r.kl for r in source_divergence(df).collect()}


def test_single_source_equals_corpus(spark):
    """One group == the corpus → P_g = P_c exactly → KL = 0."""
    got = _kl(spark, [(0, "a", "x y z"), (1, "a", "x x y")])
    assert got["a"] == pytest.approx(0.0, abs=1e-15)


def test_skewed_source_diverges_more(spark):
    rows = [
        (0, "balanced", "x y z x y z"),
        (1, "skewed", "x x x x x x"),
        (2, "base", "x y z x y z"),
        (3, "base", "x y z y z y"),
    ]
    got = _kl(spark, rows)
    assert got["skewed"] > got["balanced"] > 0
    assert all(v >= 0 or v == pytest.approx(0, abs=1e-12)
               for v in got.values())


def test_disjoint_vocab_is_finite(spark):
    """Smoothing over the shared corpus support keeps KL finite even
    when a source shares no tokens with the rest."""
    import math

    got = _kl(spark, [(0, "a", "x x y"), (1, "b", "q q r")])
    assert all(math.isfinite(v) and v > 0 for v in got.values())


def test_winnow_coverage_guarantee(spark):
    """Schleimer et al.'s property: two documents sharing a run of at
    least w + k - 1 = 6 words must share at least one fingerprint."""
    import pyspark.sql.functions as F

    from graphraft_spark.ops.text_analysis import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared words
    df = spark.createDataFrame(
        [(1, f"one two {shared} three"),
         (2, f"{shared} four five six seven"),
         (3, "totally different words here entirely now")],
        "doc_id bigint, text string")
    rows = df.select("doc_id",
                     winnow_fingerprints(F.col("text")).alias("fps")) \
        .collect()
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[1] & fps[2], "shared 6-word run must share a fingerprint"
    assert not (fps[1] & fps[3])


def test_winnow_short_text_single_fingerprint(spark):
    import pyspark.sql.functions as F

    from graphraft_spark.ops.text_analysis import winnow_fingerprints

    df = spark.createDataFrame([(1, "just two")],
                               "doc_id bigint, text string")
    [r] = df.select(winnow_fingerprints(F.col("text")).alias("f")) \
        .collect()
    assert len(r.f) == 1
