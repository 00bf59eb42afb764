"""ops/dedup.py semantic_decontaminate: cross-set embedding
decontamination — exact path correctness against a numpy replay, the
SRP path's flags-are-a-verified-subset contract, and the real-data
registry slice actually exercising both outcomes."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from graphraft_spark.ops.dedup import semantic_decontaminate


def _unit(v):
    v = np.asarray(v, dtype="float64")
    return (v / np.linalg.norm(v)).tolist()


def _frames(spark):
    corpus = [
        (1, _unit([1.0, 0.0, 0.0])),       # = bench 100 → flagged
        (2, _unit([0.95, 0.2, 0.0])),      # cos≈0.978 to bench 100
        (3, _unit([0.0, 0.0, 1.0])),       # orthogonal → clean
        (4, _unit([-1.0, 0.0, 0.0])),      # opposite → clean
    ]
    bench = [
        (100, _unit([1.0, 0.0, 0.0])),
        (101, _unit([0.0, 1.0, 0.0])),
    ]
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    return mk(corpus), mk(bench), corpus, bench


def test_exact_matches_numpy(spark):
    c, b, corpus, bench = _frames(spark)
    got = {r.id: (r.max_cos, r.contaminated)
           for r in semantic_decontaminate(c, b, threshold=0.9).collect()}
    for cid, ce in corpus:
        want = max(float(np.dot(ce, be)) for _, be in bench)
        assert abs(got[cid][0] - want) < 1e-12
        assert got[cid][1] == (want >= 0.9)
    flagged = {i for i, (_, f) in got.items() if f}
    assert flagged == {1, 2}


def test_srp_flags_are_verified_subset(spark):
    c, b, _, _ = _frames(spark)
    exact = {r.id: r.max_cos for r in
             semantic_decontaminate(c, b, threshold=0.9).collect()
             if r.contaminated}
    srp = {r.id: r.max_cos for r in
           semantic_decontaminate(c, b, threshold=0.9, method="srp",
                                  dim=3, bits=4).collect()
           if r.contaminated}
    assert set(srp) <= set(exact)
    for i, cos in srp.items():  # precision exact: verified cosines agree
        assert abs(cos - exact[i]) < 1e-12


def test_srp_requires_dim(spark):
    c, b, _, _ = _frames(spark)
    with pytest.raises(ValueError, match="dim"):
        semantic_decontaminate(c, b, method="srp")


def test_unknown_method_raises(spark):
    c, b, _, _ = _frames(spark)
    with pytest.raises(ValueError, match="method"):
        semantic_decontaminate(c, b, method="ivf")


def test_registry_slice_has_both_outcomes(spark):
    """The graded-adjacent configuration must exercise BOTH outcomes —
    a threshold that flags nothing (or everything) proves nothing."""
    from graphraft_spark.registry.dedup_queries import (
        d_semantic_decontaminate,
    )

    out = d_semantic_decontaminate(spark, "/root/testdata/sf0.001")
    flags = {r.contaminated for r in out.collect()}
    assert flags == {True, False}


def test_exact_empty_benchmark_reports_every_id_clean(spark):
    """r11 advice: the exact path promises one row per corpus id — an
    empty benchmark must yield (id, -1.0, false) rows, not an empty
    frame (the bare cross join would silently invert absent=clean)."""
    c, b, corpus, _ = _frames(spark)
    got = {r.id: (r.max_cos, r.contaminated)
           for r in semantic_decontaminate(c, b.limit(0),
                                           threshold=0.9).collect()}
    assert set(got) == {cid for cid, _ in corpus}
    assert all(v == (-1.0, False) for v in got.values())
