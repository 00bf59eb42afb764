"""Efraimidis-Spirakis weighted sampling: determinism, weight
monotonicity (pointwise, for a fixed draw), positivity contract, and
empirical proportionality."""

import pytest


def test_deterministic_across_calls_and_partitionings(spark):
    from graphraft_spark.data.ops import weighted_sample

    rows = [(i, float(i % 7 + 1)) for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id bigint, w double")
    b = a.repartition(13)
    s1 = [r.doc_id for r in weighted_sample(a, "w", 20).collect()]
    s2 = [r.doc_id for r in weighted_sample(b, "w", 20).collect()]
    assert s1 == s2 and len(s1) == 20


def test_weight_monotone_for_fixed_draw(spark):
    """For a fixed key (fixed u), increasing the weight can only
    increase the sample key ln(u)/w — so doubling one row's weight
    never pushes it OUT of the sample."""
    from graphraft_spark.data.ops import weighted_sample

    rows = [(i, 1.0) for i in range(50)]
    base = spark.createDataFrame(rows, "doc_id bigint, w double")
    picked = {r.doc_id for r in weighted_sample(base, "w", 10).collect()}
    target = next(iter(picked))
    boosted = spark.createDataFrame(
        [(i, 8.0 if i == target else 1.0) for i in range(50)],
        "doc_id bigint, w double")
    picked2 = {r.doc_id
               for r in weighted_sample(boosted, "w", 10).collect()}
    assert target in picked2


def test_nonpositive_weights_excluded(spark):
    from graphraft_spark.data.ops import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id bigint, w double")
    got = [r.doc_id for r in weighted_sample(df, "w", 10).collect()]
    assert got == [3]


def test_empirical_proportionality(spark):
    """Across many salts, a weight-9 item should be drawn into a 1-of-N
    sample roughly 9x as often as a weight-1 item."""
    from graphraft_spark.data.ops import weighted_sample

    rows = [(0, 9.0)] + [(i, 1.0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    hits = 0
    trials = 60
    for t in range(trials):
        [r] = weighted_sample(df, "w", 1, salt=f"s{t}").collect()
        hits += r.doc_id == 0
    # expected inclusion p = 9/18 = 0.5; binomial 3-sigma band
    assert 0.3 < hits / trials < 0.7


def test_per_group_draws_are_independent_and_capped(spark):
    from graphraft_spark.data.ops import (weighted_sample,
                                          weighted_sample_per_group)

    rows = [(i, "a" if i < 60 else "b", float(i % 5 + 1))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, "
                                     "w double")
    out = weighted_sample_per_group(df, "w", 7, group_col="source") \
        .collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.source, []).append(r.doc_id)
    assert sorted(by_g) == ["a", "b"]
    assert all(len(v) == 7 for v in by_g.values())
    # a group's draw must equal the ungrouped draw restricted to it
    import pyspark.sql.functions as F
    solo = {r.doc_id for r in weighted_sample(
        df.filter(F.col("source") == "a"), "w", 7).collect()}
    assert set(by_g["a"]) == solo


def test_scd2_compact_hand_history(spark):
    """a: x→x→y→x collapses to 3 versions with closed intervals;
    single-version key stays current from its first row."""
    from graphraft_spark.data.ops import scd2_compact

    rows = [
        ("a", 1, 10, "x"), ("a", 2, 11, "x"),
        ("a", 3, 12, "y"), ("a", 4, 13, "x"),
        ("b", 1, 14, "z"),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts bigint, eid bigint, attr string")
    out = scd2_compact(df, "k", "ts", ("attr",), tiebreak_col="eid") \
        .collect()
    a = sorted([(r.ts, r.attr, r.valid_to, r.is_current)
                for r in out if r.k == "a"])
    assert a == [(1, "x", 3, False), (3, "y", 4, False),
                 (4, "x", None, True)]
    [b] = [r for r in out if r.k == "b"]
    assert (b.ts, b.is_current) == (1, True)
