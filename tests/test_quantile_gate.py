"""ops/quantile.py keep_top_fraction: exact row-for-row equivalence
with the percent_rank window gate over random frames (ties, boundary
ranks), edge cases, and the no-global-row-window plan property."""

import random

import pytest

from pyspark.sql import Window, functions as F

from graphraft_spark.ops.quantile import keep_top_fraction


def _window_gate(df, frac):
    pr = F.percent_rank().over(Window.orderBy("v", "id"))
    return df.withColumn("_pr", pr).filter(F.col("_pr") >= frac) \
        .select("id", "v")


@pytest.mark.parametrize("n,dups,num,den", [
    (101, 1, 1, 4),    # unique values
    (100, 7, 1, 4),    # heavy ties — boundary group tiebreak matters
    (53, 3, 3, 10),    # non-quarter fraction
    (40, 40, 1, 2),    # ALL rows share one value — boundary == corpus
    (2, 1, 1, 4),      # minimal N where percent_rank is defined
])
def test_matches_percent_rank_gate(spark, n, dups, num, den):
    rng = random.Random(n * 31 + dups)
    rows = [(i, round(rng.randrange(dups * 10) / 7.0, 6) if dups < n
             else 1.0) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = sorted((r.id, r.v) for r in
                 keep_top_fraction(df, "v", "id", num, den).collect())
    want = sorted((r.id, r.v) for r in
                  _window_gate(df, num / den).collect())
    assert got == want and got  # non-empty: the gate keeps something


def test_single_row_dropped_like_percent_rank(spark):
    df = spark.createDataFrame([(1, 0.5)], "id bigint, v double")
    assert keep_top_fraction(df, "v", "id").count() == 0
    assert _window_gate(df, 0.25).count() == 0


def test_invalid_fraction_raises(spark):
    df = spark.createDataFrame([(1, 0.5)], "id bigint, v double")
    for num, den in ((0, 4), (4, 4), (5, 4), (-1, 4)):
        with pytest.raises(ValueError, match="frac"):
            keep_top_fraction(df, "v", "id", num, den)


def test_no_global_row_window_in_plan(spark):
    """The corpus is never globally sorted or ranked: every Window in
    the optimized plan is partitioned (the histogram's global window
    runs over the bounded value-domain frame, which Catalyst plans
    from the aggregate, not the corpus scan)."""
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)],
                               "id bigint, v double")
    plan = keep_top_fraction(df, "v", "id")._jdf.queryExecution() \
        .executedPlan().toString()
    # the boundary window partitions by the value column
    assert "Window" in plan
    # no global row-level Sort feeding a window over the raw input:
    # the only SinglePartition exchanges sit above aggregates
    # (histogram / count), whose input is already reduced
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i:i + 4])
            assert ("HashAggregate" in below or "Scan" not in below), below


@pytest.mark.parametrize("n,dups,buckets", [
    (100, 1, 4), (97, 6, 4), (50, 5, 7), (3, 1, 4), (8, 8, 3),
])
def test_exact_ntile_matches_window_ntile(spark, n, dups, buckets):
    from graphraft_spark.ops.quantile import exact_ntile

    rng = random.Random(n + buckets)
    rows = [(i, float(rng.randrange(max(n // dups, 1)))) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = {r.id: r.bucket for r in
           exact_ntile(df, "v", "id", buckets).collect()}
    want = {r.id: r.q for r in df.withColumn(
        "q", F.ntile(buckets).over(Window.orderBy("v", "id"))).collect()}
    assert got == want


def test_exact_global_rank_matches_row_number(spark):
    from graphraft_spark.ops.quantile import exact_global_rank

    rng = random.Random(4)
    rows = [(i, float(rng.randrange(9))) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = {r.id: r.rank for r in
           exact_global_rank(df, "v", "id").collect()}
    want = {r.id: r.rn for r in df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))).collect()}
    assert got == want
