"""Temporal join operators Spark's DataFrame API lacks natively.

As-of join (nearest prior match per key) is the workhorse of
time-series enrichment — attach the latest snapshot/state at or before
each event.  Spark has no built-in; the naive formulation
(inequality join + per-row max) explodes quadratically per key.

Implementation here is the union + ordered-window formulation:
tag both sides, union them, and carry the right side's payload forward
with ``last(ignorenulls)`` over a per-key time-ordered window.  Cost is
ONE shuffle by key + a linear per-partition pass — no join blowup, no
skew amplification beyond the key distribution itself (hot keys can be
salted upstream like any windowed op).  At 100 TB both inputs arrive
bucketed by the key and the shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: tuple[str, ...] = ("user_id",),
              value_cols: tuple[str, ...] | None = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with ``right.on <= left.on`` (direction='backward', inclusive —
    ties prefer the right row) within the same ``by`` key; null when no
    prior right row exists.  'forward' attaches the earliest right row
    with ``right.on >= left.on``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    vcols = list(value_cols if value_cols is not None else
                 [c for c in right.columns
                  if c not in (on, *by)])
    lcols = left.columns
    for c in vcols:
        if c in lcols:
            raise ValueError(f"value column {c!r} collides with left")

    l_tagged = left.select("*", F.lit(1).alias("_side"),
                           *[F.lit(None).cast(right.schema[c].dataType)
                             .alias(c) for c in vcols])
    r_tagged = right.select(*by, F.col(on), F.lit(0).alias("_side"), *vcols)
    r_tagged = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in (*by, on) else F.col(c) for c in lcols],
        "_side", *vcols)
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left at equal ts ⇒ inclusive match
        w = (Window.partitionBy(*by).orderBy(F.asc(on), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, 0))
        picked = [F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                  for c in vcols]
    else:
        w = (Window.partitionBy(*by).orderBy(F.desc(on), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, 0))
        picked = [F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                  for c in vcols]
    out = u.select(*lcols, "_side", *picked)
    return out.filter(F.col("_side") == 1).drop("_side")


def interval_join_bucketed(left: DataFrame, intervals: DataFrame,
                           on: str = "ts", start: str = "start",
                           end: str = "end",
                           bucket_seconds: int = 3600) -> DataFrame:
    """Range (interval-containment) join without a nested loop: both
    sides map onto a time-bucket grid — intervals explode to every
    bucket they touch, point rows to their own bucket — then an
    EQUI-join on the bucket id + an exact containment refine.

    Spark's native plan for ``l.ts BETWEEN i.start AND i.end`` is
    BroadcastNestedLoopJoin (fine only while the interval side
    broadcasts); the grid turns it into a hash join that shuffles both
    sides by bucket — linear in rows + interval spans, cluster-scalable.
    Pick ``bucket_seconds`` ≈ typical interval length so each interval
    explodes to O(1) buckets."""
    b = F.lit(bucket_seconds)
    lb = left.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(on)) / b).cast("bigint"))
    ib = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start)) / b).cast("bigint"),
            F.floor(F.unix_timestamp(F.col(end)) / b).cast("bigint"))))
    return (
        lb.join(ib, "_b")
        .filter((F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end)))
        .drop("_b")
    )
