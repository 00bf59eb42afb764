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

    The matched right row travels as ONE struct through the window
    carry, so the join is ROW-ATOMIC — a NULL payload field in the
    matched row stays NULL instead of tearing in an older row's value
    (the semantics of pandas ``merge_asof`` and DuckDB ``ASOF JOIN``,
    which is also this operator's oracle; per-column
    ``last(ignorenulls)`` silently diverges on sparse payloads).
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    vcols = list(value_cols if value_cols is not None else
                 [c for c in right.columns
                  if c not in (on, *by)])
    lcols = left.columns
    for c in vcols:
        if c in lcols:
            raise ValueError(f"value column {c!r} collides with left")
    if "_asof_v" in (*lcols, *vcols):
        raise ValueError("column name '_asof_v' is reserved")

    v_type = T.StructType([right.schema[c] for c in vcols])
    l_tagged = left.select("*", F.lit(1).alias("_side"),
                           F.lit(None).cast(v_type).alias("_asof_v"))
    r_tagged = right.select(
        *by, F.col(on), F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in vcols]).alias("_asof_v"))
    r_tagged = r_tagged.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in (*by, on) else F.col(c) for c in lcols],
        "_side", "_asof_v")
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left at equal ts ⇒ inclusive match
        w = (Window.partitionBy(*by).orderBy(F.asc(on), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*by).orderBy(F.desc(on), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, 0))
    picked = F.last(F.col("_asof_v"), ignorenulls=True).over(w)
    out = u.select(*lcols, "_side", picked.alias("_asof_v"))
    return (out.filter(F.col("_side") == 1)
            .select(*lcols, *[F.col("_asof_v")[c].alias(c)
                              for c in vcols]))


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


def scd2_lookup(facts: DataFrame, dim: DataFrame, key: str,
                ts_col: str = "ts", from_col: str = "valid_from",
                to_col: str = "valid_to",
                payload: tuple[str, ...] | None = None) -> DataFrame:
    """Point-in-time (SCD Type-2) dimension lookup: for every fact row,
    attach the dimension version whose validity interval covers the
    fact's timestamp (``from <= ts < to``); null payload when no
    version covers it.

    Shape: the :func:`asof_join` union+window formulation on
    ``valid_from`` (ONE shuffle keyed by ``key``, linear per-partition
    pass — no interval-join blowup, no per-fact row identity needed).
    The whole dimension version travels as ONE struct so the as-of
    pick is atomic: a NULL ``valid_to`` (the common open/current-row
    SCD2 convention) or a NULL payload field in the latest version can
    never tear in a stale value from an older version — per-column
    ``last(ignorenulls)`` would.  The carried version is then masked
    out where ``ts >= valid_to`` (a gap in coverage); NULL ``valid_to``
    means the version is open and covers every later timestamp.
    Well-formed SCD2 (contiguous, non-overlapping) matches the covering
    version exactly; overlaps resolve deterministically to the LATEST
    started version (max ``valid_from`` ≤ ts — the as-of pick)."""
    pay = list(payload or [c for c in dim.columns
                           if c not in (key, from_col, to_col)])
    if "_scd2_to" in pay:
        raise ValueError("payload column name '_scd2_to' is reserved")
    dim2 = dim.select(
        F.col(key), F.col(from_col).alias(ts_col),
        F.struct(*[F.col(c) for c in pay],
                 F.col(to_col).alias("_scd2_to")).alias("_scd2_v"))
    out = asof_join(facts, dim2, on=ts_col, by=(key,),
                    value_cols=["_scd2_v"], direction="backward")
    v = F.col("_scd2_v")
    covered = v.isNotNull() & (v["_scd2_to"].isNull()
                               | (v["_scd2_to"] > F.col(ts_col)))
    masked = [F.when(covered, v[c]).otherwise(F.lit(None)).alias(c)
              for c in pay]
    return out.select(*facts.columns, *masked)


def resample_ffill(df: DataFrame, key: str, on: str = "ts_sec",
                   value: str = "value", step: int = 86_400,
                   agg: str = "max") -> DataFrame:
    """Fixed-grid resampling with forward fill: per ``key``, bucket
    observations onto a ``step``-second grid (bucket aggregate =
    ``agg`` over the bucket's observations — a commutative built-in,
    so it map-side combines), emit EVERY grid tick between the key's
    first and last bucket, and carry the last observed bucket value
    forward across the gaps.

    Returns (key, bucket_ts, value_ffill, is_observed) — the classic
    time-series densification feeding rolling features / training
    windows where raw event streams are irregular.

    Scale shape: the bucket aggregate is one keyed shuffle with
    map-side combine; the grid materializes ``span/step`` rows per key
    via ``sequence`` + ``explode`` (pick ``step`` so per-key grids stay
    bounded — a year of daily ticks is 365 rows); the fill is one
    per-key ordered window over that bounded grid.  Everything stays
    in whole-stage codegen; at 100 TB the only shuffle is by ``key``.
    """
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    bucket = (F.floor(F.col(on) / step) * step).cast("long")
    bucketed = (df.select(F.col(key), bucket.alias("bucket_ts"),
                          F.col(value))
                .groupBy(key, "bucket_ts")
                .agg(getattr(F, agg)(value).alias("_v")))
    bounds = bucketed.groupBy(key).agg(F.min("bucket_ts").alias("_lo"),
                                       F.max("bucket_ts").alias("_hi"))
    grid = bounds.select(
        key, F.explode(F.sequence(F.col("_lo"), F.col("_hi"),
                                  F.lit(step).cast("long")))
        .alias("bucket_ts"))
    j = grid.join(bucketed, [key, "bucket_ts"], "left")
    w = (Window.partitionBy(key).orderBy("bucket_ts")
         .rowsBetween(Window.unboundedPreceding, 0))
    return j.select(
        key, "bucket_ts",
        F.last("_v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("_v").isNotNull().alias("is_observed"))


def rolling_features(df: DataFrame, key: str, on: str = "ts_sec",
                     value: str = "value",
                     window_s: int = 3600) -> DataFrame:
    """Trailing time-RANGE window features per key: for every row,
    count / sum / mean / min / max of ``value`` over the last
    ``window_s`` seconds INCLUDING the current row — the standard
    behavioral-feature block (activity in the last hour/day) joined
    onto training examples.

    One shuffle by ``key``, then a linear ordered pass per partition
    (Spark's range-frame window keeps a sliding aggregate buffer —
    no per-row rescan, no self-join blowup like the naive
    ``e1.ts BETWEEN e2.ts-W AND e2.ts`` formulation).  Hot keys are
    the only skew axis, same as any keyed window."""
    w = (Window.partitionBy(key).orderBy(F.col(on).cast("long"))
         .rangeBetween(-window_s, 0))
    return df.select(
        "*",
        F.count(value).over(w).alias("w_count"),
        F.round(F.sum(value).over(w), 6).alias("w_sum"),
        F.round(F.avg(value).over(w), 6).alias("w_mean"),
        F.round(F.min(value).over(w), 6).alias("w_min"),
        F.round(F.max(value).over(w), 6).alias("w_max"))
