"""Event-sequence analytics over the events stream: funnels and cohort
retention — the MATCH_RECOGNIZE-shaped surface Spark lacks natively,
expressed as chained per-user aggregates.

Funnel semantics (stated exactly, because definitions vary):
anchored-greedy — the funnel is anchored at each user's FIRST step-1
event; each later step binds to the user's earliest matching event
strictly after the previous step's bound time; the funnel CONVERTS if
every step bound and the total span (last − first) is within
``within_seconds``.  This is deterministic, oracle-expressible, and the
common product-analytics definition.

Scale shape: step k is one filtered scan of the events table (the
event-type predicate pushes into the parquet scan) joined to the
previous step's per-user frame — |users| rows, shrinking monotonically
per step.  K steps = K pushdown scans + K user-keyed shuffles; nothing
is ever per-event-pair, and no per-user window materializes the user's
full history.  Timestamps compare in epoch MICROSECONDS on both
engines so sub-second boundaries cannot disagree with an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _us(col):
    """Epoch microseconds of a (NTZ, UTC-session) timestamp — the
    portable comparison unit (DuckDB: epoch_us).  The explicit LTZ cast
    is required because the session's default timestampType is NTZ and
    unix_micros only takes LTZ; with the UTC session timezone the
    conversion is the identity on the underlying instant."""
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


def funnel(events: DataFrame, steps: list[str],
           within_seconds: int | None = None,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Per-user funnel binding: (user, t1..tk, converted).

    Users appear iff they bound step 1; ``t2..tk`` are null where the
    chain broke; ``converted`` is true iff every step bound and the
    span fits ``within_seconds`` (always true when None).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(F.col(user_col).alias("user"))
           .agg(F.min(_us(ts_col)).alias("t1")))
    for k, step in enumerate(steps[1:], start=2):
        # cur feeds TWO branches per step (the binding join and the
        # carry-forward left join); without truncation each embedding
        # doubles, so step k re-plans step 1's scan 2^(k-1) times —
        # the lazy checkpoint computes each step's frame exactly once
        cur = cur.localCheckpoint(eager=False)
        nxt = (events.filter(F.col(type_col) == step)
               .select(F.col(user_col).alias("u"),
                       _us(ts_col).alias("ts_us")))
        bound = (
            nxt.join(cur, (F.col("u") == F.col("user"))
                     & (F.col("ts_us") > F.col(f"t{k - 1}")))
            .groupBy("u").agg(F.min("ts_us").alias(f"t{k}")))
        cur = cur.join(bound, cur.user == bound.u, "left").drop("u")
    last = f"t{len(steps)}"
    if within_seconds is None:
        converted = F.col(last).isNotNull()
    else:
        converted = (F.col(last).isNotNull()
                     & ((F.col(last) - F.col("t1"))
                        <= within_seconds * 1_000_000))
    return cur.withColumn("converted", converted)


def funnel_counts(events: DataFrame, steps: list[str],
                  within_seconds: int | None = None, **kw) -> DataFrame:
    """One row per funnel step: users reaching it, plus the converted
    count on the last row's ``n_converted`` (null for earlier steps)."""
    f = funnel(events, steps, within_seconds, **kw)
    aggs = []
    for k, step in enumerate(steps, start=1):
        aggs.append(F.count(f"t{k}").alias(f"n_step{k}"))
    counts = f.agg(*aggs,
                   F.coalesce(F.sum(F.col("converted").cast("long")),
                              F.lit(0)).alias("n_converted"))
    # unpivot to (step, step_name, n_users [, n_converted on last])
    rows = [
        F.struct(F.lit(k).alias("step"), F.lit(s).alias("step_name"),
                 F.col(f"n_step{k}").alias("n_users"),
                 (F.col("n_converted") if k == len(steps)
                  else F.lit(None).cast("bigint")).alias("n_converted"))
        for k, s in enumerate(steps, start=1)]
    return (counts.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.step", "r.step_name", "r.n_users", "r.n_converted"))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      period_seconds: int = 7 * 86400) -> DataFrame:
    """Classic cohort retention: users bucketed by their first-activity
    period; one row per (cohort_period, periods_since) with the count
    of cohort users active then.  Periods are fixed-width windows from
    the epoch (not calendar weeks — identical arithmetic on any
    engine).  Two user-keyed shuffles total."""
    p_us = period_seconds * 1_000_000
    us = _us(ts_col)
    # exact integer bucketing (no float division near period boundaries)
    bucket = ((us - F.pmod(us, F.lit(p_us))) / F.lit(p_us)).cast("bigint")
    ev = events.select(F.col(user_col).alias("user"),
                       bucket.alias("period"))
    firsts = ev.groupBy("user").agg(F.min("period").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(firsts, "user")
        .groupBy("cohort", (F.col("period") - F.col("cohort"))
                 .alias("periods_since"))
        .agg(F.countDistinct("user").alias("n_users")))
