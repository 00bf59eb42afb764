"""Temporal-join operators over the events table (as-of enrichment).

The as-of join is a §2.H extension: the reference has no time-series
surface, but a training-data pipeline enriching events with the latest
per-key state needs it, and Spark lacks a built-in.  DuckDB's native
ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.registry import register
from graphraft_spark.streaming.events import load_events
from graphraft_spark.sources.pq_cache import load_pq


@register(
    "tm_asof_enrich",
    oracle="""
WITH snaps AS (
    SELECT user_id, ts, MAX(value) AS state_value
    FROM events WHERE event_id % 20 = 0
    GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       l.value, r.state_value
FROM events l
ASOF LEFT JOIN snaps r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""")
def tm_asof_enrich(spark, sf_dir):
    """As-of enrichment: every event carries the latest prior snapshot
    value for its user (backward inclusive; null before the first
    snapshot).  One shuffle by user_id, linear per-partition pass —
    no inequality-join blowup (ops/temporal.py)."""
    from graphraft_spark.ops.temporal import asof_join

    events = load_events(spark, sf_dir)
    snaps = (events.filter(F.col("event_id") % 20 == 0)
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("state_value")))
    out = asof_join(events.select("event_id", "user_id", "ts", "value"),
                    snaps, on="ts", by=("user_id",),
                    value_cols=("state_value",))
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value", "state_value")


@register(
    "tm_interval_join",  # promoted r12 (seventh wave)
    oracle="""
WITH incidents AS (
    SELECT event_id AS incident_id, ts AS start_ts,
           ts + INTERVAL 10 MINUTE AS end_ts
    FROM events WHERE event_type = 'error'
)
SELECT i.incident_id, COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e
JOIN incidents i ON e.ts >= i.start_ts AND e.ts <= i.end_ts
GROUP BY i.incident_id
""")
def tm_interval_join(spark, sf_dir):
    """Range-join coverage: events inside each 10-minute incident
    window (opened by every error event), counted per incident — via
    the bucketed-grid equi-join (ops/temporal.py), not a nested loop."""
    from graphraft_spark.ops.temporal import interval_join_bucketed

    events = load_events(spark, sf_dir)
    incidents = (events.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("incident_id"),
                         F.col("ts").alias("start_ts"),
                         (F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
                         .alias("end_ts")))
    joined = interval_join_bucketed(
        events.select("user_id", "ts"), incidents,
        on="ts", start="start_ts", end="end_ts", bucket_seconds=600)
    return joined.groupBy("incident_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"))


@register(
    "ev_funnel",  # promoted r13 (eighth wave)
    oracle="""
WITH s1 AS (
    SELECT user_id AS u, MIN(epoch_us(ts)) AS t1
    FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
    SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS t2
    FROM events e JOIN s1 ON s1.u = e.user_id AND epoch_us(e.ts) > s1.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (
    SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS t3
    FROM events e JOIN s2 ON s2.u = e.user_id AND epoch_us(e.ts) > s2.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id),
j AS (SELECT s1.u, t1, t2, t3
      FROM s1 LEFT JOIN s2 ON s2.u = s1.u LEFT JOIN s3 ON s3.u = s1.u)
SELECT 1 AS step, 'view' AS step_name, COUNT(t1) AS n_users,
       CAST(NULL AS BIGINT) AS n_converted FROM j
UNION ALL
SELECT 2, 'click', COUNT(t2), CAST(NULL AS BIGINT) FROM j
UNION ALL
SELECT 3, 'purchase', COUNT(t3),
       COALESCE(SUM(CASE WHEN t3 IS NOT NULL
                          AND t3 - t1 <= 604800000000
                         THEN 1 ELSE 0 END), 0) FROM j
""")
def ev_funnel(spark, sf_dir):
    """Anchored-greedy funnel view→click→purchase within 7 days
    (ops/funnel.py): each step is a pushdown-filtered scan joined to
    the previous step's per-user frame — K user-keyed shuffles, never
    per-event-pair work.  Timestamps compare in epoch microseconds on
    both engines."""
    from graphraft_spark.ops.funnel import funnel_counts

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    return funnel_counts(ev, ["view", "click", "purchase"],
                         within_seconds=7 * 86400)


@register(
    "ev_retention",  # promoted r13 (eighth wave)
    oracle="""
WITH ev AS (
    SELECT user_id AS u, epoch_us(ts) // 604800000000 AS period
    FROM events),
firsts AS (SELECT u, MIN(period) AS cohort FROM ev GROUP BY u),
active AS (SELECT DISTINCT u, period FROM ev)
SELECT f.cohort, a.period - f.cohort AS periods_since,
       COUNT(DISTINCT a.u) AS n_users
FROM active a JOIN firsts f ON f.u = a.u
GROUP BY f.cohort, a.period - f.cohort
""")
def ev_retention(spark, sf_dir):
    """Weekly cohort retention (ops/funnel.py:retention_cohorts):
    fixed-width epoch periods (identical arithmetic on any engine,
    no calendar-week convention), two user-keyed shuffles."""
    from graphraft_spark.ops.funnel import retention_cohorts

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    return retention_cohorts(ev)


@register(
    "tm_window_percentiles", extra=True,
    oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(max(value), 6) AS p100
FROM events
GROUP BY 1, 2
""")
def tm_window_percentiles(spark, sf_dir):
    """Exact per-window order statistics (p50/p95/max of event value
    per day × type) — the latency-dashboard aggregate, done EXACTLY
    with Spark's interpolating percentile (matches quantile_cont's R-7
    definition).  Map-side partial aggregation applies to count/max;
    the percentile's sort is bounded per (day, type) group.  At 100 TB
    swap in approx_percentile (t-digest sketch, mergeable) — the
    sketches module documents the tolerance."""
    e = load_pq(spark, f"{sf_dir}/events.parquet")
    return (e.groupBy(
        F.to_date("ts").cast("string").alias("day"),
        "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
             F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
             F.round(F.max("value"), 6).alias("p100")))


@register(
    "tm_user_rfm", extra=True,
    oracle="""
WITH anchor AS (SELECT max(ts) AS mx FROM events)
SELECT user_id,
       CAST(epoch_us((SELECT mx FROM anchor)) - epoch_us(max(ts))
            AS BIGINT) AS recency_us,
       CAST(count(*) AS BIGINT) AS frequency,
       ROUND(sum(value), 6) AS monetary,
       CAST(count(DISTINCT event_type) AS BIGINT) AS breadth
FROM events
GROUP BY user_id
""")
def tm_user_rfm(spark, sf_dir):
    """Per-user RFM+breadth behavioral features (recency vs the corpus
    max timestamp, event count, summed value, distinct event types) —
    the standard feature block for churn/quality models.  One grouped
    aggregate plus a 1-row broadcast anchor; all map-side-combinable
    except the exact distinct (which partial-aggregates on the
    composite key first)."""
    e = load_pq(spark, f"{sf_dir}/events.parquet")
    anchor = F.broadcast(e.agg(F.max("ts").alias("mx")))
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    mx_us = F.unix_micros(F.col("mx").cast("timestamp_ltz"))
    return (e.crossJoin(anchor)
            .groupBy("user_id")
            .agg(F.min(mx_us - us).alias("recency_us"),
                 F.count("*").alias("frequency"),
                 F.round(F.sum("value"), 6).alias("monetary"),
                 F.countDistinct("event_type").alias("breadth")))


@register(
    "tm_scd2_versions", extra=True,  # demoted r13 (eighth wave)
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_attr,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
    FROM events
),
points AS (
    SELECT user_id, ts, event_id, event_type
    FROM ordered
    WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_attr
)
SELECT user_id, event_type,
       CAST(ts AS VARCHAR) AS valid_from,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS VARCHAR) AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        IS NULL) AS is_current
FROM points
""")
def tm_scd2_versions(spark, sf_dir):
    """SCD type-2 dimension build (data/ops.py:scd2_compact): compact
    each user's event_type change log into versioned rows with
    valid_from/valid_to intervals and a current flag — merge-free
    dimension versioning on plain parquet.  One key shuffle + two
    window passes."""
    from graphraft_spark.data.ops import scd2_compact

    e = load_pq(spark, f"{sf_dir}/events.parquet") \
        .select("user_id", "ts", "event_id", "event_type")
    out = scd2_compact(e, "user_id", "ts", ("event_type",),
                       tiebreak_col="event_id")
    return out.select("user_id", "event_type",
                      F.col("valid_from").cast("string"),
                      F.col("valid_to").cast("string"),
                      "is_current")


@register(
    "tm_value_outliers", extra=True,
    oracle="""
WITH stats AS (
    SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.mu) / s.sd, 6) AS zscore
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE abs((e.value - s.mu) / s.sd) > 3
""")
def tm_value_outliers(spark, sf_dir):
    """Per-type z-score outlier flags (|z| > 3) on event values — the
    metric-anomaly sweep.  Stats are one map-side-combined aggregate
    broadcast back onto the scan; at 100 TB swap the exact stddev for
    the same one-pass partials (it already is one)."""
    e = load_pq(spark, f"{sf_dir}/events.parquet")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd"))
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (e.join(F.broadcast(stats), "event_type")
            .filter(F.abs(z) > 3)
            .select("event_id", "event_type",
                    F.round(z, 6).alias("zscore")))


@register(
    "tm_scd2_lookup", extra=True,
    oracle="""
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec, value
    FROM events
),
b AS (
    SELECT user_id, MIN(ts_sec) AS t0, MAX(ts_sec) AS t3
    FROM e GROUP BY user_id
),
dim AS (
    SELECT user_id, t0 AS from_sec,
           t0 + CAST(floor((t3 - t0) * 2 / 5.0) AS BIGINT) AS to_sec,
           'basic' AS plan FROM b
    UNION ALL
    SELECT user_id, t0 + CAST(floor((t3 - t0) * 3 / 5.0) AS BIGINT),
           t3 + 1, 'pro' FROM b
)
SELECT e.event_id, e.user_id, e.ts_sec, e.value, d.plan
FROM e LEFT JOIN dim d
  ON e.user_id = d.user_id
 AND d.from_sec <= e.ts_sec AND e.ts_sec < d.to_sec
""")
def tm_scd2_lookup(spark, sf_dir):
    """SCD Type-2 point-in-time lookup (ops/temporal.py scd2_lookup):
    a two-version-per-user plan dimension is derived deterministically
    from each user's event-time span — 'basic' over the first 40%,
    'pro' over the last 40%, a COVERAGE GAP in the middle 20% (events
    there must resolve to null, pinning the validity mask).  The engine
    runs the union+window as-of formulation (one shuffle by user, no
    per-fact row identity); the oracle replays it as a plain validity
    equi-join — well-formed SCD2 makes them equal."""
    from graphraft_spark.ops.temporal import scd2_lookup

    e = (load_events(spark, sf_dir)
         .select("event_id", "user_id",
                 F.col("ts").cast("long").alias("ts_sec"), "value"))
    b = e.groupBy("user_id").agg(F.min("ts_sec").alias("t0"),
                                 F.max("ts_sec").alias("t3"))
    span = F.col("t3") - F.col("t0")
    v0 = b.select(
        "user_id", F.col("t0").alias("valid_from"),
        (F.col("t0") + F.floor(span * 2 / 5).cast("long"))
        .alias("valid_to"), F.lit("basic").alias("plan"))
    v1 = b.select(
        "user_id",
        (F.col("t0") + F.floor(span * 3 / 5).cast("long"))
        .alias("valid_from"),
        (F.col("t3") + 1).alias("valid_to"), F.lit("pro").alias("plan"))
    return scd2_lookup(e, v0.unionByName(v1), key="user_id",
                       ts_col="ts_sec", payload=("plan",))


@register(
    "tm_resample_ffill", extra=True,  # demoted r12 (green r9-r11)
    oracle="""
WITH e AS (
    SELECT user_id, epoch_us(ts) // 1000000 AS ts_sec, value FROM events
),
b AS (
    SELECT user_id, (ts_sec // 86400) * 86400 AS bucket_ts,
           MAX(value) AS v
    FROM e GROUP BY user_id, (ts_sec // 86400) * 86400
),
bounds AS (
    SELECT user_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
    FROM b GROUP BY user_id
),
grid AS (
    SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS bucket_ts
    FROM bounds
),
j AS (
    SELECT g.user_id, g.bucket_ts, b.v
    FROM grid g LEFT JOIN b USING (user_id, bucket_ts)
)
SELECT user_id, bucket_ts,
       ROUND(last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_ts
           ROWS UNBOUNDED PRECEDING), 6) AS value_ffill,
       v IS NOT NULL AS is_observed
FROM j
""")
def tm_resample_ffill(spark, sf_dir):
    """Fixed-grid densification (ops/temporal.py resample_ffill): each
    user's irregular event stream resampled onto a daily grid — bucket
    aggregate MAX(value), every tick between the user's first and last
    active day emitted, gaps forward-filled from the last observed
    bucket.  One keyed shuffle (map-side-combined bucket aggregate),
    per-key bounded grid explode, one ordered window — the oracle
    replays it with generate_series + IGNORE NULLS last_value."""
    from graphraft_spark.ops.temporal import resample_ffill

    e = (load_events(spark, sf_dir)
         .select("user_id", F.col("ts").cast("long").alias("ts_sec"),
                 "value"))
    out = resample_ffill(e, key="user_id", on="ts_sec", value="value",
                         step=86_400, agg="max")
    return out.select("user_id", "bucket_ts",
                      F.round("value_ffill", 6).alias("value_ffill"),
                      "is_observed")


@register(
    "tm_rolling_features", extra=True,  # demoted r10 (driver-green r8-r9; temporal keeps asof/resample/scd2)
    oracle="""
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec, value
    FROM events
)
SELECT event_id, user_id, ts_sec, value,
       CAST(COUNT(value) OVER w AS BIGINT) AS w_count,
       ROUND(SUM(value) OVER w, 6) AS w_sum,
       ROUND(AVG(value) OVER w, 6) AS w_mean,
       ROUND(MIN(value) OVER w, 6) AS w_min,
       ROUND(MAX(value) OVER w, 6) AS w_max
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""")
def tm_rolling_features(spark, sf_dir):
    """Trailing-hour behavioral features (ops/temporal.py
    rolling_features): per event, count/sum/mean/min/max of the user's
    values over the previous 3600s inclusive — one user-keyed shuffle
    + a sliding range-frame pass, never the quadratic self-join.  The
    oracle is the identical RANGE window in DuckDB."""
    from graphraft_spark.ops.temporal import rolling_features

    e = (load_events(spark, sf_dir)
         .select("event_id", "user_id",
                 F.col("ts").cast("long").alias("ts_sec"), "value"))
    return rolling_features(e, key="user_id", on="ts_sec",
                            value="value", window_s=3600)
