"""Event-stream operators: batch-equivalent windowed aggregations with
oracles, plus a true Structured Streaming execution (rows-only check —
the incremental state-store execution itself is not SQL-expressible;
its *result* equals the batch plan, which pytest asserts separately).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.registry import register
from graphraft_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sliding_counts,
    tumbling_counts,
)
from graphraft_spark.streaming.events import load_events


@register(
    "st_tumbling_agg",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
""")
def st_tumbling_agg(spark, sf_dir):
    """Tumbling 1-hour windows per event_type (batch semantics of the
    streaming plan — identical groupBy(window(ts)))."""
    return tumbling_counts(load_events(spark, sf_dir), "1 hour")


@register(
    "st_sliding_agg",
    oracle="""
WITH starts AS (
    SELECT event_type, ts,
           to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                        - s.off)::TIMESTAMP AS window_start
    FROM events, (VALUES (0), (1800)) s(off)
    WHERE epoch(ts) - (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                       - s.off) < 3600
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM starts GROUP BY 1, 2
""")
def st_sliding_agg(spark, sf_dir):
    """Sliding 1-hour/30-min windows: each event in 2 epoch-aligned
    windows (Spark window(ts, '1 hour', '30 minutes'))."""
    return sliding_counts(load_events(spark, sf_dir), "1 hour", "30 minutes")


@register(
    "st_json_props",
    oracle="""
SELECT event_type,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
""")
def st_json_props(spark, sf_dir):
    """Semi-structured props column: JSON field extraction + aggregate
    (get_json_object stays in codegen; no UDF)."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.min(k).alias("min_k"), F.max(k).alias("max_k"),
        F.count("*").alias("n"))


@register("st_stream_tumbling")  # rows-only: true incremental execution
def st_stream_tumbling(spark, sf_dir):
    """REAL Structured Streaming run: file-source stream over the events
    parquet, watermarked tumbling agg, availableNow trigger into a
    memory sink.  Driver records a rows-only check; pytest asserts
    result == batch plan."""
    import os
    import shutil

    # the file source wants a directory; stage the (read-only) testdata
    # file into a scratch dir inside the repo
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    stage = f"{repo}/.scratch/events_stream_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(stage, exist_ok=True)
    dst = f"{stage}/events.parquet"
    if not os.path.exists(dst):
        shutil.copy(f"{sf_dir}/events.parquet", dst)

    stream = read_events_stream(spark, stage)
    agg = tumbling_counts(stream, "1 hour", watermark="2 hours")
    return run_stream_to_memory(agg, "st_stream_tumbling_sink")
