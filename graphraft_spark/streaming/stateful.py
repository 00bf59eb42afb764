"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics built-in windows can't express
(per-key custom state machines), per the north-star streaming surface.

Sessionization: group events per user into activity sessions that close
after ``gap_s`` seconds of inactivity.  Works on a real stream (state
store, GroupStateTimeout) and has a batch twin (window-based) used as
the correctness oracle — sessionize_batch == sessionize_stream on the
same data (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events bigint, sum_value double")
STATE_SCHEMA = "start bigint, last bigint, n bigint, sv double"


def sessionize_stream(events: DataFrame, gap_s: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization: custom per-user state (session start,
    last-seen, aggregates).  A session is emitted when a later event
    for the same user arrives past the gap; the trailing open session
    per user stays in state (a production deployment adds event-time
    timeouts to flush them — kept out here because timeout-driven empty
    micro-batches interact badly with availableNow one-shot runs).
    Closed-session parity with sessionize_batch is asserted in tests.
    """

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        # normalize to epoch-nanos regardless of the Arrow→pandas
        # resolution (datetime64[ns] vs [us] differs across pandas/Arrow)
        ts_ns = pd.Series(
            rows["ts"].to_numpy().astype("datetime64[ns]").astype("int64"))
        gap_ns = gap_s * 1_000_000_000
        out = []
        cur = list(state.get) if state.exists else None
        for i in range(len(rows)):
            t, v = int(ts_ns.iloc[i]), float(rows["value"].iloc[i])
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] > gap_ns:
                out.append(cur)
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
        if cur is not None:
            state.update(tuple(cur))
        if out:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(s, unit="ns"),
                "session_end": pd.Timestamp(e, unit="ns"),
                "n_events": n, "sum_value": round(sv, 4)}
                for s, e, n, sv in out])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, outputStructType=SESSION_SCHEMA, stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch twin: gap-based sessionization with windows — session id =
    running count of gap-breaks per user in event-time order.  This is
    also the oracle-checkable form (same SQL in DuckDB)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = Window.partitionBy("user_id", "session_id")
    return (
        events
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("is_break",
                    (F.col("prev_ts").isNull()
                     | (F.col("ts").cast("long")
                        - F.col("prev_ts").cast("long") > gap_s))
                    .cast("int"))
        .withColumn("session_id",
                    F.sum("is_break").over(
                        w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .drop("session_id")
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Built-in session windows (gap-merged) per event_type — the
    declarative fast path when the per-session aggregate is standard."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("session_start"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                .alias("session_end"), "event_type", "n_events")
    )
