"""Sessionization on Spark 4's transformWithState — the successor API
to applyInPandasWithState (typed per-key state handles, timers, state
TTL, RocksDB-backed on a cluster).  Same semantics as
``stateful.sessionize_stream``; both are kept because the two stateful
APIs have different operational envelopes (transformWithState is the
forward path; applyInPandasWithState is the widely-deployed one).

Output parity with the batch twin (``stateful.sessionize_batch``) for
CLOSED sessions is asserted in tests, exactly as for the older API.

ENVIRONMENT GATE: transformWithState's Python runner speaks protobuf to
the JVM state server; environments without ``google.protobuf`` (like
this sandbox) fail at stream start with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.  ``tws_available()``
probes for it; the parity test skips (not fakes) when absent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from graphraft_spark.streaming.stateful import SESSION_SCHEMA


class SessionProcessor(StatefulProcessor):
    """Per-user session state machine: (start, last, n, sum_value) in a
    ValueState; a session closes when a later event arrives more than
    ``gap_s`` after the last one, and the closed session row is emitted.
    The trailing open session stays in state (same contract as
    sessionize_stream — event-time timers would flush it in a long-lived
    deployment)."""

    def __init__(self, gap_s: int = 1800):
        self.gap_ns = gap_s * 1_000_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState(
            "sess", "start bigint, last bigint, n bigint, sv double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        # epoch-nanos regardless of the Arrow→pandas resolution
        ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        cur = list(self.state.get()) if self.state.exists() else None
        out = []
        for i in range(len(batch)):
            t, v = int(ts_ns[i]), float(batch["value"].iloc[i])
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] > self.gap_ns:
                out.append(cur)
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
        if cur is not None:
            self.state.update(tuple(cur))
        if out:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(s, unit="ns"),
                "session_end": pd.Timestamp(e, unit="ns"),
                "n_events": n, "sum_value": round(sv, 4)}
                for s, e, n, sv in out])

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when the runtime can actually execute transformWithState
    (protobuf present for the Python↔JVM state protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def sessionize_tws(events: DataFrame, gap_s: int = 1800,
                   watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via transformWithStateInPandas.  At
    scale: RocksDB state store, state partitioned by user_id, bounded by
    the watermark — identical operational shape to the older API, with
    typed state and timer support for open-session flush when needed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(gap_s),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
