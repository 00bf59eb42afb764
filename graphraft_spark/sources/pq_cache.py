"""Memoized parquet table HANDLES (lazy plans, never data).

``spark.read.parquet(path)`` costs ~0.1-0.2 s per call on the driver:
a DataFrameReader round-trip plus footer/schema inference plus the
relation's file listing — paid again for every query construction even
though the result is a pure lazy plan.  Across a 45-line bench with
2-6 table reads per line that is several seconds of single-threaded
driver time per suite (and it is core-count independent, so it is the
first thing the low-core scaling axis sees).

This memo returns the SAME analyzed DataFrame handle for the same
(session, file-identity) pair.  Nothing about the data is cached:

* the DataFrame is lazy — every action still scans the parquet files;
* the memo key carries the source fingerprint (size + mtime_ns, the
  same invalidation contract as ``graph/tpch.source_fingerprint``), so
  a regenerated/overwritten table gets a fresh handle — a stat() per
  call, never a stale plan;
* the key carries the JVM application id, so a new SparkSession never
  sees another session's (dead) plan handles.

Self-joins: Spark's analyzer disambiguates two uses of one DataFrame
handle via per-Dataset ids (verified by test); queries that need
distinct attribute ids can still call ``spark.read.parquet`` directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# (app_id, realpath, size, mtime_ns) -> DataFrame (lazy plan handle)
_MEMO: dict[tuple, DataFrame] = {}


def _app_id(spark: SparkSession) -> str:
    # one py4j call on first use per session object, then a plain
    # attribute read (the wrapper object is stable under getOrCreate)
    app = getattr(spark, "_graft_app_id", None)
    if app is None:
        app = spark.sparkContext.applicationId
        try:
            spark._graft_app_id = app
        except Exception:  # noqa: BLE001 — memo still works, just slower
            pass
    return app


def load_pq(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet(path)`` — see module docstring."""
    try:
        st = os.stat(path)
        key = (_app_id(spark), os.path.realpath(path),
               st.st_size, st.st_mtime_ns)
    except OSError:
        # absent path (or non-posix source): fall through to the plain
        # reader so the caller gets Spark's own error semantics
        return spark.read.parquet(path)
    df = _MEMO.get(key)
    if df is None:
        if len(_MEMO) > 512:  # bound a long session's dead fingerprints
            _MEMO.clear()
        df = spark.read.parquet(path)
        _MEMO[key] = df
    return df
