"""load_pq: memoized parquet HANDLES — lazy plans, fingerprint-keyed.

Pins the three contract points the r14 optimization relies on:
same-fingerprint calls share one analyzed handle (the ~0.1-0.2 s
footer/listing cost is paid once), any rewrite of the file invalidates
the memo (no stale plans), and no DATA is ever cached (a new action
after a rewrite sees the new rows)."""

import os
import time

from pyspark.sql import functions as F

from graphraft_spark.sources.pq_cache import load_pq


def _write(spark, path, vals):
    spark.createDataFrame([(v,) for v in vals], "x int") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def test_memo_hit_same_handle(spark, tmp_path):
    p = str(tmp_path / "t1")
    _write(spark, p, [1, 2, 3])
    a = load_pq(spark, p)
    b = load_pq(spark, p)
    assert a is b
    assert a.count() == 3


def test_rewrite_invalidates_and_serves_new_data(spark, tmp_path):
    p = str(tmp_path / "t2")
    _write(spark, p, [1, 2, 3])
    a = load_pq(spark, p)
    assert a.count() == 3
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    _write(spark, p, [7, 8, 9, 10])
    b = load_pq(spark, p)
    assert b is not a
    assert b.count() == 4
    assert sorted(r.x for r in b.collect()) == [7, 8, 9, 10]


def test_self_join_through_shared_handle(spark, tmp_path):
    p = str(tmp_path / "t3")
    _write(spark, p, [1, 2, 2])
    a = load_pq(spark, p).alias("a")
    b = load_pq(spark, p).alias("b")
    j = a.join(b, F.col("a.x") == F.col("b.x"))
    assert j.count() == 5  # 1x1 + 2x2


def test_missing_path_falls_through_to_spark_error(spark, tmp_path):
    p = str(tmp_path / "absent")
    try:
        load_pq(spark, p).count()
        raised = False
    except Exception:  # noqa: BLE001 — Spark's own error semantics
        raised = True
    assert raised
    assert not os.path.exists(p)
