"""Probe the residual p_pipeline_bulk excursion (~1 in 10-15 runs pays
15-25 s inside the budget stage's eager count; BASELINE.md round-6
section rules out Janino recompiles, JVM GC, Python-worker churn,
Python-GC cleanup, and disk writeback, and the event-log capture
attributes the time to task-deserialize on the cached-results scan).

This harness A/B-tests the one mechanism that capture points at: the
persisted frame's lineage (the full union-of-pattern-join tree) rides
in every downstream task binary under ``persist``, while
``localCheckpoint`` truncates it to a stub.  It runs the same bulk
pipeline N times per mode in one JVM (bench confs: G1, 1 GiB code
cache, tmpfs shuffle dirs) with ``-Xlog:safepoint`` captured for
post-hoc correlation of any spike.

Usage: python tools/probe_bulk_spike.py [reps_per_mode=12] [sf_dir]
Prints one JSON line: per-mode run times + min/median/max.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from graphraft_spark.graph import tpch_graph
    from graphraft_spark.llm import EchoGenerator, LexicographicRanker
    from graphraft_spark.pipeline import run_pipeline_bulk
    from graphraft_spark.session import get_spark

    spark = get_spark("probe-bulk-spike", extra_conf={
        "spark.driver.extraJavaOptions":
            "-XX:+UseG1GC -XX:MaxGCPauseMillis=200 "
            "-XX:ReservedCodeCacheSize=1g "
            "-Xlog:safepoint*=info:file=/tmp/probe_safepoint.log:time,uptime",
        "spark.local.dir": "/dev/shm/spark-local-probe",
    })
    spark.sparkContext.setLogLevel("ERROR")
    g = tpch_graph(spark, sf_dir)

    def run(mode: str) -> float:
        t0 = time.time()
        out = run_pipeline_bulk(
            spark, g,
            questions=[
                (1, "who supplies small ring?", ["small ring"]),
                (2, "what did customer 42 buy?", ["Customer#000000042"]),
            ],
            ranker=LexicographicRanker(), generator=EchoGenerator(),
            max_nodes=15, k=3, patterns=("1hop", "2hop"),
            prop_cols=("detail",), persist_mode=mode)
        out.select("qid", "nodeId", "name", "detail",
                   F.round("similarity", 6).alias("similarity")) \
           .write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    report = {"sf_dir": sf_dir, "reps": reps, "modes": {}}
    for mode in ("persist", "local_checkpoint"):
        warm = [run(mode), run(mode)]
        while len(warm) < 6 and max(warm[-2:]) > 1.25 * min(warm):
            warm.append(run(mode))
        ts = []
        for i in range(reps):
            t = run(mode)
            ts.append(t)
            print(f"  {mode} run {i + 1}/{reps}: {t}s (wall mark "
                  f"{time.time():.1f})", file=sys.stderr)
        s = sorted(ts)
        report["modes"][mode] = {
            "warmup": warm, "times": ts, "min": s[0],
            "median": s[len(s) // 2], "max": s[-1],
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
