"""Isolated single-query bench: fresh process, one query, noop sink,
adaptive warmup + min-of-3 — the bench.py protocol without the other 44
lines, for A/B comparisons where cross-run machine drift would swamp a
full-suite diff (this host's ambient anchor has read 1.3x-5x across
same-day runs).

Usage: python tools/isobench.py <repo_path> <query> [sf_dir] [--runs N]

``repo_path`` selects WHICH CODE runs (the working tree vs a pristine
snapshot of a past commit), so old/new can alternate process-by-process
on the same machine minute — the only comparison this box supports.
Prints one JSON line: {"query", "repo", "min", "runs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    query = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 and not \
        sys.argv[3].startswith("--") else "/root/testdata/sf0.1"
    n_timed = 3
    if "--runs" in sys.argv:
        n_timed = int(sys.argv[sys.argv.index("--runs") + 1])
    sys.path.insert(0, repo)
    # executors import the package by name — point their Python at the
    # SAME tree the driver is timing
    os.environ["PYTHONPATH"] = repo + os.pathsep + \
        os.environ.get("PYTHONPATH", "")

    from graphraft_spark import registry
    from graphraft_spark.session import get_spark

    registry.load_all()
    spark = get_spark("isobench", extra_conf={
        "spark.driver.extraJavaOptions":
            "-XX:+UseG1GC -XX:MaxGCPauseMillis=200 "
            "-XX:ReservedCodeCacheSize=1g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    lookup = dict(registry.EXTRA_QUERIES)
    lookup.update(registry.QUERIES)
    fn = lookup[query]

    def run() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    warm = [run(), run()]
    while len(warm) < 6 and max(warm[-2:]) > 1.25 * min(warm):
        warm.append(run())
    timed = [run() for _ in range(n_timed)]
    print(json.dumps({"query": query, "repo": repo,
                      "min": min(timed), "warm": warm, "runs": timed}))


if __name__ == "__main__":
    main()
