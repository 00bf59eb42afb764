"""Dump ``explain('formatted')`` for named queries to stdout — feeds
the plans/r13/<query>_{before,after}.txt evidence files.

Usage: python tools/explain_query.py <repo_path> <sf_dir> <query> [...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = repo + os.pathsep + \
        os.environ.get("PYTHONPATH", "")

    from graphraft_spark import registry
    from graphraft_spark.session import get_spark

    registry.load_all()
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    lookup = dict(registry.EXTRA_QUERIES)
    lookup.update(registry.QUERIES)
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            lookup[name](spark, sf_dir).explain("formatted")
        print(f"===== {name} =====")
        print(buf.getvalue())


if __name__ == "__main__":
    main()
