"""Guard tests for tools/check_oracle.py CLI semantics.

r7 judge finding: explicitly named queries that match nothing printed
``0/0 passed`` and exited 0 — a vacuous green.  The guard now exits 2
before Spark even starts.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "check_oracle.py")


def _run(*args):
    return subprocess.run(
        [sys.executable, TOOL, "/root/testdata/sf0.001", *args],
        capture_output=True, text=True, timeout=120, cwd=REPO)


def test_unmatched_explicit_name_exits_nonzero():
    r = _run("no_such_query_zzz")
    assert r.returncode == 2, r.stdout + r.stderr
    assert "no registered query matches" in r.stdout


def test_extra_name_without_all_hints_and_fails():
    # a real extra-tier name, but --all not passed: must fail with the
    # hint, not pass vacuously
    r = _run("d_bucket_histogram")
    assert r.returncode == 2, r.stdout + r.stderr
    assert "--all" in r.stdout
