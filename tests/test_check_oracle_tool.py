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


def test_driver_sim_fails_decimal_vs_float64():
    """r10 red row q_nation_profit: values matched to 0.0 but the
    engine side reached pandas as Decimal objects ('1709139.2670')
    while the oracle side was float64 ('1709139.267') — the driver
    hashes the string forms and diverges on every row whose 4th
    decimal digit is zero.  driver_sim's frames_equal must hard-fail
    on that dtype-class split (it previously np.allclose-passed it)."""
    import decimal
    import importlib.util
    import os

    import pandas as pd

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "driver_sim", os.path.join(repo, "tools", "driver_sim.py"))
    ds = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ds)
    D = decimal.Decimal

    dec_side = ds.canon(pd.DataFrame(
        {"profit": [D("1709139.2670"), D("5.1234")]}))
    flt_side = ds.canon(pd.DataFrame({"profit": [1709139.267, 5.1234]}))
    assert not ds.frames_equal(dec_side, flt_side)
    # same class on both sides still compares by value
    assert ds.frames_equal(
        ds.canon(pd.DataFrame({"profit": [1709139.267, 5.1234]})),
        flt_side)
    assert ds.frames_equal(
        ds.canon(pd.DataFrame({"x": [D("1.10")]})),
        ds.canon(pd.DataFrame({"x": [D("1.10")]})))
