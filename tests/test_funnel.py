"""Funnel / retention semantics on hand-built event streams: anchoring
at the FIRST step-1 event, greedy earliest binding, chain breaks,
the within-span constraint, and exact period bucketing."""

from datetime import datetime

from graphraft_spark.ops.funnel import funnel, funnel_counts, retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id bigint, ts timestamp_ntz, event_type string")


def test_anchored_greedy_binding_and_chain_break(spark):
    ev = _ev(spark, [
        # user 1 converts: A(d1) -> B(d2) -> C(d3)
        (1, 1, 0, "A"), (1, 2, 0, "B"), (1, 3, 0, "C"),
        # user 2: B BEFORE its first A never binds -> chain breaks at B
        (2, 2, 0, "B"), (2, 3, 0, "A"),
        # user 3: anchor is FIRST A (d1); B binds d4 (not the d2 C)
        (3, 1, 0, "A"), (3, 2, 0, "C"), (3, 4, 0, "B"), (3, 5, 0, "C"),
        # user 4: no A at all -> absent from funnel frame
        (4, 1, 0, "B"), (4, 2, 0, "C"),
    ])
    out = {r["user"]: r for r in funnel(ev, ["A", "B", "C"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["converted"] is True
    assert out[2]["t2"] is None and out[2]["converted"] is False
    # user 3: C must bind AFTER B (d5), not the earlier d2 C
    d = lambda day: int(datetime(2024, 1, day).timestamp() * 1_000_000)
    assert out[3]["t2"] == d(4) and out[3]["t3"] == d(5)
    assert out[3]["converted"] is True


def test_within_constraint_gates_conversion_only(spark):
    ev = _ev(spark, [
        (1, 1, 0, "A"), (1, 10, 0, "B"),   # span 9 days
    ])
    fast = {r["user"]: r for r in
            funnel(ev, ["A", "B"], within_seconds=30 * 86400).collect()}
    slow = {r["user"]: r for r in
            funnel(ev, ["A", "B"], within_seconds=5 * 86400).collect()}
    assert fast[1]["converted"] is True
    # steps still bind — only the conversion flag is gated
    assert slow[1]["t2"] is not None and slow[1]["converted"] is False


def test_funnel_counts_shape(spark):
    ev = _ev(spark, [
        (1, 1, 0, "A"), (1, 2, 0, "B"),
        (2, 1, 0, "A"),
    ])
    rows = {r["step"]: r for r in
            funnel_counts(ev, ["A", "B"]).collect()}
    assert rows[1]["n_users"] == 2 and rows[1]["n_converted"] is None
    assert rows[2]["n_users"] == 1 and rows[2]["n_converted"] == 1


def test_retention_periods_are_exact_buckets(spark):
    week = 7 * 86400
    ev = _ev(spark, [
        (1, 1, 0, "A"),   # cohort week W
        (1, 9, 0, "A"),   # W+1
        (2, 1, 0, "A"),   # cohort W, never returns
        (3, 9, 0, "A"),   # cohort W+1
    ])
    got = {(r["cohort"], r["periods_since"]): r["n_users"]
           for r in retention_cohorts(ev, period_seconds=week).collect()}
    base = int(datetime(2024, 1, 1).timestamp() * 1_000_000) // (week * 1_000_000)
    # 2024-01-09 is 8 days after 01-01 -> next weekly bucket
    assert got[(base, 0)] == 2
    assert got[(base, 1)] == 1
    assert got[(base + 1, 0)] == 1
