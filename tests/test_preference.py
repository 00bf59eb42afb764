"""Preference-data ops (ops/preference.py): floor-before-rank,
deterministic ties, margin gate, singleton-prompt exclusion."""

from graphraft_spark.ops.preference import best_of_n, dpo_pairs


def _cands(spark):
    rows = [
        ("p1", "a", 3.0), ("p1", "b", 9.0), ("p1", "c", 9.0),
        ("p2", "x", 1.0), ("p2", "y", 2.0),       # all under floor 5
        ("p3", "only", 7.0),                      # singleton
        ("p4", "lo", 5.0), ("p4", "hi", 5.5),     # margin 0.5
    ]
    return spark.createDataFrame(
        rows, "prompt_id string, candidate string, reward double")


def test_best_of_n_floor_and_ties(spark):
    got = {(r.prompt_id, r.candidate): r.rank
           for r in best_of_n(_cands(spark), k=2, min_reward=5.0).collect()}
    # p1: tie at 9.0 -> candidate ASC ('b' before 'c'); 'a' cut by floor
    # p2: fully rejected (best candidate under the floor -> no rows)
    assert got == {("p1", "b"): 1, ("p1", "c"): 2,
                   ("p3", "only"): 1,
                   ("p4", "hi"): 1, ("p4", "lo"): 2}


def test_dpo_pairs_margin_and_singletons(spark):
    got = {r.prompt_id: r for r in dpo_pairs(
        _cands(spark), min_margin=1.0).collect()}
    # p1: chosen 'b' (tie -> ASC), rejected 'a', margin 6
    # p2: margin 1.0 passes; p3 singleton excluded; p4 margin 0.5 dropped
    assert set(got) == {"p1", "p2"}
    assert (got["p1"].chosen, got["p1"].rejected,
            got["p1"].margin) == ("b", "a", 6.0)
    assert (got["p2"].chosen, got["p2"].rejected) == ("y", "x")
