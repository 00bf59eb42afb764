"""Fuzzy entity matching (search/text.py fuzzy_match_entities):
pigeonhole-blocked Levenshtein join vs a naive Python reference —
the blocking must be lossless for every edit pattern (substitution,
insertion, deletion, transposed-ish double edits, short strings)."""

from graphraft_spark.search.text import fuzzy_match_entities


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_blocking_is_lossless(spark):
    names = ["alpha centauri", "alpha centurion", "beta pictoris",
             "Alphacentauri", "alpa centauri", "gamma draconis",
             "alpha centaur", "al", "alp", "zeta"]
    ents = [(1, "alpha centauri"), (2, "beta pictoris!"),
            (3, "gama draconis"), (4, "alph"), (5, "zz")]
    nf = spark.createDataFrame([(n,) for n in names], "name string")
    ef = spark.createDataFrame(ents, "qid bigint, entity string")
    got = {(r["qid"], r["name"]): r["dist"]
           for r in fuzzy_match_entities(nf, ef, max_dist=2).collect()}
    want = {}
    for qid, e in ents:
        for n in names:
            d = _lev(n.lower().strip(), e.lower().strip())
            if d <= 2:
                want[(qid, n)] = d
    assert got == want


def test_label_restriction(spark):
    nf = spark.createDataFrame(
        [("ada", "Author"), ("ada", "Paper"), ("adam", "Author")],
        "name string, label string")
    ef = spark.createDataFrame([(1, "ada")], "qid bigint, entity string")
    got = {(r["name"]) for r in
           fuzzy_match_entities(nf, ef, max_dist=1,
                                label="Author").collect()}
    assert got == {"ada", "adam"}
