"""Count-min sketch (ops/sketches.py): the CMS guarantee (estimate ≥
true count, bounded overshoot), merge = build-on-union, weighted input,
and size independence from vocabulary."""

from pyspark.sql import functions as F

from graphraft_spark.ops.sketches import cms_build, cms_merge, cms_probe

D, W = 4, 512


def _items(spark, freqs):
    rows = [(v,) for v, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "v string")


def test_estimate_dominates_truth(spark):
    freqs = {f"w{i}": (i % 7) + 1 for i in range(300)}
    freqs["heavy"] = 500
    df = _items(spark, freqs)
    cms = cms_build(df, "v", depth=D, width=W)
    assert cms.count() <= D * W
    probe = spark.createDataFrame([(k,) for k in freqs], "v string")
    got = {r["item"]: r["est_count"]
           for r in cms_probe(cms, probe, "v", depth=D, width=W).collect()}
    n_total = sum(freqs.values())
    for k, true in freqs.items():
        assert got[k] >= true, k
        # ε = e/W bound with generous slack for the small width
        assert got[k] - true <= 0.05 * n_total, k
    assert got["heavy"] == 500  # heavy hitter unlikely to collide up


def test_merge_equals_union_build(spark):
    a = _items(spark, {"x": 5, "y": 2})
    b = _items(spark, {"x": 1, "z": 9})
    merged = cms_merge(cms_build(a, "v", depth=D, width=W),
                       cms_build(b, "v", depth=D, width=W))
    direct = cms_build(a.unionByName(b), "v", depth=D, width=W)
    assert ({(r["row"], r["slot"], r["cnt"]) for r in merged.collect()}
            == {(r["row"], r["slot"], r["cnt"]) for r in direct.collect()})


def test_weighted_build(spark):
    pre = spark.createDataFrame([("x", 7), ("y", 3)], "v string, n int")
    cms = cms_build(pre, "v", depth=D, width=W, count_col="n")
    probe = spark.createDataFrame([("x",), ("y",), ("absent",)], "v string")
    got = {r["item"]: r["est_count"]
           for r in cms_probe(cms, probe, "v", depth=D, width=W).collect()}
    assert got["x"] == 7 and got["y"] == 3 and got["absent"] == 0
