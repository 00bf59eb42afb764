

def test_cluster_balanced_sample_caps_and_covers(spark):
    """Every cluster contributes, none more than the cap, and the kept
    set is the hash-order prefix per cluster (deterministic)."""
    from graphraft_spark.registry.similarity_queries import (
        e_cluster_balanced_sample,
    )

    sf = "/root/testdata/sf0.01"
    out = e_cluster_balanced_sample(spark, sf).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.centroid_id, []).append(r.rk)
    assert by_cluster, "no clusters sampled"
    for cid, rks in by_cluster.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 5
    # at sf0.01 (500 vectors / 10 centroids) at least one cluster is
    # dense enough to hit the cap — the quota must actually bind
    assert any(len(rks) == 5 for rks in by_cluster.values())
    # determinism
    again = e_cluster_balanced_sample(spark, sf).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
