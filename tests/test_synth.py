"""Clustered-embedding generator (data/synth.py): determinism across
partitionings, unit norm, cluster structure, and the hardness dial."""

import numpy as np

from graphraft_spark.data.synth import (
    clustered_embeddings,
    clustered_queries,
    mixture_centers,
)


def _acc(rows, cents):
    ok = 0
    for r in rows:
        v = np.asarray(r["embedding"])
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9
        if int(np.argmax(cents @ v)) == r["cluster"]:
            ok += 1
    return ok / len(rows)


def test_partition_invariant_and_seeded(spark):
    a = clustered_embeddings(spark, 150, 16, 8, 0.3, partitions=3).collect()
    b = clustered_embeddings(spark, 150, 16, 8, 0.3, partitions=8).collect()
    assert ({r["vec_id"]: r["embedding"] for r in a}
            == {r["vec_id"]: r["embedding"] for r in b})
    c = clustered_embeddings(spark, 150, 16, 8, 0.3, seed=99).collect()
    assert ({r["vec_id"]: r["embedding"] for r in a}
            != {r["vec_id"]: r["embedding"] for r in c})


def test_hardness_dial(spark):
    """sigma controls cluster separability: nearest-center accuracy is
    ~1 when well-separated and degrades toward chance as sigma grows."""
    cents = mixture_centers(8, 16)
    easy = _acc(clustered_embeddings(spark, 200, 16, 8, 0.2).collect(),
                cents)
    hard = _acc(clustered_embeddings(spark, 200, 16, 8, 1.5).collect(),
                cents)
    assert easy > 0.95
    assert hard < easy - 0.2


def test_queries_in_distribution_disjoint_ids(spark):
    q = clustered_queries(spark, 20, 16, 8, 0.3).collect()
    assert {r["qid"] for r in q} == set(range(20))
    # query draws differ from same-index corpus draws (disjoint RNG ids)
    e = clustered_embeddings(spark, 20, 16, 8, 0.3).collect()
    assert ([r["q_emb"] for r in sorted(q, key=lambda r: r["qid"])]
            != [r["embedding"] for r in sorted(e, key=lambda r: r["vec_id"])])
