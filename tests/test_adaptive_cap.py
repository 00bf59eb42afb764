"""Adaptive LSH bucket-cap policy (r7 verdict item 4).

The r7 scale soak named dup-group DENSITY as the one quadratic axis a
static ``max_bucket_size`` misses: sibling groups under the cap still
verify C(G,2) pairs each.  ``adaptive_bucket_cap`` derives the cap
from the bucket-size histogram (largest cap whose candidate work fits
``pairs_per_doc × n_docs``); ``build_lsh_index(max_bucket_size="auto")``
wires it in, and ``repair_capped=True`` keeps verified clusters exact
no matter how aggressive the derived cap is.
"""

import pytest
from pyspark.sql import functions as F

from graphraft_spark.ops.dedup import (
    adaptive_bucket_cap,
    connected_components,
    minhash_lsh_dedup,
)


def test_policy_caps_hot_buckets_only():
    # 100 pair-light buckets + 2 boilerplate mega-buckets of 50:
    # memberships = 300, docs = 75 at bands=4, budget = 32*75 = 2400.
    # Uncapped work = 100*1 + 2*C(50,2) = 2550 > budget; capping the
    # mega-buckets (star edges, 49 each) fits: 100 + 98 = 198.
    assert adaptive_bucket_cap({2: 100, 50: 2}, bands=4) == 2


def test_policy_no_cap_when_work_fits():
    # all work fits the budget -> cap = max observed size, nothing capped
    assert adaptive_bucket_cap({2: 10, 5: 3}, bands=4) == 5


def test_policy_floor_and_empty():
    # even star-only work is returned as cap 1 when nothing fits
    assert adaptive_bucket_cap({10_000: 50}, bands=1,
                               pairs_per_doc=0.001) == 1
    assert adaptive_bucket_cap({}, bands=4) == 1


def test_policy_monotone_in_budget():
    hist = {2: 1000, 10: 50, 200: 3}
    caps = [adaptive_bucket_cap(hist, bands=4, pairs_per_doc=p)
            for p in (0.01, 1.0, 8.0, 1000.0)]
    assert caps == sorted(caps)
    assert caps[-1] == 200  # huge budget -> uncapped


@pytest.fixture(scope="module")
def dense_corpus(spark):
    """Dup-DENSE corpus: 40 base docs, each replicated 30x with a tiny
    per-copy suffix — the density axis the r7 soak abandoned at x50.
    Group size 30 means every bucket holds ~30 siblings."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(40).select("doc_id", "text")
    idx = spark.range(30).select(F.col("id").alias("copy"))
    return (base.crossJoin(idx)
            .select((F.col("doc_id") * 1000 + F.col("copy"))
                    .alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" v"),
                             F.col("copy").cast("string")).alias("text")))


def _components(pairs):
    comp = connected_components(pairs.select("id_a", "id_b"))
    return {(r.id, r.comp) for r in comp.select("id", "comp").collect()}


def test_auto_cap_with_repair_matches_uncapped(dense_corpus):
    """components(auto cap + repair) == components(uncapped): the
    derived cap bounds work while the repair path keeps verified
    clusters exact — the policy closing the r7 dup-density soak gap."""
    kw = dict(num_perm=8, bands=4, k=3, threshold=0.5)
    uncapped = minhash_lsh_dedup(dense_corpus, **kw)
    auto = minhash_lsh_dedup(dense_corpus, max_bucket_size="auto",
                             repair_capped=True, **kw)
    assert _components(auto) == _components(uncapped)
    assert len(_components(uncapped)) > 0
