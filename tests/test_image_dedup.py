"""ops/image_dedup.py: perceptual-hash image near-dup — aHash/dHash bit
exactness vs a pure-Python replay, brightness/re-encode invariance,
pigeonhole-banded blocking recall-exactness (and the no-all-pairs plan),
hot-bucket star capping, and the registry query's planted recovery."""

import itertools
import random

import pytest

from pyspark.sql import functions as F

from graphraft_spark.ops.image_dedup import (
    hash_bands,
    image_ahash_words,
    image_dhash_words,
    image_neardup_pairs,
)


def _ahash_ref(px):
    s = sum(px)
    bits = [1 if 64 * v > s else 0 for v in px]
    return (sum(b << i for i, b in enumerate(bits[:32])),
            sum(b << i for i, b in enumerate(bits[32:])))


def _dhash_ref(px):  # px: 72 ints, row-major 9 wide x 8 tall
    bits = [1 if px[y * 9 + x + 1] > px[y * 9 + x] else 0
            for y in range(8) for x in range(8)]
    return (sum(b << i for i, b in enumerate(bits[:32])),
            sum(b << i for i, b in enumerate(bits[32:])))


def _feat(spark, imgs):  # imgs: {id: [ints]}
    rows = [(i, [v / 255.0 for v in px]) for i, px in imgs.items()]
    return spark.createDataFrame(rows, "id bigint, feature array<double>")


def test_ahash_matches_python_replay(spark):
    rng = random.Random(7)
    imgs = {i: [rng.randrange(256) for _ in range(64)] for i in range(6)}
    got = {r.id: (r.h0, r.h1) for r in
           image_ahash_words(_feat(spark, imgs)).collect()}
    assert got == {i: _ahash_ref(px) for i, px in imgs.items()}


def test_dhash_matches_python_replay(spark):
    rng = random.Random(11)
    imgs = {i: [rng.randrange(256) for _ in range(72)] for i in range(6)}
    got = {r.id: (r.h0, r.h1) for r in
           image_dhash_words(_feat(spark, imgs)).collect()}
    assert got == {i: _dhash_ref(px) for i, px in imgs.items()}


def test_ahash_invariant_to_uniform_brightness_shift(spark):
    rng = random.Random(3)
    base = [rng.randrange(200) for _ in range(64)]  # +40 never clips
    imgs = {0: base, 1: [v + 40 for v in base]}
    got = {r.id: (r.h0, r.h1) for r in
           image_ahash_words(_feat(spark, imgs)).collect()}
    assert got[0] == got[1]


def test_dhash_invariant_to_monotone_tone_curve(spark):
    rng = random.Random(5)
    base = [rng.randrange(128) for _ in range(72)]
    curved = [v + v // 2 for v in base]  # monotone, non-additive
    got = {r.id: (r.h0, r.h1) for r in
           image_dhash_words(_feat(spark, {0: base, 1: curved})).collect()}
    assert got[0] == got[1]


def test_hash_bands_partition_the_64_bits(spark):
    df = spark.createDataFrame([(0x12345678, 0x0ABCDEF1)], "w0 long, w1 long")
    out = df.select(hash_bands([F.col("w0"), F.col("w1")], 4).alias("bb")) \
        .collect()[0].bb
    assert [b.band for b in out] == [0, 1, 2, 3]
    assert [b.bucket for b in out] == [
        0x12345678 & 0xFFFF, 0x12345678 >> 16,
        0x0ABCDEF1 & 0xFFFF, 0x0ABCDEF1 >> 16]


def test_hash_bands_rejects_bad_band_counts(spark):
    c = F.col("w0")
    for bad in (3, 5, 0, -1):  # 3/5 don't divide 64; widths must fit
        with pytest.raises(ValueError, match="bands"):
            hash_bands([c, c], bad)
    with pytest.raises(ValueError, match="bands"):
        hash_bands([c, c], 1)  # 64-bit window exceeds a 32-bit word


def test_wider_fingerprint_pairs_equal_bruteforce(spark):
    """The scale path: 128-bit fingerprints (4 words) through the same
    banding — recall-exact vs brute force at bands=8, dist<=3."""
    rng = random.Random(99)
    hashes = {i: rng.getrandbits(128) for i in range(15)}
    base = hashes[0]
    for i, d in ((200, 1), (201, 3), (202, 4)):
        h = base
        for j in rng.sample(range(128), d):
            h ^= 1 << j
        hashes[i] = h
    rows = [tuple([i] + [(h >> (32 * k)) & 0xFFFFFFFF for k in range(4)])
            for i, h in hashes.items()]
    df = spark.createDataFrame(
        rows, "id bigint, h0 long, h1 long, h2 long, h3 long")
    got = {(r.id_a, r.id_b, r.dist) for r in
           image_neardup_pairs(df, word_cols=("h0", "h1", "h2", "h3"),
                               max_dist=3, bands=8).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[a] ^ hashes[b]).count("1")
        if d <= 3:
            want.add((a, b, d))
    assert got == want and (0, 201, 3) in got


def test_pigeonhole_requires_bands_gt_max_dist(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id bigint, h0 long, h1 long")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(df, max_dist=4, bands=4)


def test_banded_pairs_equal_bruteforce_hamming(spark):
    """Recall exactness: bands > max_dist ⇒ banded output == all-pairs
    Hamming filter (the invariant the registry oracle relies on)."""
    rng = random.Random(42)
    hashes = {}
    base = rng.getrandbits(64)
    for i in range(20):
        h = rng.getrandbits(64)
        hashes[i] = h
    # plant near pairs at controlled distances around `base`
    for i, d in ((100, 0), (101, 1), (102, 3), (103, 4), (104, 7)):
        h = base
        for j in rng.sample(range(64), d):
            h ^= 1 << j
        hashes[i] = h
    rows = [(i, h & 0xFFFFFFFF, h >> 32) for i, h in hashes.items()]
    df = spark.createDataFrame(rows, "id bigint, h0 long, h1 long")
    got = {(r.id_a, r.id_b, r.dist) for r in
           image_neardup_pairs(df, max_dist=3, bands=4).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[a] ^ hashes[b]).count("1")
        if d <= 3:
            want.add((a, b, d))
    assert got == want
    assert (100, 102, 3) in got and not any(
        a == 100 and b == 104 for a, b, _ in got)


def test_plan_is_banded_not_all_pairs(spark):
    df = spark.createDataFrame([(1, 0, 0), (2, 1, 1)],
                               "id bigint, h0 long, h1 long")
    plan = image_neardup_pairs(df, max_dist=3, bands=4) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in plan  # the equi-join keys carry the block
    assert "band" in plan and "bucket" in plan


def test_hot_bucket_cap_keeps_flood_clustered_via_star(spark):
    """An identical-image flood over the cap collapses to star edges —
    every member still pairs with the root at dist 0, and the
    quadratic within-bucket clique is gone."""
    rows = [(i, 7, 7) for i in range(30)]  # 30 identical hashes
    df = spark.createDataFrame(rows, "id bigint, h0 long, h1 long")
    got = {(r.id_a, r.id_b) for r in
           image_neardup_pairs(df, max_dist=3, bands=4,
                               max_bucket_size=5).collect()}
    assert got == {(0, i) for i in range(1, 30)}  # star, not C(30,2)


def test_registry_query_recovers_planted_copies(spark):
    """Planted re-encoded and brightness-shifted copies are found at
    dist 0; the plants' partners are never paired with each other."""
    from graphraft_spark.registry.dedup_queries import d_image_neardup

    out = d_image_neardup(spark, "/root/testdata/sf0.001")
    pairs = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").collect()]
    reenc = [d for d in docs if d % 10 == 0]
    bright = [d for d in docs if d % 10 == 5]
    assert reenc and bright
    for d in reenc:
        assert pairs.get((d, d + 1000000)) == 0
    for d in bright:
        assert pairs.get((d, d + 2000000)) == 0


def test_dhash_registry_query_recovers_planted_copies(spark):
    """The dHash twin finds the same plants (both invariances cover
    re-encode and +40 brightness) at dist 0."""
    from graphraft_spark.registry.dedup_queries import d_image_neardup_dhash

    out = d_image_neardup_dhash(spark, "/root/testdata/sf0.001")
    pairs = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").collect()]
    for d in docs:
        if d % 10 == 0:
            assert pairs.get((d, d + 1000000)) == 0
        if d % 10 == 5:
            assert pairs.get((d, d + 2000000)) == 0


def test_gradient_sign_words_matches_python_replay(spark):
    from graphraft_spark.ops.image_dedup import gradient_sign_words

    rng = random.Random(13)
    seqs = {i: [rng.randrange(-32768, 32768) for _ in range(65)]
            for i in range(5)}
    rows = [(i, [v / 32768.0 for v in s]) for i, s in seqs.items()]
    df = spark.createDataFrame(rows, "id bigint, feature array<double>")
    got = {r.id: (r.h0, r.h1) for r in gradient_sign_words(df).collect()}
    for i, s in seqs.items():
        bits = [1 if s[j + 1] > s[j] else 0 for j in range(64)]
        want = (sum(b << k for k, b in enumerate(bits[:32])),
                sum(b << k for k, b in enumerate(bits[32:])))
        assert got[i] == want


def test_gradient_sign_invariant_to_gain_and_dc(spark):
    from graphraft_spark.ops.image_dedup import gradient_sign_words

    rng = random.Random(17)
    base = [rng.randrange(-100, 100) for _ in range(65)]
    rows = [(0, [v / 32768.0 for v in base]),
            (1, [v * 3 / 32768.0 for v in base]),       # gain x3
            (2, [(v + 50) / 32768.0 for v in base])]     # DC offset
    df = spark.createDataFrame(rows, "id bigint, feature array<double>")
    got = {r.id: (r.h0, r.h1) for r in gradient_sign_words(df).collect()}
    assert got[0] == got[1] == got[2]


def test_audio_registry_query_recovers_planted_copies(spark):
    """Gain-doubled and DC-offset copies fingerprint identically —
    found at dist 0 through the real WAV codec."""
    from graphraft_spark.registry.dedup_queries import d_audio_neardup

    out = d_audio_neardup(spark, "/root/testdata/sf0.001")
    pairs = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").collect()]
    for d in docs:
        if d % 10 == 0:
            assert pairs.get((d, d + 1000000)) == 0
        if d % 10 == 5:
            assert pairs.get((d, d + 2000000)) == 0


def test_image_dedup_groups_cluster_plants_with_source(spark):
    """The composition query: each planted copy lands in the same
    component as its source, and that component's size is >= 2."""
    from graphraft_spark.registry.dedup_queries import d_image_dedup_groups

    out = {r.id: (r.comp, r.cluster_size) for r in
           d_image_dedup_groups(spark, "/root/testdata/sf0.001").collect()}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").collect()]
    for d in docs:
        for plant in ([d + 1000000] if d % 10 == 0 else
                      [d + 2000000] if d % 10 == 5 else []):
            assert d in out and plant in out
            assert out[d][0] == out[plant][0]
            assert out[d][1] >= 2


def test_repair_capped_restores_components_in_diverse_bucket(spark):
    """A DIVERSE hot bucket: root R is > max_dist from both members X
    and Y, but dist(X, Y) <= max_dist.  Star-only capping loses the
    X-Y cluster entirely (both star links fail the verify);
    repair_capped re-pairs the failed members with their bucket-mates
    and recovers exactly the uncapped components."""
    from graphraft_spark.ops.dedup import connected_components

    # h0 = 0 for all three -> they share bands 0 and 1 (bucket size 3);
    # h1 encodes the distances: R=0, X=0xF0 (4 bits), Y=0xE1 (4 bits),
    # popcount(X^Y) = 2
    hashed = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0xF0), (3, 0, 0xE1)],
        "id bigint, h0 bigint, h1 bigint")
    unc = image_neardup_pairs(hashed, max_dist=3, bands=4)
    star_only = image_neardup_pairs(hashed, max_dist=3, bands=4,
                                    max_bucket_size=1)
    repaired = image_neardup_pairs(hashed, max_dist=3, bands=4,
                                   max_bucket_size=1, repair_capped=True)
    assert {(r.id_a, r.id_b) for r in unc.collect()} == {(2, 3)}
    assert star_only.count() == 0  # the cap alone loses the cluster
    comp_unc = {(r.id, r.comp) for r in
                connected_components(unc.select("id_a", "id_b")).collect()}
    comp_rep = {(r.id, r.comp) for r in connected_components(
        repaired.select("id_a", "id_b")).collect()}
    assert comp_rep == comp_unc == {(2, 2), (3, 2)}


def test_crossmodal_mismatch_flags_caption_swaps_only(spark):
    """d_crossmodal_mismatch: re-encoded copies carry a REVERSED
    caption -> flagged; brightness copies keep theirs -> clean."""
    from graphraft_spark.registry.dedup_queries import (
        d_crossmodal_mismatch,
    )

    rows = d_crossmodal_mismatch(spark, "/root/testdata/sf0.001") \
        .collect()
    flags = {(r.id_a, r.id_b): (r.mismatch, r.jac) for r in rows}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id")
        .collect()]
    assert any(d % 10 == 0 for d in docs) and any(d % 10 == 5
                                                  for d in docs)
    for d in docs:
        if d % 10 == 0:
            m, j = flags[(d, d + 1000000)]
            assert m and j < 0.5
        if d % 10 == 5:
            m, j = flags[(d, d + 2000000)]
            assert not m and j == 1.0
