"""Video near-dup fingerprinting: avi_clip_thumbs sampled-frame
thumbnails (exactness + sampling laziness), video_ahash_words per-frame
bit exactness vs a pure-Python replay, remux/brightness invariance, the
128-bit banded pairs' recall-exactness, the short-clip guard, and the
registry query's planted recovery."""

import itertools
import random

import pytest

from pyspark.sql import functions as F

from graphraft_spark.ops.avi import avi_clip_thumbs, avi_encode
from graphraft_spark.ops.image_dedup import (
    image_neardup_pairs,
    video_ahash_words,
)


def _grey_frames(greys):  # [[ints 16x16], ...] -> rgb frame buffers
    return [bytes(v for v in g for _ in range(3)) for g in greys]


def _clip(greys, fps=25):
    return avi_encode(_grey_frames(greys), 16, 16, fps=fps)


def _thumb_ref(grey):  # 16x16 -> 8x8 nearest (src 2x,2y)
    return [grey[(2 * y) * 16 + 2 * x] for y in range(8) for x in range(8)]


def _ahash_ref(px):
    s = sum(px)
    bits = [1 if 64 * v > s else 0 for v in px]
    return (sum(b << i for i, b in enumerate(bits[:32])),
            sum(b << i for i, b in enumerate(bits[32:])))


def _rand_clip(rng, n=4):
    return [[rng.randrange(200) for _ in range(256)] for _ in range(n)]


def test_clip_thumbs_exact_nearest_luma():
    rng = random.Random(5)
    greys = _rand_clip(rng)
    feat = avi_clip_thumbs(_clip(greys), every_n=2, tw=8, th=8,
                           max_frames=2)
    want = [v / 255.0 for v in _thumb_ref(greys[0]) + _thumb_ref(greys[2])]
    assert feat == want


def test_clip_thumbs_max_frames_bounds_width():
    rng = random.Random(6)
    greys = _rand_clip(rng, n=8)  # sampled: 0,2,4,6 -> capped to 2
    feat = avi_clip_thumbs(_clip(greys), every_n=2, max_frames=2)
    assert len(feat) == 128
    assert feat[64:] == [v / 255.0 for v in _thumb_ref(greys[2])]


def _feat_df(spark, clips):  # {id: [frame greys]}
    rows = [(i, avi_clip_thumbs(_clip(g), every_n=2, max_frames=2))
            for i, g in clips.items()]
    return spark.createDataFrame(rows, "id bigint, feature array<double>")


def test_video_ahash_matches_python_replay(spark):
    rng = random.Random(7)
    clips = {i: _rand_clip(rng) for i in range(5)}
    got = {r.id: (r.h0, r.h1, r.h2, r.h3) for r in
           video_ahash_words(_feat_df(spark, clips), tiles=2).collect()}
    want = {}
    for i, g in clips.items():
        w01 = _ahash_ref(_thumb_ref(g[0]))
        w23 = _ahash_ref(_thumb_ref(g[2]))
        want[i] = (*w01, *w23)
    assert got == want


def test_video_ahash_guards_short_features(spark):
    df = spark.createDataFrame([(1, [0.5] * 64)],
                               "id bigint, feature array<double>")
    with pytest.raises(Exception, match="64"):
        video_ahash_words(df, tiles=2).collect()


def test_fingerprint_invariant_to_remux_and_brightness(spark):
    rng = random.Random(9)
    greys = _rand_clip(rng)
    clips = {
        0: avi_clip_thumbs(_clip(greys), max_frames=2),
        1: avi_clip_thumbs(_clip(greys, fps=50), max_frames=2),
        2: avi_clip_thumbs(_clip([[v + 40 for v in g] for g in greys]),
                           max_frames=2),
    }
    df = spark.createDataFrame(list(clips.items()),
                               "id bigint, feature array<double>")
    rows = video_ahash_words(df, tiles=2).collect()
    fps = {r.id: (r.h0, r.h1, r.h2, r.h3) for r in rows}
    assert fps[0] == fps[1] == fps[2]


def test_banded_pairs_equal_bruteforce_hamming_128bit(spark):
    rng = random.Random(13)
    clips = {i: _rand_clip(rng) for i in range(12)}
    # a couple of planted near-dups
    clips[100] = clips[0]
    clips[101] = [[v + 30 for v in g] for g in clips[1]]
    df = _feat_df(spark, clips)
    hashed = video_ahash_words(df, tiles=2)
    got = {(r.id_a, r.id_b, r.dist) for r in image_neardup_pairs(
        hashed, word_cols=("h0", "h1", "h2", "h3"),
        max_dist=6, bands=8).collect()}
    words = {r.id: (r.h0, r.h1, r.h2, r.h3) for r in hashed.collect()}
    want = set()
    for a, b in itertools.combinations(sorted(words), 2):
        d = sum(bin(x ^ y).count("1")
                for x, y in zip(words[a], words[b]))
        if d <= 6:
            want.add((a, b, d))
    assert got == want
    assert {(p[0], p[1]) for p in want} >= {(0, 100), (1, 101)}


def test_registry_query_recovers_planted_copies(spark):
    from graphraft_spark.registry.dedup_queries import d_video_neardup

    rows = d_video_neardup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.id_a, r.id_b): r.dist for r in rows}
    # every %10==0 doc pairs with its remuxed copy at dist 0,
    # every %10==5 doc with its brightness-shifted copy at dist 0
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id")
        .collect()]
    for d in docs:
        if d % 10 == 0:
            assert pairs.get((d, d + 1000000)) == 0
        if d % 10 == 5:
            assert pairs.get((d, d + 2000000)) == 0


def test_plan_is_banded_not_all_pairs(spark):
    from graphraft_spark.registry.dedup_queries import d_video_neardup

    plan = d_video_neardup(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repair_capped_restores_components_at_128bit_width(spark):
    """The star-cap repair guarantee holds at the 4-word clip width:
    a diverse hot bucket whose root is far from both members loses the
    member pair under star-only capping and recovers it with
    repair_capped — components equal the uncapped form's."""
    from graphraft_spark.ops.dedup import connected_components

    # h0..h2 = 0 for all three -> shared bands 0-5 (bucket size 3);
    # h3 encodes distances: R=0, X=0xFE (7 bits), Y=0x7F (7 bits),
    # popcount(X^Y) = 2 <= 6 while both root links are 7 > 6
    hashed = spark.createDataFrame(
        [(1, 0, 0, 0, 0), (2, 0, 0, 0, 0xFE), (3, 0, 0, 0, 0x7F)],
        "id bigint, h0 bigint, h1 bigint, h2 bigint, h3 bigint")
    kw = dict(word_cols=("h0", "h1", "h2", "h3"), max_dist=6, bands=8)
    unc = image_neardup_pairs(hashed, **kw)
    star_only = image_neardup_pairs(hashed, max_bucket_size=1, **kw)
    repaired = image_neardup_pairs(hashed, max_bucket_size=1,
                                   repair_capped=True, **kw)
    assert {(r.id_a, r.id_b) for r in unc.collect()} == {(2, 3)}
    assert star_only.count() == 0
    comp_unc = {(r.id, r.comp) for r in
                connected_components(unc.select("id_a", "id_b")).collect()}
    comp_rep = {(r.id, r.comp) for r in connected_components(
        repaired.select("id_a", "id_b")).collect()}
    assert comp_rep == comp_unc == {(2, 2), (3, 2)}


def test_trimmed_clip_matcher_flags_frame_containment(spark):
    """clip_frame_match_pairs: a clip missing its first frame matches
    3 of its source's 4 frames (containment) and is flagged; unrelated
    clips never reach min_frames."""
    from graphraft_spark.ops.image_dedup import clip_frame_match_pairs

    rng = random.Random(21)
    # clip 1 = 4 random frames; clip 100 = frames 1..3 of clip 1;
    # clips 2,3 unrelated
    f1 = _rand_clip(rng, n=4)
    rows = []
    for cid, fs in ((1, f1), (100, f1[1:]),
                    (2, _rand_clip(rng, n=4)), (3, _rand_clip(rng, n=4))):
        for idx, g in enumerate(fs):
            rows.append((cid, idx, [v / 255.0 for v in _thumb_ref(g)]))
    df = spark.createDataFrame(
        rows, "id bigint, frame_idx int, feature array<double>")
    from graphraft_spark.ops.image_dedup import image_ahash_words

    hashed = image_ahash_words(df)
    got = {(r.id_a, r.id_b): (r.matched_frames, r.is_dup)
           for r in clip_frame_match_pairs(hashed).collect()}
    assert got[(1, 100)] == (3, True)
    assert all(not d or p == (1, 100) for p, (_, d) in got.items())


def test_trimmed_registry_query_flags_all_plants(spark):
    """d_video_trimmed_dup: every %10==0 doc's first-frame-trimmed
    plant is flagged with >= 3 matched frames (each trimmed frame
    matches its source frame exactly; a few docs' frames also
    near-collide with each other, adding legitimate extra matches)."""
    from graphraft_spark.registry.dedup_queries import d_video_trimmed_dup

    rows = d_video_trimmed_dup(spark, "/root/testdata/sf0.001").collect()
    got = {(r.id_a, r.id_b): (r.matched_frames, r.is_dup) for r in rows}
    docs = [r.doc_id for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id")
        .collect()]
    for d in docs:
        if d % 10 == 0:
            m, dup = got[(d, d + 1000000)]
            assert dup and m >= 3
