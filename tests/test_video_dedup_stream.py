"""streaming/image_dedup_stream.py at the VIDEO width: the pluggable
128-bit clip fingerprint through the same epoch-partitioned banded
index — stream==batch contract, cross-batch plant discovery, and epoch
idempotency at n_words=4."""

from graphraft_spark.ops.avi import avi_clip_thumbs, avi_encode
from graphraft_spark.ops.image_dedup import video_ahash_words


def test_stream_equals_batch_and_plants_cross_batch(spark):
    """After draining, the accumulated flags equal the one-shot
    d_video_neardup batch pipeline, and the planted remuxed/
    brightness-shifted clips are discovered by the CROSS-batch probe
    (plants are staged in the second micro-batch)."""
    from graphraft_spark.registry.dedup_queries import (
        d_stream_video_neardup,
        d_video_neardup,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.id_a, r.id_b, r.dist)
           for r in d_stream_video_neardup(spark, sf).collect()}
    want = {(r.id_a, r.id_b, r.dist)
            for r in d_video_neardup(spark, sf).collect()}
    assert got == want
    assert any(b >= 1000000 for _, b, _ in got)  # cross-batch plants


def test_epoch_replay_is_idempotent_at_video_width(spark, tmp_path):
    """Replaying an epoch overwrites its own partition — unchanged flag
    set, with the 4-word index schema."""
    from graphraft_spark.streaming.image_dedup_stream import (
        image_neardup_stream_flags,
        process_image_batch,
    )

    def clip(seed, shift=0, fps=25):
        frames = []
        for f in range(4):
            grey = [(seed * 7 + f * 13 + i) % 200 + shift
                    for i in range(256)]
            frames.append(bytes(v for v in grey for _ in range(3)))
        return avi_encode(frames, 16, 16, fps=fps)

    rows = [(1, clip(1)), (2, clip(2)),
            (100, clip(1, shift=40)),   # brightness twin of 1
            (200, clip(2, fps=50))]     # remux twin of 2
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    idx = str(tmp_path / "idx")
    kw = dict(
        decode_fn=lambda p: avi_clip_thumbs(p, every_n=2, tw=8, th=8,
                                            max_frames=2),
        max_dist=6, bands=8,
        hash_fn=lambda d: video_ahash_words(d, tiles=2, prefix="w"),
        n_words=4, kind="video")
    process_image_batch(df, 0, idx, **kw)
    once = {(r.id_a, r.id_b, r.dist)
            for r in image_neardup_stream_flags(spark, idx).collect()}
    process_image_batch(df, 0, idx, **kw)  # replay epoch 0
    again = {(r.id_a, r.id_b, r.dist)
             for r in image_neardup_stream_flags(spark, idx).collect()}
    assert once == again
    assert (1, 100, 0) in once and (2, 200, 0) in once
