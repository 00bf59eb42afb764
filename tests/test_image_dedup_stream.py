"""streaming/image_dedup_stream.py: the incremental perceptual dedup's
stream==batch contract, cross-batch discovery, and epoch idempotency."""

from pyspark.sql import functions as F


def _batch_flags(spark, sf):
    from graphraft_spark.registry.dedup_queries import d_image_neardup

    return {(r.id_a, r.id_b, r.dist)
            for r in d_image_neardup(spark, sf).collect()}


def test_stream_equals_batch_and_plants_cross_batch(spark):
    """After draining, the accumulated flags equal the one-shot batch
    pipeline, and every planted pair was discovered by the CROSS-batch
    probe (plants are staged in the second micro-batch)."""
    from graphraft_spark.registry.dedup_queries import (
        d_stream_image_neardup,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.id_a, r.id_b, r.dist)
           for r in d_stream_image_neardup(spark, sf).collect()}
    assert got == _batch_flags(spark, sf)
    assert any(b >= 1000000 for _, b, _ in got)  # cross-batch plants


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-processing the same epoch overwrites its own partition — the
    flag set is unchanged."""
    from graphraft_spark.ops.png import png_encode, png_resize_nearest
    from graphraft_spark.streaming.image_dedup_stream import (
        image_neardup_stream_flags,
        process_image_batch,
    )

    def png(seed, shift=0):
        px = bytes((seed * 7 + i) % 200 + shift for i in range(256))
        return png_encode(16, 16, px, color_type=0)

    rows = [(1, png(1)), (2, png(2)), (100, png(1, 40))]  # 100 ~ 1
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    idx = str(tmp_path / "idx")
    decode = lambda p: png_resize_nearest(p, 8, 8)  # noqa: E731
    process_image_batch(df, 0, idx, decode)
    once = {(r.id_a, r.id_b, r.dist)
            for r in image_neardup_stream_flags(spark, idx).collect()}
    process_image_batch(df, 0, idx, decode)  # replay epoch 0
    again = {(r.id_a, r.id_b, r.dist)
             for r in image_neardup_stream_flags(spark, idx).collect()}
    assert once == again
    assert (1, 100, 0) in once  # brightness twin flagged within batch
