"""Pure-stdlib uncompressed-AVI codec (ops/avi.py): roundtrip through
the RIFF container + bottom-up padded BGR DIB convention, sampled
iteration that skips unsampled pixel data, and loud rejection of
compressed frames."""

import struct

import pytest

from graphraft_spark.ops.avi import (
    avi_decode,
    avi_encode,
    avi_frame_energy,
    avi_frame_iter,
)


def _frames(n, w, h, seed=1):
    return [bytes((seed * 7 + f * 13 + i) % 256 for i in range(w * h * 3))
            for f in range(n)]


@pytest.mark.parametrize("w,h", [(4, 2), (3, 3), (1, 1), (5, 4)])
def test_roundtrip(w, h):
    fr = _frames(3, w, h, seed=w * 10 + h)
    width, height, fps, out = avi_decode(avi_encode(fr, w, h, fps=25))
    assert (width, height, fps) == (w, h, 25)
    assert out == fr


def test_row_padding_is_real():
    # width 3 -> 9-byte rows pad to 12; a decoder ignoring padding
    # would shear the image
    fr = _frames(2, 3, 2)
    assert avi_decode(avi_encode(fr, 3, 2))[3] == fr


def test_frame_iter_samples_without_full_decode():
    fr = _frames(7, 4, 2)
    blob = avi_encode(fr, 4, 2)
    got = list(avi_frame_iter(blob, every_n=3))
    assert [i for i, _ in got] == [0, 3, 6]
    assert [f for _, f in got] == [fr[0], fr[3], fr[6]]
    with pytest.raises(ValueError, match="every_n"):
        list(avi_frame_iter(blob, every_n=0))


def test_compressed_frames_rejected():
    blob = bytearray(avi_encode(_frames(1, 2, 2), 2, 2))
    i = blob.index(b"00db")
    blob[i:i + 4] = b"00dc"
    with pytest.raises(ValueError, match="00dc"):
        avi_decode(bytes(blob))


def test_malformed_inputs_raise():
    blob = avi_encode(_frames(2, 2, 2), 2, 2)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_decode(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        avi_decode(blob[:40])
    # frame chunk length inconsistent with dimensions
    bad = bytearray(blob)
    i = bad.index(b"00db")
    (ln,) = struct.unpack("<I", bad[i + 4:i + 8])
    bad[i + 4:i + 8] = struct.pack("<I", ln - 4)
    with pytest.raises(ValueError, match="dimensions|truncated"):
        avi_decode(bytes(bad))


def test_frame_energy_known_values():
    black = bytes(4 * 2 * 3)
    white = bytes([255] * (4 * 2 * 3))
    blob = avi_encode([black, white, black, white], 4, 2)
    assert avi_frame_energy(blob, every_n=2) == [0.0, 0.0]
    assert avi_frame_energy(blob, every_n=1) == [0.0, 1.0, 0.0, 1.0]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 8), h=st.integers(1, 8),
           n=st.integers(1, 5), fps=st.sampled_from([10, 25, 30]),
           data=st.data())
    def test_roundtrip_property(w, h, n, fps, data):
        sz = w * h * 3
        fr = [bytes(data.draw(st.lists(st.integers(0, 255),
                                       min_size=sz, max_size=sz)))
              for _ in range(n)]
        assert avi_decode(avi_encode(fr, w, h, fps=fps)) == (w, h, fps, fr)
except ImportError:  # pragma: no cover
    pass


def test_scene_cuts_flag_exactly_the_planted_cut(spark):
    """mm_scene_cuts: for every clip, is_cut is True at exactly the
    planted scene boundary (frame 2 + doc%3) and False elsewhere."""
    from graphraft_spark.registry.multimodal_queries import mm_scene_cuts

    rows = mm_scene_cuts(spark, "/root/testdata/sf0.001").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, {})[r.frame_idx] = r.is_cut
    assert by_doc  # corpus non-empty
    for doc, flags in by_doc.items():
        cut = 2 + doc % 3
        assert len(flags) == 6
        for f, v in flags.items():
            assert v == (f == cut), (doc, f)
