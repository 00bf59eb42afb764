"""Pure-stdlib PNG codec (ops/png.py): roundtrip across every color
type and filter type, malformed-input rejection, and the decode-based
grid feature — the contract a real PIL-backed ``decode_fn`` drop-in
must also satisfy (VERDICT r4 item 5)."""

import struct
import zlib

import pytest

from graphraft_spark.ops.png import png_decode, png_encode, png_grid_feature


def _pixels(width, height, channels, seed=1):
    return bytes((seed * 31 + i * 7) % 256
                 for i in range(width * height * channels))


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_every_colortype_and_filter(ctype, ch, filt):
    px = _pixels(13, 7, ch, seed=ctype * 10 + filt)
    blob = png_encode(13, 7, px, color_type=ctype, filters=[filt])
    w, h, c, out = png_decode(blob)
    assert (w, h, c) == (13, 7, ch)
    assert out == px


def test_roundtrip_mixed_filters_and_multi_idat():
    px = _pixels(16, 16, 3, seed=9)
    blob = png_encode(16, 16, px, color_type=2, filters=[0, 1, 2, 3, 4])
    assert png_decode(blob)[3] == px
    # re-split the IDAT into two chunks: decoders must concatenate
    sig, rest = blob[:8], blob[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos:pos + 4])
        chunks.append((rest[pos + 4:pos + 8], rest[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    rebuilt = sig
    for tag, body in chunks:
        if tag == b"IDAT":
            half = len(body) // 2
            for part in (body[:half], body[half:]):
                rebuilt += (struct.pack(">I", len(part)) + b"IDAT" + part
                            + struct.pack(
                                ">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF))
        else:
            rebuilt += (struct.pack(">I", len(body)) + tag + body
                        + struct.pack(
                            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    assert png_decode(rebuilt)[3] == px


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b"JUNK" + b[4:], "signature"),
    (lambda b: b[:20] + bytes([b[20] ^ 1]) + b[21:], "CRC"),
    (lambda b: b[:30], "truncated|missing|IHDR"),
])
def test_malformed_inputs_raise(mutate, msg):
    import re

    blob = png_encode(4, 4, _pixels(4, 4, 1))
    with pytest.raises(ValueError, match=f"(?i){msg}"):
        png_decode(mutate(blob))


def test_unsupported_features_raise():
    with pytest.raises(ValueError, match="color type"):
        png_encode(4, 4, _pixels(4, 4, 1), color_type=3)  # palette
    blob = bytearray(png_encode(4, 4, _pixels(4, 4, 1)))
    # patch IHDR bit depth to 16 and fix the CRC
    ihdr = bytearray(blob[16:29])
    ihdr[8] = 16
    blob[16:29] = ihdr
    blob[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(bytes(blob))


def test_grid_feature_smaller_than_grid():
    # 1-pixel-high image with a 2x2 grid: bottom cells are empty -> 0.0
    f = png_grid_feature(png_encode(2, 1, bytes([255, 255])), grid=2)
    assert f == [1.0, 1.0, 0.0, 0.0]


def test_grid_feature_known_values():
    # 4x4 grey image: left half 0, right half 200 -> cell means
    px = bytes([0, 0, 200, 200] * 4)
    f = png_grid_feature(png_encode(4, 4, px), grid=2)
    assert f == [0.0, 200 / 255.0, 0.0, 200 / 255.0]
    # RGB: pure red block -> luma 299*255//1000 = 76 everywhere
    rgb = bytes([255, 0, 0] * 16)
    f = png_grid_feature(png_encode(4, 4, rgb, color_type=2), grid=2)
    assert all(abs(v - 76 / 255.0) < 1e-9 for v in f)


def test_mm_png_feature_oracle_parity(spark):
    """The registry query's Spark result == its DuckDB oracle on the
    smoke scale — content-checked real decode inside mapInPandas."""
    import duckdb

    from graphraft_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    query = registry.EXTRA_QUERIES["mm_png_feature"]  # extra since r12
    got = {r["media_id"]: (r["c00"], r["c01"], r["c10"], r["c11"])
           for r in query(spark, sf).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
    want = {row[0]: tuple(row[1:])
            for row in con.sql(
                registry.EXTRA_ORACLES["mm_png_feature"]).fetchall()}
    assert got == want and len(got) == 500


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        ctype=st.sampled_from([0, 2, 4, 6]),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
        data=st.data())
    def test_roundtrip_property(w, h, ctype, filters, data):
        from graphraft_spark.ops.png import _CHANNELS

        n = w * h * _CHANNELS[ctype]
        px = bytes(data.draw(st.lists(
            st.integers(0, 255), min_size=n, max_size=n)))
        blob = png_encode(w, h, px, color_type=ctype, filters=filters)
        assert png_decode(blob) == (w, h, _CHANNELS[ctype], px)
except ImportError:  # pragma: no cover
    pass


def test_resize_nearest_greyscale_non_divisible():
    """src = floor(dst*in/out) nearest-neighbor, including a ratio that
    does not divide evenly (5 -> 2 samples indices 0 and 2)."""
    from graphraft_spark.ops.png import png_encode, png_resize_nearest

    px = bytes((x + 10 * y) % 256 for y in range(5) for x in range(5))
    p = png_encode(5, 5, px, color_type=0, filters=[0, 1, 2, 3, 4])
    got = png_resize_nearest(p, 2, 2)
    want = [v / 255.0 for v in (0, 2, 20, 22)]
    assert got == want


def test_resize_nearest_rgb_uses_same_luma_as_grid_feature():
    from graphraft_spark.ops.png import png_encode, png_resize_nearest

    # 2x2 RGB: distinct channels per pixel; resize to 1x1 samples (0,0)
    px = bytes([10, 200, 30,  0, 0, 0,
                0, 0, 0,     0, 0, 0])
    p = png_encode(2, 2, px, color_type=2)
    got = png_resize_nearest(p, 1, 1)
    want = [((299 * 10 + 587 * 200 + 114 * 30) // 1000) / 255.0]
    assert got == want


def test_resize_identity_roundtrips_pixels():
    from graphraft_spark.ops.png import png_encode, png_resize_nearest

    px = bytes((3 * i) % 256 for i in range(16))
    p = png_encode(4, 4, px, color_type=0)
    got = png_resize_nearest(p, 4, 4)
    assert got == [v / 255.0 for v in px]
