"""Pure-stdlib WAV codec (ops/wav.py): roundtrip, chunk-walk edge
cases, malformed-input rejection, and the decode-based window-energy
feature — the audio companion to the PNG decoder tests."""

import struct

import pytest

from graphraft_spark.ops.wav import wav_decode, wav_encode, wav_window_energy


def _samples(n, seed=1, lo=-32768, hi=32767):
    return [((seed * 7919 + i * 104729) % (hi - lo + 1)) + lo
            for i in range(n)]


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("n_frames", [1, 7, 128])
def test_roundtrip(channels, n_frames):
    s = _samples(n_frames * channels, seed=channels)
    rate, ch, out = wav_decode(wav_encode(s, rate=8000, channels=channels))
    assert (rate, ch) == (8000, channels)
    assert out == s


def test_unknown_chunks_skipped_word_aligned():
    blob = wav_encode(_samples(4))
    # splice an odd-length junk chunk (word-aligned with a pad byte)
    # between fmt and data
    fmt_end = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert wav_decode(spliced)[2] == _samples(4)


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b"JUNK" + b[4:], "RIFF"),
    (lambda b: b[:40], "truncated"),
    (lambda b: b.replace(b"fmt ", b"xmt "), "missing fmt"),
    (lambda b: b.replace(b"data", b"dutu"), "missing data"),
])
def test_malformed_inputs_raise(mutate, msg):
    blob = wav_encode(_samples(8))
    with pytest.raises(ValueError, match=f"(?i){msg}"):
        wav_decode(mutate(blob))


def test_unsupported_formats_raise():
    blob = bytearray(wav_encode(_samples(4)))
    i = blob.index(b"fmt ") + 8
    blob[i:i + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag"):
        wav_decode(bytes(blob))
    blob[i:i + 2] = struct.pack("<H", 1)
    blob[i + 14:i + 16] = struct.pack("<H", 8)  # 8-bit depth
    with pytest.raises(ValueError, match="bit depth"):
        wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="multiple of channels"):
        wav_encode([1, 2, 3], channels=2)
    with pytest.raises(ValueError, match="int16 range"):
        wav_encode([40000])


def test_window_energy_known_values():
    # 8 frames: first half amplitude 100, second half 200
    s = [100] * 4 + [200] * 4
    e = wav_window_energy(wav_encode(s), n_windows=2)
    assert e == [100 * 100 / 32768.0 ** 2, 200 * 200 / 32768.0 ** 2]
    # stereo mixes by sample-sum: (100 + 100)^2
    st = wav_window_energy(wav_encode([100, 100] * 4, channels=2),
                           n_windows=1)
    assert st == [200 * 200 / 32768.0 ** 2]


def test_mm_wav_energy_oracle_parity(spark):
    import duckdb

    from graphraft_spark.registry import EXTRA_ORACLES, EXTRA_QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    got = {r["media_id"]: (r["w0"], r["w1"])
           for r in EXTRA_QUERIES["mm_wav_energy"](spark, sf).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
    want = {row[0]: tuple(row[1:])
            for row in con.sql(EXTRA_ORACLES["mm_wav_energy"]).fetchall()}
    assert got == want and len(got) == 500


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(channels=st.integers(1, 3), n_frames=st.integers(0, 64),
           rate=st.sampled_from([8000, 16000, 44100]), data=st.data())
    def test_roundtrip_property(channels, n_frames, rate, data):
        n = n_frames * channels
        s = data.draw(st.lists(st.integers(-32768, 32767),
                               min_size=n, max_size=n))
        out = wav_decode(wav_encode(s, rate=rate, channels=channels))
        assert out == (rate, channels, s)
except ImportError:  # pragma: no cover
    pass


def test_resample_nearest_decimates_with_floor_stride():
    from graphraft_spark.ops.wav import wav_encode, wav_resample_nearest

    samples = [i * 100 for i in range(10)]
    p = wav_encode(samples)
    got = wav_resample_nearest(p, 4)
    # src = floor(d*10/4) = 0, 2, 5, 7
    assert got == [0.0, 200 / 32768.0, 500 / 32768.0, 700 / 32768.0]


def test_resample_nearest_stereo_takes_first_channel():
    from graphraft_spark.ops.wav import wav_encode, wav_resample_nearest

    # interleaved L/R: L = 10*i, R = -1
    inter = []
    for i in range(8):
        inter += [10 * i, -1]
    p = wav_encode(inter, channels=2)
    got = wav_resample_nearest(p, 2)
    # frames = 8; src frames 0 and 4 -> L samples 0 and 40
    assert got == [0.0, 40 / 32768.0]
