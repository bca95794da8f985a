"""Round-trip + spec-conformance tests for the stdlib PNG/WAV codecs
(functions/codecs.py) — no Spark session needed."""

import struct
import zlib

import pytest

from rlis2osm_spark.functions.codecs import (
    PNG_SIG, _chunk, decode_png, decode_wav, encode_png, encode_wav)


def _pixels(w, h, seed=7):
    return bytes((seed * 31 + k * 13) % 256 for k in range(w * h))


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (7, 3), (16, 9), (33, 2)])
@pytest.mark.parametrize("ft", [0, 1, 2])
def test_png_roundtrip(w, h, ft):
    px = _pixels(w, h)
    assert decode_png(encode_png(w, h, px, ft)) == (w, h, px)


def test_png_decode_average_and_paeth_filters():
    """The decoder must unfilter ALL five standard filters, not only the
    ones our encoder emits — build filter-3/4 scanlines by hand."""
    w, h = 6, 4
    px = _pixels(w, h, seed=3)
    raw = bytearray()
    prior = bytes(w)
    for r in range(h):
        row = px[r * w:(r + 1) * w]
        ft = 3 if r % 2 == 0 else 4
        raw.append(ft)
        for i in range(w):
            left = row[i - 1] if i else 0
            up = prior[i]
            ul = prior[i - 1] if i else 0
            if ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
            raw.append((row[i] - pred) & 0xFF)
        prior = row
    data = (PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    assert decode_png(data) == (w, h, px)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    rgb_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # color type 2
    data = (PNG_SIG + _chunk(b"IHDR", rgb_ihdr) + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(data)


def test_wav_roundtrip_and_clamp():
    samples = [0, 1, -1, 32767, -32768, 12345, -20000]
    rate, out = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100 and out == samples
    # out-of-range inputs clamp rather than wrap
    _, clamped = decode_wav(encode_wav([99999, -99999]))
    assert clamped == [32767, -32768]


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"RIFX....nope")
    # stereo header
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(data)


# ---------------------------------------------------------------------------
# property-based round trips (hypothesis, derandomized like test_properties)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=24),
    ft=st.sampled_from([0, 1, 2]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, ft, seed):
    px = bytes((seed * 31 + k * 7919) % 256 for k in range(w * h))
    assert decode_png(encode_png(w, h, px, ft)) == (w, h, px)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767),
                     min_size=0, max_size=400),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    got_rate, got = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and got == samples


@settings(max_examples=100, deadline=None, derandomize=True)
@given(data=st.binary(min_size=0, max_size=200),
       seed=st.sampled_from([0, 42, 123456789]))
def test_xxh64_matches_streamed_identity(data, seed):
    """Pure-Python XXH64 structural properties: stable under re-call,
    signed view round-trips, and the 32-byte stripe boundary behaves
    (values around the n>=32 branch differ from their neighbors)."""
    from rlis2osm_spark.functions.xxh64 import xxh64, xxh64_signed

    h1, h2 = xxh64(data, seed), xxh64(data, seed)
    assert h1 == h2 and 0 <= h1 < (1 << 64)
    s = xxh64_signed(data, seed)
    assert s % (1 << 64) == h1
    if data:
        assert xxh64(data[:-1], seed) != h1  # suffix sensitivity
