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
    # 16-bit depth stays behind the seam (RGB/palette decode as of r5)
    deep_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", deep_ihdr) + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(data)
    # a palette image without PLTE is malformed, loudly
    pal_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", pal_ihdr) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(data)
    # a supported header with NO IDAT is malformed input, not a zlib crash
    rgb_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", rgb_ihdr) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT"):
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
    # 6-channel PCM decodes since r6 — the remaining seam is exotic
    # format tags (GSM = 0x31) and absurd channel counts
    fmt = struct.pack("<HHIIHH", 0x31, 1, 8000, 1625, 65, 0)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(data)
    fmt = struct.pack("<HHIIHH", 1, 64, 8000, 96000, 128, 16)
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


# ---------------------------------------------------------------------------
# GIF (r4: pure-Python LZW over the public GIF89a spec)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (3, 7), (16, 16), (40, 13)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(w, h, interlace):
    from rlis2osm_spark.functions.codecs import decode_gif, encode_gif

    px = _pixels(w, h)
    assert decode_gif(encode_gif(w, h, px, interlace=interlace)) == (w, h, px)


def test_gif_decodes_real_compressed_stream():
    """The decoder must handle what a REAL compressing LZW encoder emits —
    growing code widths (9 -> 12 bits), the KwKwK case, table saturation at
    4096 — not just our literal-coded writer's 9-bit streams."""
    import struct

    from rlis2osm_spark.functions.codecs import (
        _GIF_GRAY_PALETTE, decode_gif)

    def compress(min_code, data):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = eoi + 1, min_code + 1
        out, w = [(clear, width)], b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            out.append((table[w], width))
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            w = bytes([ch])
        out.append((table[w], width))
        out.append((eoi, width))
        return out

    data = bytes((i * i + i // 3) % 200 for i in range(5000))
    codes = compress(8, data)
    assert max(cw for _, cw in codes) == 12  # the stream really grows
    bitbuf = bitlen = 0
    packed = bytearray()
    for code, cw in codes:
        bitbuf |= code << bitlen
        bitlen += cw
        while bitlen >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8
    if bitlen:
        packed.append(bitbuf & 0xFF)
    head = (b"GIF89a" + struct.pack("<HHBBB", 100, 50, 0xF7, 0, 0)
            + _GIF_GRAY_PALETTE
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, 100, 50, 0) + b"\x08")
    body = bytearray()
    for i in range(0, len(packed), 255):
        c = packed[i:i + 255]
        body.append(len(c))
        body += c
    body.append(0)
    assert decode_gif(head + bytes(body) + b"\x3B") == (100, 50, data)


def test_gif_skips_extensions_and_maps_palette():
    """GIF89a extensions (graphic control etc.) are skipped; non-gray
    palettes map through the exact integer luma."""
    import struct

    from rlis2osm_spark.functions.codecs import decode_gif, encode_gif

    g = encode_gif(4, 4, _pixels(4, 4))
    # splice a graphic-control extension between the palette and the image
    split = 13 + 768
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert decode_gif(g[:split] + ext + g[split:]) == decode_gif(g)

    # 2-entry local palette: red (luma 76) and white (luma 255).
    # Spec-minimum LZW code size is 2 (clear=4, eoi=5, initial width 3);
    # the width grows to 4 bits exactly when next_code reaches 8.
    pal = bytes((255, 0, 0)) + bytes((255, 255, 255))
    codes = [(4, 3), (0, 3), (1, 3), (0, 3), (1, 4), (5, 4)]  # clear,0,1,0,1,eoi
    bitbuf = bitlen = 0
    packed = bytearray()
    for code, cw in codes:
        bitbuf |= code << bitlen
        bitlen += cw
        while bitlen >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8
    if bitlen:
        packed.append(bitbuf & 0xFF)
    raw = (b"GIF87a" + struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
           + b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80) + pal
           + b"\x02" + bytes([len(packed)]) + bytes(packed) + b"\x00\x3B")
    assert decode_gif(raw) == (2, 2, bytes((76, 255, 76, 255)))


def test_gif_rejects_unsupported():
    from rlis2osm_spark.functions.codecs import decode_gif, encode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        encode_gif(2, 2, b"abc")  # wrong pixel count
    truncated = encode_gif(4, 4, _pixels(4, 4))[:20]
    with pytest.raises((ValueError, struct.error)):
        decode_gif(truncated)


def test_image_seam_routes_gif_and_audio_seam_rejects_avi(spark):
    """decode_stub=False: gif payloads decode for real; a RIFF container
    that is NOT WAVE (e.g. AVI) hits the documented NotImplementedError
    seam, not a bare ValueError mid-job (ADVICE r3)."""
    from pyspark.errors.exceptions.captured import PythonException

    from rlis2osm_spark.functions.codecs import encode_gif
    from rlis2osm_spark.operators.multimodal import (
        extract_audio_features, extract_image_features)

    gif = encode_gif(3, 2, bytes(range(6)), interlace=True)
    df = spark.createDataFrame([("m:1", gif)], "media_ref string, payload binary")
    row = extract_image_features(df, decode_stub=False).collect()[0]
    assert (row.format_guess, row.width, row.height) == ("gif", 3, 2)
    assert row.px_sum == sum(range(6))

    avi = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI " + b"\x00" * 16
    bad = spark.createDataFrame([("m:2", avi)], "media_ref string, payload binary")
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_audio_features(bad, decode_stub=False).collect()


# ---------------------------------------------------------------------------
# JPEG (r4: baseline sequential grayscale, pure Python + numpy per T.81)
# ---------------------------------------------------------------------------

def _const_block_image(bw, bh, seed):
    import numpy as np

    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for k in range(bw * bh):
        by, bx = divmod(k, bw)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
            2 * ((seed * 37 + k * 29) % 128)
    return img


@pytest.mark.parametrize("bw,bh", [(1, 1), (3, 2), (5, 4)])
@pytest.mark.parametrize("restart_every", [0, 1, 3])
def test_jpeg_exact_on_even_constant_blocks(bw, bh, restart_every):
    """Even-valued constant 8x8 blocks are the DCT-exact subclass: DC-only
    spectra whose quantize->dequantize round-trips bit-for-bit ((v-128)*8
    divisible by q00=16). The lossy codec must reproduce them EXACTLY,
    with and without restart markers (DRI + RSTn + DC-predictor reset)."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_gray)

    img = _const_block_image(bw, bh, seed=11)
    data = encode_jpeg_gray(bw * 8, bh * 8, img.tobytes(),
                            restart_every=restart_every)
    w, h, px = decode_jpeg_gray(data)
    assert (w, h) == (bw * 8, bh * 8)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


def test_jpeg_lossy_bound_on_smooth_image():
    """Arbitrary smooth content: decoded output must sit within a tight
    quantization-error bound of the source (the codec is really doing
    DCT + quant, not a passthrough)."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_gray)

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = (128 + 60 * np.sin(xx / 10) + 50 * np.cos(yy / 9)
           ).clip(0, 255).astype(np.uint8)
    _, _, px = decode_jpeg_gray(encode_jpeg_gray(64, 48, img.tobytes()))
    err = np.abs(np.frombuffer(px, np.uint8).reshape(48, 64).astype(int)
                 - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3


def test_jpeg_odd_dims_and_rejects():
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_gray)

    img = (np.arange(13 * 9) % 250).astype(np.uint8)
    w, h, px = decode_jpeg_gray(encode_jpeg_gray(13, 9, img.tobytes()))
    assert (w, h) == (13, 9) and len(px) == 117

    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg")
    with pytest.raises(ValueError):
        encode_jpeg_gray(4, 4, b"wrong size")
    # hierarchical mode (SOF5) hits the seam (progressive SOF2 decodes
    # for real as of r5, sequential arithmetic SOF9 as of r6)
    base = encode_jpeg_gray(8, 8, bytes(64))
    sof0 = base.find(b"\xff\xc0")
    hier = base[:sof0] + b"\xff\xc5" + base[sof0 + 2:]
    with pytest.raises(NotImplementedError, match="hierarchical"):
        decode_jpeg_gray(hier)
    # a baseline scan header mislabeled SOF2 is malformed (a progressive
    # DC scan cannot span Se=63) — ValueError, not silent nonsense
    mislabeled = base[:sof0] + b"\xff\xc2" + base[sof0 + 2:]
    with pytest.raises(ValueError):
        decode_jpeg_gray(mislabeled)


def test_progressive_jpeg_missing_dht_is_valueerror():
    """A progressive stream whose scan references an undefined huffman
    table (DHT stripped) is malformed input -> ValueError, not a raw
    TypeError from iterating None (ADVICE r5)."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (decode_jpeg_gray,
                                                 encode_jpeg_progressive)

    img = (np.arange(16 * 16) % 251).astype(np.uint8)
    data = encode_jpeg_progressive(16, 16, img.tobytes())
    # drop every DHT (FFC4) segment; scans then reference missing tables
    out, pos = bytearray(), 0
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] == 0xC4:
            seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
            pos += 2 + seglen
        else:
            out.append(data[pos])
            pos += 1
    out.extend(data[pos:])
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(out))


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video container (r4)
# ---------------------------------------------------------------------------

def test_avi_mjpeg_roundtrip_and_frame_decode():
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_avi_mjpeg, decode_jpeg_gray, encode_avi_mjpeg,
        encode_jpeg_gray)

    w, h = 24, 16
    imgs = [_const_block_image(3, 2, seed=s) for s in range(5)]
    frames = [encode_jpeg_gray(w, h, im.tobytes()) for im in imgs]
    avi = encode_avi_mjpeg(frames, w, h, fps=12)
    w2, h2, out = decode_avi_mjpeg(avi)
    assert (w2, h2) == (w, h) and out == frames
    for f, im in zip(out, imgs):
        _, _, px = decode_jpeg_gray(f)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), im)


def test_avi_rejects_and_seam():
    from rlis2osm_spark.functions.codecs import (
        decode_avi_mjpeg, encode_avi_mjpeg, encode_jpeg_gray)

    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8)
    frame = encode_jpeg_gray(8, 8, bytes(64))
    avi = encode_avi_mjpeg([frame], 8, 8)
    h264 = avi.replace(b"vidsMJPG", b"vidsH264", 1)
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi_mjpeg(h264)


def test_extract_video_frames_operator(spark):
    """The video path end-to-end at the operator boundary: container parse
    + every_n sampling + per-frame JPEG decode with exact pixel sums."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        encode_avi_mjpeg, encode_jpeg_gray)
    from rlis2osm_spark.operators.multimodal import extract_video_frames

    rows = []
    expected = {}
    for i in range(6):
        n = 2 + i % 3
        frames, sums = [], []
        for f in range(n):
            im = _const_block_image(2, 1, seed=i * 10 + f)
            frames.append(encode_jpeg_gray(16, 8, im.tobytes()))
            sums.append(int(im.sum()))
        rows.append((f"v:{i}", encode_avi_mjpeg(frames, 16, 8)))
        expected[f"v:{i}"] = {(idx, sums[idx]) for idx in range(0, n, 2)}
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = extract_video_frames(df, every_n=2, decode_stub=False).collect()
    by_ref: dict = {}
    for r in got:
        assert (r.width, r.height) == (16, 8)
        by_ref.setdefault(r.media_ref, set()).add((r.frame_idx, r.px_sum))
    assert by_ref == expected


def test_jpeg_tolerates_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    real encoders emit them for alignment (review r4)."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_gray)

    img = _const_block_image(2, 2, seed=5)
    data = encode_jpeg_gray(16, 16, img.tobytes())
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    w, h, px = decode_jpeg_gray(padded)
    assert (w, h) == (16, 16)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(16, 16), img)


def test_gif_and_jpeg_truncation_raises_valueerror():
    """The codec error contract at the operator seam: malformed/truncated
    input raises ValueError, never a bare IndexError/KeyError (review r4)."""
    from rlis2osm_spark.functions.codecs import (
        decode_gif, decode_jpeg_gray, encode_gif, encode_jpeg_gray)

    g = encode_gif(16, 16, _pixels(16, 16))
    j = encode_jpeg_gray(16, 16, _pixels(16, 16))
    for cut in (13, 20, len(g) - 5, 796 if len(g) > 796 else len(g) - 1):
        with pytest.raises(ValueError):
            decode_gif(g[:cut])
    # mid-extension truncation
    ext = g[:13 + 768] + b"\x21\xf9\x04"
    with pytest.raises(ValueError):
        decode_gif(ext)
    # truncated entropy data must raise — including shave-the-tail cuts:
    # consuming even one zero-fill bit past end-of-stream means the final
    # MCU(s) decoded fabricated coefficients (ADVICE r4 — the old slack
    # window silently accepted up to ~8 fabricated bytes)
    big = encode_jpeg_gray(64, 64, _pixels(64, 64))
    for cut in (4, 30, int(len(big) * 0.6), len(big) - 5, len(big) - 3):
        with pytest.raises(ValueError):
            decode_jpeg_gray(big[:cut])
    # losing ONLY the EOI marker leaves the entropy data intact: decode
    # succeeds and the pixels are still exact (nothing fabricated)
    w, h, px = decode_jpeg_gray(big)
    w2, h2, px2 = decode_jpeg_gray(big[:-2])
    assert (w, h, px) == (w2, h2, px2)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_color_decode_luma(subsampling):
    """r4.1: the decoder handles interleaved multi-component baseline color
    (per-component sampling factors, quant and huffman table ids, chroma
    blocks sync-decoded) and returns the full-resolution LUMA plane —
    exact on even-constant blocks, quantization-bounded on smooth
    content."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_color)

    img = _const_block_image(4, 4, seed=21)  # 32x32: 2x2 MCUs at 4:2:0
    j = encode_jpeg_color(32, 32, img.tobytes(), subsampling=subsampling)
    w, h, px = decode_jpeg_gray(j)
    assert (w, h) == (32, 32)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(32, 32), img)

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = (128 + 60 * np.sin(xx / 10) + 50 * np.cos(yy / 9)
              ).clip(0, 255).astype(np.uint8)
    js = encode_jpeg_color(64, 48, smooth.tobytes(), subsampling=subsampling)
    _, _, pxs = decode_jpeg_gray(js)
    err = np.abs(np.frombuffer(pxs, np.uint8).reshape(48, 64).astype(int)
                 - smooth.astype(int))
    assert err.max() <= 12 and err.mean() < 3

    # odd dims crossing the 16-px MCU tile at 4:2:0
    odd = _const_block_image(3, 2, seed=5)[:13, :21]
    jo = encode_jpeg_color(21, 13, np.ascontiguousarray(odd).tobytes(),
                           subsampling=subsampling)
    wo, ho, pxo = decode_jpeg_gray(jo)
    assert (wo, ho) == (21, 13)
    assert np.array_equal(
        np.frombuffer(pxo, np.uint8).reshape(13, 21), odd)


def _expected_rgb(y, cb, cr):
    import numpy as np

    r = y.astype(float) + 1.402 * (cr.astype(float) - 128.0)
    g = (y.astype(float) - 0.344136 * (cb.astype(float) - 128.0)
         - 0.714136 * (cr.astype(float) - 128.0))
    b = y.astype(float) + 1.772 * (cb.astype(float) - 128.0)
    return np.clip(np.floor(np.stack([r, g, b], axis=-1) + 0.5),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_jpeg_color_decode_rgb_exact(subsampling):
    """r5 (VERDICT r4 #2): full RGB output. Chroma values 128 + 17k (17 =
    chroma DC quant step) on block-constant planes round-trip exactly, so
    decoded RGB must equal the analytic JFIF conversion bit-for-bit —
    including clamped channels."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg, encode_jpeg_color)

    img = _const_block_image(4, 4, seed=21)  # 32x32
    hy = 2 if subsampling == "4:2:0" else 1
    cw = 32 // hy
    # chroma constant per 8x8 chroma BLOCK, different across blocks:
    # exercises the upsample geometry, stays DC-only exact
    ks = np.arange(cw // 8 * (cw // 8)).reshape(cw // 8, cw // 8) % 5 - 2
    cb_small = np.kron(128 + 17 * ks, np.ones((8, 8), int)).astype(np.uint8)
    ks2 = (np.arange(cw // 8 * (cw // 8)).reshape(cw // 8, cw // 8) * 3) % 5 - 2
    cr_small = np.kron(128 + 17 * ks2, np.ones((8, 8), int)).astype(np.uint8)

    j = encode_jpeg_color(32, 32, img.tobytes(), subsampling=subsampling,
                          cb_pixels=cb_small.tobytes(),
                          cr_pixels=cr_small.tobytes())
    w, h, nch, px = decode_jpeg(j)
    assert (w, h, nch) == (32, 32, 3)
    got = np.frombuffer(px, np.uint8).reshape(32, 32, 3)

    # nearest upsample expectation: output (x, y) -> chroma (x//hy, y//hy)
    idx = np.arange(32) // hy
    cb_full = cb_small[np.ix_(idx, idx)]
    cr_full = cr_small[np.ix_(idx, idx)]
    assert np.array_equal(got, _expected_rgb(img, cb_full, cr_full))

    # gray stream through the same API: 1 channel, identical plane
    from rlis2osm_spark.functions.codecs import encode_jpeg_gray
    g = encode_jpeg_gray(32, 32, img.tobytes())
    wg, hg, nchg, pxg = decode_jpeg(g)
    assert (wg, hg, nchg) == (32, 32, 1)
    assert np.array_equal(np.frombuffer(pxg, np.uint8).reshape(32, 32), img)


def test_jpeg_progressive_matches_baseline_decode():
    """r5 stretch (VERDICT r4 #8): progressive (SOF2) decode. The
    progressive encoder emits the SAME quantized coefficients as the
    baseline encoder through a DC-first/refine + per-band AC spectral
    selection with two successive-approximation refinement passes
    (EOBRUN joins, ZRL, correction bits) — so progressive decode must be
    pixel-identical to baseline decode on every input."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg, decode_jpeg_gray, encode_jpeg_gray,
        encode_jpeg_progressive)

    rng = np.random.default_rng(7)
    cases = []
    for w, h in [(8, 8), (16, 16), (21, 13), (64, 48), (40, 33)]:
        cases.append(rng.integers(0, 256, (h, w), dtype=np.uint8))
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        cases.append(((xx * 3 + yy * 5) % 256).astype(np.uint8))
        cases.append(np.ascontiguousarray(np.kron(
            rng.integers(0, 128, ((h + 7) // 8, (w + 7) // 8)) * 2,
            np.ones((8, 8), int))[:h, :w]).astype(np.uint8))
    for img in cases:
        h, w = img.shape
        base = decode_jpeg_gray(encode_jpeg_gray(w, h, img.tobytes()))
        blob = encode_jpeg_progressive(w, h, img.tobytes())
        assert blob[2:4] != b"\xff\xc0"  # really SOF2, not baseline
        assert decode_jpeg_gray(blob) == base
        # and through the RGB-capable API
        wj, hj, nch, px = decode_jpeg(blob)
        assert (wj, hj, nch) == (w, h, 1) and px == base[2]

    # DCT-exact subclass: constant even blocks round-trip bit-for-bit
    img = cases[2]
    h, w = img.shape
    _, _, px = decode_jpeg_gray(encode_jpeg_progressive(w, h, img.tobytes()))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_progressive_color_matches_baseline(subsampling):
    """Color progressive: MCU-interleaved DC scans across three
    components + per-component AC band/refinement scans must decode to
    the same RGB as the baseline color encoding of the same planes."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(19)
    for w, h in [(16, 16), (24, 16), (21, 13)]:
        hy, vy = {"4:4:4": (1, 1), "4:2:2": (2, 1),
                  "4:2:0": (2, 2)}[subsampling]
        cw, ch = -(-w // hy), -(-h // vy)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        base = C.decode_jpeg(C.encode_jpeg_color(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        prog = C.decode_jpeg(C.encode_jpeg_progressive(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        assert base == prog
        assert base[2] == 3


def test_jpeg_progressive_truncation_raises():
    """A progressive stream cut inside any scan must raise, same strict
    contract as baseline (zero-fill bits are never silently decoded)."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_progressive)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    blob = encode_jpeg_progressive(32, 32, img.tobytes())
    for cut in (int(len(blob) * 0.4), int(len(blob) * 0.7), len(blob) - 6):
        with pytest.raises(ValueError):
            decode_jpeg_gray(blob[:cut])


def _build_png(img, ctype, filters):
    """Independent PNG writer (filters applied with plain numpy, not the
    codec's logic): img is (h, w, ch) uint8."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    h, w, ch = img.shape
    bpp = ch
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int64)
    for r in range(h):
        row = img[r].reshape(-1).astype(np.int64)
        ft = filters[r % len(filters)]
        left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prior
        elif ft == 3:
            enc = row - (left + prior) // 2
        else:  # Paeth
            p = left + prior - pleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prior),
                          np.abs(p - pleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, pleft))
            enc = row - pred
        raw.append(ft)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prior = row

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = _st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zl.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_color_types_decode_all_filters(ctype, ch):
    """r5: color-type 0/2/4/6 PNG decode against an INDEPENDENT writer —
    every standard filter, with the left-neighbor at bpp distance."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png, decode_png_ex

    rng = np.random.default_rng(31)
    for w, h in [(1, 1), (5, 4), (16, 11)]:
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        blob = _build_png(img, ctype, filters=[0, 1, 2, 3, 4])
        dw, dh, nch, px = decode_png_ex(blob)
        assert (dw, dh, nch) == (w, h, ch)
        assert np.array_equal(
            np.frombuffer(px, np.uint8).reshape(h, w, ch), img)
    if ch != 1:
        with pytest.raises(ValueError, match="grayscale API"):
            decode_png(blob)


def test_png_adam7_interlace_decode():
    """r5: Adam7 PNG — seven independently-filtered passes reassemble to
    the original image; verified against an independent pass-splitting
    writer for gray and RGB, with all five filters cycling per row."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png_ex

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    def build_adam7(img, ctype):
        h, w, ch = img.shape
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            prior = np.zeros(pw * ch, dtype=np.int64)
            for r in range(ph):
                row = sub[r].reshape(-1).astype(np.int64)
                ft = r % 5
                left = np.concatenate([np.zeros(ch, np.int64), row[:-ch]])
                pleft = np.concatenate([np.zeros(ch, np.int64),
                                        prior[:-ch]])
                if ft == 0:
                    enc = row
                elif ft == 1:
                    enc = row - left
                elif ft == 2:
                    enc = row - prior
                elif ft == 3:
                    enc = row - (left + prior) // 2
                else:
                    p = left + prior - pleft
                    pa, pb, pc = (np.abs(p - left), np.abs(p - prior),
                                  np.abs(p - pleft))
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, prior, pleft))
                    enc = row - pred
                raw.append(ft)
                raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
                prior = row
        ihdr = _st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)  # interlaced
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zl.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(17)
    for (w, h), (ctype, ch) in [((16, 16), (0, 1)), ((13, 9), (2, 3)),
                                ((7, 5), (6, 4)), ((1, 1), (0, 1)),
                                ((3, 11), (0, 1))]:
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        dw, dh, nch, px = decode_png_ex(build_adam7(img, ctype))
        assert (dw, dh, nch) == (w, h, ch)
        assert np.array_equal(
            np.frombuffer(px, np.uint8).reshape(h, w, ch), img)


def test_png_sub_byte_depths_decode():
    """r5: depth 1/2/4 gray and palette PNG — bits unpack MSB-first with
    row padding dropped, filters run on the packed bytes (bpp=1), gray
    scales exactly to 8-bit."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png_ex

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    def pack_bits(vals, depth):
        per = 8 // depth
        out = bytearray()
        for i in range(0, len(vals), per):
            b = 0
            for j, v in enumerate(vals[i:i + per]):
                b |= int(v) << (8 - depth * (j + 1))
            out.append(b)
        return bytes(out)

    rng = np.random.default_rng(3)
    for depth in (1, 2, 4):
        for w, h in [(5, 3), (8, 4), (13, 2)]:
            vals = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
            raw = bytearray()
            prior = None
            for r in range(h):
                packed = pack_bits(vals[r], depth)
                if r % 2 == 0 or prior is None:
                    raw.append(0)
                    raw.extend(packed)
                else:  # Up filter on the packed bytes
                    raw.append(2)
                    raw.extend((np.frombuffer(packed, np.uint8)
                                - np.frombuffer(prior, np.uint8)).tobytes())
                prior = packed
            ihdr = _st.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
            blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", _zl.compress(bytes(raw)))
                    + chunk(b"IEND", b""))
            dw, dh, nch, px = decode_png_ex(blob)
            assert (dw, dh, nch) == (w, h, 1)
            scale = 255 // ((1 << depth) - 1)
            assert np.array_equal(
                np.frombuffer(px, np.uint8).reshape(h, w), vals * scale)

    # sub-byte palette: indices resolve through PLTE
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    vals = rng.integers(0, 4, (3, 6), dtype=np.uint8)
    raw = bytearray()
    for r in range(3):
        raw.append(0)
        raw.extend(pack_bits(vals[r], 2))
    ihdr = _st.pack(">IIBBBBB", 6, 3, 2, 3, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", _zl.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    dw, dh, nch, px = decode_png_ex(blob)
    assert (dw, dh, nch) == (6, 3, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(3, 6, 3),
                          pal[vals])


def test_png16_exact_decode():
    """r5: 16-bit PNG decodes EXACTLY via decode_png16 (no 8-bit
    truncation); filters run byte-level with the 2*channels distance."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png16, decode_png_ex

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    rng = np.random.default_rng(7)
    for ctype, ch in [(0, 1), (2, 3)]:
        w, h = 7, 5
        img = rng.integers(0, 1 << 16, (h, w, ch), dtype=np.uint16)
        be = img.astype(">u2").tobytes()
        rows = np.frombuffer(be, np.uint8).reshape(h, w * ch * 2)
        raw = bytearray()
        prior = np.zeros(w * ch * 2, dtype=np.int64)
        bpp = ch * 2
        for r in range(h):
            row = rows[r].astype(np.int64)
            ft = [0, 1, 2][r % 3]
            if ft == 0:
                enc = row
            elif ft == 1:
                left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
                enc = row - left
            else:
                enc = row - prior
            raw.append(ft)
            raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
            prior = row
        ihdr = _st.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
        blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zl.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        dw, dh, nch, px = decode_png16(blob)
        assert (dw, dh, nch) == (w, h, ch)
        assert np.array_equal(
            np.frombuffer(px, "<u2").reshape(h, w, ch), img)
        # the 8-bit API points at decode_png16, loudly
        with pytest.raises(NotImplementedError, match="decode_png16"):
            decode_png_ex(blob)


def test_png_adam7_sub_byte_and_16bit():
    """r5: Adam7 at sub-byte depths (per-pass bit packing) and Adam7
    16-bit (via decode_png16) — independent writers again."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png16, decode_png_ex

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    def pack_bits(vals, depth):
        per = 8 // depth
        out = bytearray()
        for i in range(0, len(vals), per):
            b = 0
            for j, v in enumerate(vals[i:i + per]):
                b |= int(v) << (8 - depth * (j + 1))
            out.append(b)
        return bytes(out)

    rng = np.random.default_rng(29)

    # Adam7 depth-2 gray, filter 0 rows (bit packing is the new surface)
    w, h, depth = 11, 9, 2
    vals = rng.integers(0, 4, (h, w), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = vals[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in range(sub.shape[0]):
            raw.append(0)
            raw.extend(pack_bits(sub[r], depth))
    ihdr = _st.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zl.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    dw, dh, nch, px = decode_png_ex(blob)
    assert (dw, dh, nch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w),
                          vals * 85)

    # Adam7 16-bit gray, Up filter within passes
    w, h = 10, 6
    img = rng.integers(0, 1 << 16, (h, w), dtype=np.uint16)
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        rows = np.frombuffer(sub.astype(">u2").tobytes(),
                             np.uint8).reshape(sub.shape[0], -1)
        prior = np.zeros(rows.shape[1], dtype=np.int64)
        for r in range(rows.shape[0]):
            row = rows[r].astype(np.int64)
            raw.append(2)  # Up
            raw.extend(((row - prior) & 0xFF).astype(np.uint8).tobytes())
            prior = row
    ihdr = _st.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zl.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    dw, dh, nch, px = decode_png16(blob)
    assert (dw, dh, nch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, "<u2").reshape(h, w), img)


def test_png_palette_decode():
    """r5: palette (type 3) PNG resolves indices through PLTE to RGB."""
    import struct as _st
    import zlib as _zl

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png_ex

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(6))

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _st.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", _zl.compress(raw))
            + chunk(b"IEND", b""))
    w, h, nch, px = decode_png_ex(blob)
    assert (w, h, nch) == (5, 6, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(6, 5, 3),
                          pal[idx])
    # out-of-range palette index fails loudly
    bad_pal = pal[:8]
    blob_bad = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", _st.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", bad_pal.tobytes())
                + chunk(b"IDAT", _zl.compress(raw))
                + chunk(b"IEND", b""))
    import pytest as _pt
    with _pt.raises(ValueError, match="palette index"):
        decode_png_ex(blob_bad)


def test_png_color_encode_roundtrip():
    """r5: encode_png channels=2/3/4 round-trips through decode_png_ex
    for every supported encode filter."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_png_ex, encode_png

    rng = np.random.default_rng(13)
    for ch in (1, 2, 3, 4):
        for ft in (0, 1, 2):
            img = rng.integers(0, 256, (7, 9, ch), dtype=np.uint8)
            blob = encode_png(9, 7, img.tobytes(), filter_type=ft,
                              channels=ch)
            w, h, nch, px = decode_png_ex(blob)
            assert (w, h, nch) == (9, 7, ch)
            assert np.array_equal(
                np.frombuffer(px, np.uint8).reshape(7, 9, ch), img)
    with pytest.raises(ValueError):
        encode_png(2, 2, bytes(20), channels=5)


def test_wav_formats_decode():
    """r5: 8-bit unsigned PCM, stereo 16-bit PCM and IEEE float32 WAVs
    decode; GSM stays behind the seam (ADPCM decodes as of r6)."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_wav

    def wav(afmt, channels, bits, body):
        fmt = _st.pack("<HHIIHH", afmt, channels, 8000,
                       8000 * channels * bits // 8,
                       channels * bits // 8, bits)
        riff = (b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
                + b"data" + _st.pack("<I", len(body)) + body)
        return b"RIFF" + _st.pack("<I", len(riff)) + riff

    # 8-bit unsigned -> re-centred signed
    rate, s = decode_wav(wav(1, 1, 8, bytes([0, 128, 255, 200])))
    assert rate == 8000 and s == [-128, 0, 127, 72]
    # stereo 16-bit: interleaved
    body = np.array([100, -100, 32767, -32768], dtype="<i2").tobytes()
    _, s = decode_wav(wav(1, 2, 16, body))
    assert s == [100, -100, 32767, -32768]
    # float32
    body = np.array([0.5, -0.25], dtype="<f4").tobytes()
    _, s = decode_wav(wav(3, 1, 32, body))
    assert s == [0.5, -0.25]
    # GSM (fmt 49) is the seam (MS-ADPCM decodes as of r6); a fmt-2
    # header whose block align can't even hold the 7-byte block header
    # is malformed, not a seam
    with pytest.raises(NotImplementedError):
        decode_wav(wav(49, 1, 0, b"\x00\x00"))
    with pytest.raises(ValueError, match="block align"):
        decode_wav(wav(2, 1, 4, b"\x00\x00"))


def test_jpeg_lossless_roundtrip_all_predictors():
    """r5: SOF3 lossless JPEG — every predictor must round-trip ANY image
    bit-for-bit (no DCT-exactness precondition); point transform is the
    documented near-lossless mode; truncation raises."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(8)
    for pred in range(1, 8):
        w, h = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        blob = C.encode_jpeg_lossless(w, h, img.tobytes(), predictor=pred)
        W, H, px = C.decode_jpeg_gray(blob)
        assert (W, H) == (w, h)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = C.encode_jpeg_lossless(16, 16, img.tobytes(), point_transform=1)
    _, _, px = C.decode_jpeg_gray(blob)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(16, 16),
                          (img >> 1) << 1)
    W, H, nch, px = C.decode_jpeg(C.encode_jpeg_lossless(9, 7,
                                                         bytes(range(63))))
    assert (W, H, nch) == (9, 7, 1) and px == bytes(range(63))
    full = C.encode_jpeg_lossless(
        32, 32, rng.integers(0, 256, 1024, dtype=np.uint8).tobytes())
    for cut in (len(full) // 2, len(full) - 4):
        with pytest.raises(ValueError):
            C.decode_jpeg_gray(full[:cut])
    with pytest.raises(ValueError):
        C.encode_jpeg_lossless(4, 4, bytes(16), predictor=9)


def test_bmp_decode_24_8_32bit():
    """r5: BMP decode — 24-bit BGR (bottom-up AND top-down), 8-bit
    palettized through the BGRX table, 32-bit BGRX; 4-byte row
    alignment; RLE stays behind the seam. Files built independently."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_bmp

    rng = np.random.default_rng(6)

    def bmp(width, height_signed, bits, pixel_rows, table=b"", comp=0,
            clr_used=0):
        info = _st.pack("<IiiHHIIiiII", 40, width, height_signed, 1, bits,
                        comp, len(pixel_rows), 0, 0, clr_used, 0)
        off = 14 + 40 + len(table)
        head = b"BM" + _st.pack("<IHHI", off + len(pixel_rows), 0, 0, off)
        return head + info + table + pixel_rows

    # 24-bit bottom-up with stride padding (width 3 -> stride 12)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)  # RGB truth
    rows = bytearray()
    for r in (1, 0):  # bottom-up
        for c in range(3):
            rows += bytes([img[r, c, 2], img[r, c, 1], img[r, c, 0]])
        rows += b"\x00\x00\x00"  # pad to 12
    w, h, nch, px = decode_bmp(bmp(3, 2, 24, bytes(rows)))
    assert (w, h, nch) == (3, 2, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(2, 3, 3), img)

    # the same image top-down (negative height)
    rows_td = bytearray()
    for r in (0, 1):
        for c in range(3):
            rows_td += bytes([img[r, c, 2], img[r, c, 1], img[r, c, 0]])
        rows_td += b"\x00\x00\x00"
    assert decode_bmp(bmp(3, -2, 24, bytes(rows_td)))[3] == px

    # 8-bit palettized (BGRX table), width 5 -> stride 8
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)  # RGB truth
    table = b"".join(bytes([p[2], p[1], p[0], 0]) for p in pal)
    idx = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    rows8 = b"".join(idx[r].tobytes() + b"\x00\x00\x00"
                     for r in (2, 1, 0))
    w, h, nch, px = decode_bmp(bmp(5, 3, 8, rows8, table, clr_used=16))
    assert (w, h, nch) == (5, 3, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(3, 5, 3),
                          pal[idx])

    # 32-bit BGRX: X dropped
    rows32 = b"".join(bytes([9, 8, 7, 0xAA]) for _ in range(2))
    w, h, nch, px = decode_bmp(bmp(2, 1, 32, rows32))
    assert (w, h, nch) == (2, 1, 3)
    assert px == bytes([7, 8, 9, 7, 8, 9])

    # comp=4 is BI_JPEG since r6 — garbage embedded bytes are malformed
    # input, unknown compressions stay a loud seam
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_bmp(bmp(2, 1, 8, b"\x00" * 8, b"\x00" * 64, comp=4))
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bmp(2, 1, 8, b"\x00" * 8, b"\x00" * 64, comp=6))
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp(3, 2, 24, bytes(rows)[:-8]))


def test_gif_animation_compositing():
    """r5: animated GIF decode — rect placement, transparent index,
    and all three disposal methods, verified against an independent
    numpy compositor over the same frame plan."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_gif_frames, encode_gif_anim)

    rng = np.random.default_rng(41)
    sw, sh = 20, 12
    plan = [
        # full-canvas base frame
        dict(left=0, top=0, width=sw, height=sh,
             pixels=rng.integers(0, 256, sw * sh, dtype=np.uint8).tobytes(),
             disposal=1),
        # small overlay with transparency, keep after
        dict(left=3, top=2, width=6, height=5,
             pixels=rng.integers(0, 256, 30, dtype=np.uint8).tobytes(),
             transparent=7, disposal=1, interlace=True),
        # overlay restored to background after display
        dict(left=10, top=4, width=8, height=6,
             pixels=rng.integers(0, 256, 48, dtype=np.uint8).tobytes(),
             disposal=2),
        # overlay restored to PREVIOUS canvas after display
        dict(left=1, top=1, width=4, height=4,
             pixels=rng.integers(0, 256, 16, dtype=np.uint8).tobytes(),
             disposal=3),
        # final frame shows the restored state plus this rect
        dict(left=0, top=6, width=5, height=3,
             pixels=rng.integers(0, 256, 15, dtype=np.uint8).tobytes()),
    ]
    blob = encode_gif_anim(sw, sh, plan, bg=0)
    dw, dh, frames = decode_gif_frames(blob)
    assert (dw, dh, len(frames)) == (sw, sh, len(plan))

    # independent compositor (gray palette -> index == gray value)
    canvas = np.zeros((sh, sw), dtype=np.uint8)
    expected = []
    for f in plan:
        l, t, w, h = f["left"], f["top"], f["width"], f["height"]
        px = np.frombuffer(f["pixels"], np.uint8).reshape(h, w)
        prev = canvas.copy()
        tr = f.get("transparent")
        region = canvas[t:t + h, l:l + w]
        if tr is None:
            region[:, :] = px
        else:
            region[px != tr] = px[px != tr]
        expected.append(canvas.copy())
        d = f.get("disposal", 0)
        if d == 2:
            canvas[t:t + h, l:l + w] = 0
        elif d == 3:
            canvas = prev
    for i, (got, exp) in enumerate(zip(frames, expected)):
        assert np.array_equal(
            np.frombuffer(got, np.uint8).reshape(sh, sw), exp), f"frame {i}"

    # single-frame path agrees with decode_gif (frame rect == screen)
    from rlis2osm_spark.functions.codecs import decode_gif, encode_gif
    g = encode_gif(8, 6, bytes(range(48)))
    assert decode_gif_frames(g)[2][0] == decode_gif(g)[2]
    with pytest.raises(ValueError):
        encode_gif_anim(4, 4, [dict(left=2, top=2, width=4, height=4,
                                    pixels=bytes(16))])  # rect overflow


def test_avi_raw_dib_roundtrip_and_codec_routing():
    """r5: uncompressed 'DIB ' AVI — bottom-up 24-bit BGR frames with
    4-byte row padding — decodes exactly; the container parser reports
    the codec so extract_video_frames can route; unknown handlers still
    hit the seam."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(2)
    # odd width exercises the stride padding
    for w, h in [(16, 8), (10, 5), (7, 3)]:
        frames = [rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
                  for _ in range(3)]
        blob = C.encode_avi_raw(frames, w, h)
        dw, dh, codec, fr = C.decode_avi_frames(blob)
        assert (dw, dh, codec, len(fr)) == (w, h, "dib", 3)
        for g, f in zip(frames, fr):
            fw, fh, nch, px = C.decode_dib_frame(f, dw, dh)
            rgb = np.frombuffer(px, np.uint8).reshape(fh, fw, 3)
            gray = np.frombuffer(g, np.uint8).reshape(h, w)
            assert nch == 3
            for c in range(3):  # B=G=R replication round-trips exactly
                assert np.array_equal(rgb[:, :, c], gray)
    # mjpeg still routes through the back-compat API
    jb = C.encode_jpeg_gray(16, 8, bytes(128 for _ in range(128)))
    mb = C.encode_avi_mjpeg([jb], 16, 8)
    assert C.decode_avi_frames(mb)[2] == "mjpg"
    assert len(C.decode_avi_mjpeg(mb)[2]) == 1
    with pytest.raises(ValueError):
        C.decode_avi_mjpeg(C.encode_avi_raw([bytes(128)], 16, 8))
    with pytest.raises(NotImplementedError, match="XVID"):
        C.decode_avi_frames(mb.replace(b"vidsMJPG", b"vidsXVID"))
    with pytest.raises(ValueError):
        C.decode_dib_frame(b"\x00" * 10, 16, 8)  # truncated frame


def test_jpeg_bilinear_upsample_matches_reference():
    """Bilinear chroma reconstruction: centered-sample triangular filter
    against an independent numpy implementation on a random (but exactly
    decoded DC-only) chroma plane."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(11)
    w = h = 32
    img = _const_block_image(4, 4, seed=3)
    ks = rng.integers(-2, 3, (2, 2))
    cb_small = np.kron(128 + 17 * ks, np.ones((8, 8), int)).astype(np.uint8)
    cr_small = np.full((16, 16), 128, np.uint8)
    j = C.encode_jpeg_color(w, h, img.tobytes(), "4:2:0",
                            cb_small.tobytes(), cr_small.tobytes())
    W, H, nch, px = C.decode_jpeg(j, upsample="bilinear")
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)

    # independent bilinear: chroma coord c = (x + 0.5) / 2 - 0.5, clamped
    def up(plane):
        coords = np.clip((np.arange(32) + 0.5) / 2 - 0.5, 0, 15)
        i0 = np.minimum(coords.astype(int), 15)
        i1 = np.minimum(i0 + 1, 15)
        f = coords - i0
        row = plane.astype(float)
        tmp = row[:, i0] * (1 - f) + row[:, i1] * f
        return tmp[i0, :] * (1 - f)[:, None] + tmp[i1, :] * f[:, None]

    exp = _expected_rgb(img, up(cb_small), up(cr_small))
    assert np.array_equal(got, exp)

    with pytest.raises(ValueError):
        C.decode_jpeg(j, upsample="bicubic")


# ---------------------------------------------------------------------------
# arithmetic-coded JPEG (SOF9, r6) — QM-coder + Annex F models
# ---------------------------------------------------------------------------

def test_qm_coder_roundtrip_random_bitstreams():
    """The raw QM coder pair (T.81 Annex E: Table E.1 state machine,
    conditional MPS/LPS exchange, bit-stuffed carry, SETBITS flush with
    0x7F completion of a trailing 0xFF) must roundtrip arbitrary
    context-tagged bit sequences at any bias."""
    import random

    from rlis2osm_spark.functions.codecs import _ArithDecoder, _ArithEncoder

    random.seed(7)
    for trial in range(25):
        n = random.randint(1, 5000)
        p = random.random()
        bits = [1 if random.random() < p else 0 for _ in range(n)]
        nctx = random.randint(1, 8)
        ctxs = [random.randrange(nctx) for _ in range(n)]
        enc = _ArithEncoder()
        st_e = bytearray(nctx)
        for b, cx in zip(bits, ctxs):
            enc.encode(st_e, cx, b)
        data = enc.flush()
        dec = _ArithDecoder(data)
        st_d = bytearray(nctx)
        assert [dec.decode(st_d, cx) for cx in ctxs] == bits

    # the fixed equiprobable bin (AC signs) — ~1 bit/symbol, exact
    random.seed(9)
    bits = [random.randrange(2) for _ in range(4000)]
    enc = _ArithEncoder()
    for b in bits:
        enc.encode_fixed(b)
    data = enc.flush()
    dec = _ArithDecoder(data)
    assert [dec.decode_fixed() for _ in bits] == bits
    assert len(data) <= len(bits) // 8 + 8


def test_jpeg_arith_gray_matches_baseline_decode():
    """r6 stretch (VERDICT r5 #7): sequential arithmetic (SOF9) decode.
    The arithmetic encoder shares the baseline's exact DCT/quant chain,
    so arithmetic decode must be pixel-identical to baseline decode on
    every input — including restart intervals, which reset the coder,
    the statistics areas and the DC conditioning state."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg, decode_jpeg_gray, encode_jpeg_arith_gray,
        encode_jpeg_gray)

    rng = np.random.default_rng(7)
    for w, h, rst in [(8, 8, 0), (16, 16, 1), (21, 13, 0), (64, 48, 3),
                      (40, 33, 7), (9, 70, 2), (50, 53, 2)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        blob = encode_jpeg_arith_gray(w, h, img.tobytes(), restart_every=rst)
        assert b"\xff\xc9" in blob      # really SOF9
        assert b"\xff\xcc" in blob      # DAC emitted
        base = decode_jpeg_gray(encode_jpeg_gray(w, h, img.tobytes(),
                                                 restart_every=rst))
        assert decode_jpeg_gray(blob) == base
        wj, hj, nch, px = decode_jpeg(blob)
        assert (wj, hj, nch) == (w, h, 1) and px == base[2]
    # arithmetic typically out-compresses huffman on smooth content
    img = np.ascontiguousarray(np.kron(
        rng.integers(0, 128, (6, 6)) * 2, np.ones((8, 8), int))
    ).astype(np.uint8)
    a = encode_jpeg_arith_gray(48, 48, img.tobytes())
    b = encode_jpeg_gray(48, 48, img.tobytes())
    assert len(a) < len(b)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_arith_color_matches_baseline(subsampling):
    """Color SOF9: interleaved MCUs with luma on conditioning tables
    (DC0/AC0) and BOTH chroma components sharing tables (DC1/AC1) — one
    statistics area per table per F.1.4.4, which the decoder must mirror
    to stay in sync — decode to the same RGB as huffman baseline."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(19)
    for w, h in [(16, 16), (24, 16), (21, 13)]:
        hy, vy = {"4:4:4": (1, 1), "4:2:2": (2, 1),
                  "4:2:0": (2, 2)}[subsampling]
        cw, ch = -(-w // hy), -(-h // vy)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        base = C.decode_jpeg(C.encode_jpeg_color(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        ar = C.decode_jpeg(C.encode_jpeg_arith_color(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        assert base == ar
        assert base[2] == 3


def test_jpeg_arith_fuzz_and_flush_edges():
    """Randomized parity sweep, sized to keep hitting the flush edge
    cases that originally desynced rare streams (trailing-0xFF code byte
    completed by a 0x7F stuff; SETBITS trailing-ones convention)."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(123)
    stuffed = 0
    for _ in range(60):
        w = int(rng.integers(8, 100))
        h = int(rng.integers(8, 100))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rst = int(rng.integers(0, 6))
        blob = C.encode_jpeg_arith_gray(w, h, img.tobytes(),
                                        restart_every=rst)
        if b"\xff\x7f" in blob:
            stuffed += 1
        assert (C.decode_jpeg_gray(blob)
                == C.decode_jpeg_gray(C.encode_jpeg_gray(
                    w, h, img.tobytes(), restart_every=rst)))
    # the sweep actually exercises the stuff path at least once
    assert stuffed >= 1


def test_jpeg_arith_truncation_and_malformed():
    """A QM entropy segment cut mid-stream stays bit-decodable by
    construction (the decoder feeds 1-bits past the end — Figure E.21),
    so truncation is detected at the CONTAINER level: the segment must
    terminate at a real marker. Bad DAC values raise ValueError."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_arith_gray)

    rng = np.random.default_rng(1)
    blob = encode_jpeg_arith_gray(
        32, 32, bytes(rng.integers(0, 256, 1024, dtype=np.uint8)))
    det = tot = 0
    for cut in range(20, len(blob) - 2):
        tot += 1
        try:
            decode_jpeg_gray(blob[:cut])
        except ValueError:
            det += 1
    # all cuts strip the terminating marker; the only passes are cuts
    # that happen to land leaving a marker-shaped tail
    assert det >= tot - 4

    # malformed DAC: Kx = 0 is out of the spec's 1..63 range
    i = blob.find(b"\xff\xcc")
    bad = bytearray(blob)
    assert bad[i + 7] == 5  # Kx default in our DAC segment
    bad[i + 7] = 0
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(bad))


# ---------------------------------------------------------------------------
# r6 seam retirement: sub-byte + RLE BMP, G.711 / 24-bit / IMA-ADPCM WAV
# ---------------------------------------------------------------------------

def _bmp_file(width, height_signed, bits, pixel_rows, table=b"", comp=0,
              clr_used=0):
    import struct as _st

    info = _st.pack("<IiiHHIIiiII", 40, width, height_signed, 1, bits,
                    comp, len(pixel_rows), 0, 0, clr_used, 0)
    off = 14 + 40 + len(table)
    head = b"BM" + _st.pack("<IHHI", off + len(pixel_rows), 0, 0, off)
    return head + info + table + pixel_rows


def test_bmp_subbyte_depths():
    """1-bit and 4-bit palettized BMP: MSB-first bit packing, 4-byte row
    alignment, bottom-up and top-down orders. Files built independently
    with numpy packbits / manual nibble packing."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_bmp

    rng = np.random.default_rng(6)
    pal = np.array([[10, 20, 30], [200, 210, 220]], np.uint8)
    table = b"".join(bytes([p[2], p[1], p[0], 0]) for p in pal)
    idx = rng.integers(0, 2, (3, 10), dtype=np.uint8)
    rows = b""
    for r in (2, 1, 0):
        packed = np.packbits(idx[r])
        rows += packed.tobytes() + b"\x00" * (4 - len(packed))
    w, h, nch, px = decode_bmp(_bmp_file(10, 3, 1, rows, table, clr_used=2))
    assert (w, h, nch) == (10, 3, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(3, 10, 3),
                          pal[idx])

    pal4 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    table4 = b"".join(bytes([p[2], p[1], p[0], 0]) for p in pal4)
    idx4 = rng.integers(0, 16, (2, 5), dtype=np.uint8)
    rows = b""
    for r in (1, 0):
        rb = bytearray()
        for k in range(0, 5, 2):
            hi = idx4[r, k]
            lo = idx4[r, k + 1] if k + 1 < 5 else 0
            rb.append((hi << 4) | lo)
        rows += bytes(rb) + b"\x00" * (4 - len(rb) % 4)
    w, h, nch, px = decode_bmp(_bmp_file(5, 2, 4, rows, table4, clr_used=16))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(2, 5, 3),
                          pal4[idx4])


def test_bmp_rle_decode():
    """BI_RLE8/BI_RLE4: encoded runs (RLE4 alternating nibbles), absolute
    mode with word alignment, EOL / EOB / delta escapes (skipped pixels
    read as palette index 0); top-down RLE is invalid per the format."""
    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_bmp

    rng = np.random.default_rng(6)
    pal8 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    table8 = b"".join(bytes([p[2], p[1], p[0], 0]) for p in pal8)
    tgt = np.zeros((3, 7), np.uint8)  # stored (bottom-up) order
    s = bytearray()
    tgt[0, :4] = 5
    tgt[0, 4:7] = [9, 8, 7]
    s += bytes([4, 5]) + bytes([0, 3, 9, 8, 7, 0]) + bytes([0, 0])
    tgt[1, 2:7] = 11
    s += bytes([0, 2, 2, 0]) + bytes([5, 11]) + bytes([0, 0])
    tgt[2, :] = 42
    s += bytes([7, 42]) + bytes([0, 1])
    w, h, nch, px = decode_bmp(_bmp_file(7, 3, 8, bytes(s), table8, comp=1))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(3, 7, 3),
                          pal8[tgt[::-1]])

    pal4 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    table4 = b"".join(bytes([p[2], p[1], p[0], 0]) for p in pal4)
    tgt4 = np.zeros((2, 6), np.uint8)
    s = bytearray()
    tgt4[0, :5] = [3, 12, 3, 12, 3]  # run of 0x3C alternates nibbles
    s += bytes([5, 0x3C])
    tgt4[0, 5] = 7
    s += bytes([0, 3, 0x70, 0x00]) + bytes([0, 0])
    tgt4[1, :4] = 9
    s += bytes([4, 0x99]) + bytes([0, 1])
    w, h, nch, px = decode_bmp(_bmp_file(6, 2, 4, bytes(s), table4, comp=2))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(2, 6, 3),
                          pal4[tgt4[::-1]])

    with pytest.raises(ValueError, match="top-down"):
        decode_bmp(_bmp_file(6, -2, 4, bytes(s), table4, comp=2))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(_bmp_file(6, 2, 4, bytes(s[:-2]), table4, comp=2))
    # RLE8 must be 8-bit, RLE4 4-bit
    with pytest.raises(ValueError, match="RLE8"):
        decode_bmp(_bmp_file(6, 2, 4, bytes(s), table4, comp=1))


def test_wav_g711_and_pcm24():
    """G.711 mu-law/A-law companded WAV decode: expansion computed from
    the normative piecewise-linear formulas; our encoder picks the
    nearest representable level by exact inverse search, verified
    against an independent nearest-level scan. 24-bit packed PCM
    roundtrips exactly, mono and stereo."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(3)
    for law in ("mulaw", "alaw"):
        s = rng.integers(-32768, 32768, 2000).tolist()
        rate, out = C.decode_wav(C.encode_wav_g711(s, law=law))
        assert rate == 8000 and len(out) == len(s)
        table = (C._mulaw_decode_table() if law == "mulaw"
                 else C._alaw_decode_table())
        levels = np.sort(table.astype(np.int32))
        for x, y in zip(s[:500], out[:500]):
            xx = max(-32768, min(32767, x))
            i = int(np.searchsorted(levels, xx))
            i = max(1, min(255, i))
            best = min(abs(int(levels[i - 1]) - xx), abs(int(levels[i]) - xx))
            assert abs(y - xx) == best
    # known G.711 anchor values: mu-law 0xFF decodes to 0, A-law 0xD5 to 8
    assert int(C._mulaw_decode_table()[0xFF]) == 0
    assert int(C._alaw_decode_table()[0xD5]) == 8

    s = rng.integers(-(1 << 23), 1 << 23, 999).tolist()
    rate, out = C.decode_wav(C.encode_wav_pcm24(s))
    assert out == s
    s2 = rng.integers(-(1 << 23), 1 << 23, 1000).tolist()
    assert C.decode_wav(C.encode_wav_pcm24(s2, channels=2))[1] == s2


def test_wav_ima_adpcm():
    """IMA/DVI ADPCM WAV: block headers carry predictor + step index,
    nibbles interleave channels in 4-byte groups, the fact chunk
    truncates the padded last block. The encoder tracks state with the
    decoder's own update, so decode reproduces the encoder's predictors
    exactly; SNR over a smooth signal must be high."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    for ch in (1, 2):
        n = 505 * 2 * ch + 41 * ch  # exercises a partial final block
        t = np.arange(n // ch)
        sig = (3000 * np.sin(t / 9) + 1500 * np.sin(t / 37)).astype(int)
        if ch == 2:
            s = np.empty(n, dtype=int)
            s[0::2] = sig
            s[1::2] = -sig
        else:
            s = sig
        rate, out = C.decode_wav(C.encode_wav_ima_adpcm(s.tolist(),
                                                        channels=ch))
        assert len(out) == n
        err = np.asarray(out) - s
        snr = 10 * np.log10((s.astype(float) ** 2).mean()
                            / max((err.astype(float) ** 2).mean(), 1e-9))
        assert snr > 25.0

    # corrupted step index rejected
    blob = bytearray(C.encode_wav_ima_adpcm(list(range(0, 505 * 8, 8))))
    i = blob.find(b"data") + 8 + 2  # first block header's index byte
    blob[i + 0] = 99
    with pytest.raises(ValueError, match="step index"):
        C.decode_wav(bytes(blob))

    # GSM (format 49) stays behind the seam
    import struct as _st

    pcm = bytearray(C.encode_wav([1, 2, 3]))
    j = pcm.find(b"fmt ")
    _st.pack_into("<H", pcm, j + 8, 49)
    with pytest.raises(NotImplementedError, match="GSM"):
        C.decode_wav(bytes(pcm))


def test_wav_ms_adpcm():
    """MS-ADPCM (format 2): 7-byte per-channel block headers (predictor
    index, initial delta, two verbatim seed samples), channel-alternating
    nibbles, the 16-entry delta adaptation table with the 16 floor. The
    encoder tracks the decoder's own state, so decode reproduces its
    predictors exactly; with predictor 0 (c1=256, c2=0) a constant
    signal roundtrips exactly."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    for ch in (1, 2):
        for pred in (0, 1, 4):
            n = 500 * 2 * ch + 36 * ch
            t = np.arange(n // ch)
            sig = (2500 * np.sin(t / 11) + 900 * np.sin(t / 41)).astype(int)
            if ch == 2:
                s = np.empty(n, dtype=int)
                s[0::2] = sig
                s[1::2] = -sig // 2
            else:
                s = sig
            rate, out = C.decode_wav(C.encode_wav_ms_adpcm(
                s.tolist(), channels=ch, predictor=pred))
            assert len(out) == n
            err = np.asarray(out) - s
            snr = 10 * np.log10((s.astype(float) ** 2).mean()
                                / max((err.astype(float) ** 2).mean(), 1e-9))
            assert snr > 30.0

    s = [1234] * 777
    assert C.decode_wav(C.encode_wav_ms_adpcm(s))[1] == s

    blob = bytearray(C.encode_wav_ms_adpcm(s))
    i = blob.find(b"data") + 8  # first block's predictor byte
    blob[i] = 7
    with pytest.raises(ValueError, match="predictor"):
        C.decode_wav(bytes(blob))


def test_bmp_bitfields():
    """BI_BITFIELDS: arbitrary contiguous channel masks at 16/32-bit
    (565 and BGRX-8888 exercised), n-bit channels scaled to 8 bits by
    255*x/max; zero masks and non-16/32 depths rejected."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions.codecs import decode_bmp

    rng = np.random.default_rng(2)
    masks = _st.pack("<III", 0xF800, 0x07E0, 0x001F)
    img = rng.integers(0, 65536, (2, 3), dtype=np.uint32)
    rows = b""
    for r in (1, 0):
        rb = b"".join(_st.pack("<H", int(img[r, c])) for c in range(3))
        rows += rb + b"\x00" * ((4 - len(rb) % 4) % 4)
    w, h, nch, px = decode_bmp(_bmp_file(3, 2, 16, rows, masks, comp=3))
    got = np.frombuffer(px, np.uint8).reshape(2, 3, 3)
    exp = np.stack([((img >> 11) & 31) * 255 // 31,
                    ((img >> 5) & 63) * 255 // 63,
                    (img & 31) * 255 // 31], axis=-1).astype(np.uint8)
    assert np.array_equal(got, exp)

    masks32 = _st.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    pix = rng.integers(0, 2 ** 32, (1, 2), dtype=np.uint32)
    rows32 = b"".join(_st.pack("<I", int(pix[0, c])) for c in range(2))
    w, h, nch, px = decode_bmp(_bmp_file(2, 1, 32, rows32, masks32, comp=3))
    exp = np.stack([(pix >> 16) & 255, (pix >> 8) & 255,
                    pix & 255], axis=-1).astype(np.uint8)
    assert np.frombuffer(px, np.uint8).reshape(1, 2, 3).tolist() \
        == exp.tolist()

    with pytest.raises(ValueError, match="BITFIELDS"):
        decode_bmp(_bmp_file(2, 1, 8, b"\0" * 8, b"\0" * 64, comp=3))
    with pytest.raises(ValueError, match="mask"):
        decode_bmp(_bmp_file(3, 2, 16, rows,
                             _st.pack("<III", 0, 0x07E0, 0x001F), comp=3))


def test_jpeg_arith_progressive_matches_baseline():
    """r6: progressive ARITHMETIC (SOF10) — the T.81 Annex G scan
    procedures (DC first/refine, per-band AC first + two refinement
    passes, QM-coded EOB decisions, fixed-bin signs and DC correction
    bits) emit the same quantized coefficients as baseline, so decode
    must be pixel-identical to baseline decode on every input."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(7)
    for w, h in [(8, 8), (16, 16), (21, 13), (64, 48), (40, 33)]:
        for variant in range(3):
            if variant == 0:
                img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            elif variant == 1:
                xx, yy = np.meshgrid(np.arange(w), np.arange(h))
                img = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
            else:
                img = np.ascontiguousarray(np.kron(
                    rng.integers(0, 128, ((h + 7) // 8, (w + 7) // 8)) * 2,
                    np.ones((8, 8), int))[:h, :w]).astype(np.uint8)
            blob = C.encode_jpeg_arith_progressive(w, h, img.tobytes())
            assert b"\xff\xca" in blob  # really SOF10
            base = C.decode_jpeg_gray(C.encode_jpeg_gray(w, h,
                                                         img.tobytes()))
            assert C.decode_jpeg_gray(blob) == base
    # arithmetic progressive out-compresses huffman progressive
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    assert len(C.encode_jpeg_arith_progressive(64, 64, img.tobytes())) \
        < len(C.encode_jpeg_progressive(64, 64, img.tobytes()))


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_arith_progressive_color(subsampling):
    """Color SOF10: MCU-interleaved arithmetic DC scans across three
    components (per-table conditioning state, chroma sharing one
    statistics area) + per-component AC band scans decode to the same
    RGB as the baseline color encoding."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(19)
    for w, h in [(16, 16), (24, 16), (21, 13)]:
        hy, vy = {"4:4:4": (1, 1), "4:2:2": (2, 1),
                  "4:2:0": (2, 2)}[subsampling]
        cw, ch = -(-w // hy), -(-h // vy)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        base = C.decode_jpeg(C.encode_jpeg_color(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        got = C.decode_jpeg(C.encode_jpeg_arith_progressive(
            w, h, img.tobytes(), subsampling, cb.tobytes(), cr.tobytes()))
        assert got == base
        assert base[2] == 3


def test_jpeg_arith_progressive_truncation():
    """A SOF10 stream cut inside any scan loses that scan's terminating
    marker -> container-level ValueError (same contract as SOF9). Cuts
    landing exactly on a scan boundary decode silently — a progressive
    stream ending after a complete scan is a LEGAL partial-quality
    image, not corruption — so a handful of boundary cuts pass."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    blob = C.encode_jpeg_arith_progressive(24, 24, img.tobytes())
    det = tot = 0
    for cut in range(len(blob) // 4, len(blob) - 2, 3):
        tot += 1
        try:
            C.decode_jpeg_gray(blob[:cut])
        except ValueError:
            det += 1
    assert det >= tot - 8  # only scan-boundary cuts may pass


def test_jpeg_arith_lossless_roundtrip():
    """r6: lossless ARITHMETIC (SOF11, T.81 Annex H) — prediction
    differences QM-coded in a 5x5 (Da, Db) conditioning context with
    Db-selected magnitude bin sets. Must reproduce the input EXACTLY
    for every predictor; point transform drops/restores low bits like
    huffman lossless; hierarchical SOFs stay behind the seam."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(11)
    for w, h in [(8, 8), (21, 13), (64, 48)]:
        for pred in range(1, 8):
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            blob = C.encode_jpeg_arith_lossless(w, h, img.tobytes(),
                                                predictor=pred)
            assert b"\xff\xcb" in blob  # really SOF11
            assert C.decode_jpeg_gray(blob) == (w, h, img.tobytes())

    # adaptive contexts crush smooth content vs the flat huffman table
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    img = ((xx * 2 + yy * 3) % 256).astype(np.uint8)
    assert len(C.encode_jpeg_arith_lossless(64, 64, img.tobytes(),
                                            predictor=4)) \
        < len(C.encode_jpeg_lossless(64, 64, img.tobytes(),
                                     predictor=4)) // 10

    # point transform: decoded == (orig >> Pt) << Pt
    blob = C.encode_jpeg_arith_lossless(64, 64, img.tobytes(),
                                        predictor=4, point_transform=2)
    assert C.decode_jpeg_gray(blob)[2] == ((img >> 2) << 2).tobytes()

    # truncation: segment must end at a real marker
    blob = C.encode_jpeg_arith_lossless(16, 16, bytes(range(256)))
    with pytest.raises(ValueError):
        C.decode_jpeg_gray(blob[:len(blob) // 2])

    # hierarchical (SOF5) is still the seam
    base = C.encode_jpeg_gray(8, 8, bytes(64))
    sof0 = base.find(b"\xff\xc0")
    with pytest.raises(NotImplementedError, match="hierarchical"):
        C.decode_jpeg_gray(base[:sof0] + b"\xff\xc5" + base[sof0 + 2:])


def test_jpeg_arith_12bit_and_precision_sweep():
    """r6: 12-bit-precision sequential arithmetic (SOF9: level shift
    2048, uint16 sample I/O via decode_jpeg_gray12 — the QM models need
    no table changes above 8-bit, unlike huffman) and the spec's FULL
    lossless precision range 2-16 through SOF11, exact at every
    precision/predictor combination."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(5)
    # sequential 12-bit: DCT-exact on constant blocks at even values
    # (luma DC quant step 16 divides 8*(v-2048) exactly for even v)
    img = np.ascontiguousarray(np.kron(rng.integers(0, 2048, (3, 3)) * 2,
                                       np.ones((8, 8), int))
                               ).astype(np.uint16)
    blob = C.encode_jpeg_arith_gray(24, 24, img.astype("<u2").tobytes(),
                                    precision=12)
    w, h, px = C.decode_jpeg_gray12(blob)
    assert (w, h) == (24, 24)
    assert np.array_equal(np.frombuffer(px, "<u2").reshape(24, 24), img)
    # 12-bit random content is lossy-but-close at the 8-bit-scaled
    # quant table; the decode path itself must hold range
    img = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    blob = C.encode_jpeg_arith_gray(16, 16, img.astype("<u2").tobytes(),
                                    restart_every=2, precision=12)
    got = np.frombuffer(C.decode_jpeg_gray12(blob)[2], "<u2")
    assert got.max() <= 4095
    assert np.abs(got.astype(int).reshape(16, 16)
                  - img.astype(int)).mean() < 64
    # an 8-bit caller must not silently clamp a 12-bit stream
    with pytest.raises(ValueError, match="12-bit"):
        C.decode_jpeg_gray(blob)
    with pytest.raises(ValueError, match="12-bit"):
        C.decode_jpeg(blob)

    # lossless: every precision 2..16 roundtrips exactly
    for prec in (2, 4, 8, 12, 16):
        img = rng.integers(0, 1 << prec, (17, 21)).astype(np.uint16)
        px = (img.astype(np.uint8).tobytes() if prec <= 8
              else img.astype("<u2").tobytes())
        blob = C.encode_jpeg_arith_lossless(21, 17, px, predictor=4,
                                            precision=prec)
        got = np.frombuffer(C.decode_jpeg_gray12(blob)[2],
                            "<u2").reshape(17, 21)
        assert np.array_equal(got, img)
    with pytest.raises(ValueError, match="range"):
        C.encode_jpeg_arith_lossless(
            2, 2, np.array([0, 0, 0, 4096], "<u2").tobytes(),
            precision=12)


def test_jpeg_hierarchical_exact_roundtrip():
    """r6: hierarchical JPEG (T.81 Annex J): DHP pyramid with a lossy
    SOF9 base at half resolution, EXP bilinear expansion (even samples
    copied, odd = (a+b+1)>>1 edge-replicated), and a DIFFERENTIAL
    LOSSLESS ARITHMETIC (SOF15) refinement frame coding the mod-65536
    difference — so the overall decode reproduces the input EXACTLY,
    including odd dimensions. Differential progressive frames stay
    behind the seam."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(17)
    for w, h in [(8, 8), (21, 13), (64, 48), (9, 9)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        blob = C.encode_jpeg_hierarchical(w, h, img.tobytes())
        assert b"\xff\xde" in blob  # DHP
        assert b"\xff\xdf" in blob  # EXP
        assert b"\xff\xcf" in blob  # SOF15 differential
        assert C.decode_jpeg_gray(blob) == (w, h, img.tobytes())

    # every T.81 frame type decodes inside pyramids now (r6) — a frame
    # RELABELED SOF13/SOF14 whose body is really a lossless-arith scan
    # (no DQT) is malformed input, not a seam
    blob = bytearray(C.encode_jpeg_hierarchical(16, 16, bytes(256)))
    i = blob.find(b"\xff\xcf")
    for wrong in (0xCE, 0xCD):
        blob[i + 1] = wrong
        with pytest.raises(ValueError):
            C.decode_jpeg_gray(bytes(blob))

    # truncation inside the differential scan is detected
    full = C.encode_jpeg_hierarchical(16, 16, bytes(range(256)))
    with pytest.raises(ValueError):
        C.decode_jpeg_gray(full[:len(full) - 8])


def test_jpeg_hierarchical_single_axis_exp():
    """A conformant pyramid may expand only one axis per EXP (Eh=1,Ev=0
    or Eh=0,Ev=1) — the filter must leave the other axis untouched
    (review r6: the both-axes-then-crop shortcut silently decoded
    garbage). Built by hand: SOF9 base at half-width/full-height, EXP
    0x10, SOF15 differential at full size."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(23)
    w, h = 20, 12
    img = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.int64)
    w2 = (w + 1) // 2
    half = img[:, 0::2].astype(np.uint8)  # decimate horizontally only

    base = C.encode_jpeg_arith_gray(w2, h, half.tobytes())
    _, _, bpx = C.decode_jpeg_gray(base)
    ref = np.frombuffer(bpx, np.uint8).reshape(h, w2).astype(np.int64)
    up = C._hier_upsample(ref, h, w, eh=1, ev=0)
    diff = (img - up) % 65536
    sdiff = np.where(diff >= 32768, diff - 65536, diff)

    enc = C._ArithEncoder()
    stats = bytearray(164)
    coded = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            d = int(sdiff[y, x])
            coded[y, x] = d
            da = int(coded[y, x - 1]) if x > 0 else 0
            db = int(coded[y - 1, x]) if y > 0 else 0
            ca, cb = C._lossless_cls(da, 0, 1), C._lossless_cls(db, 0, 1)
            C._arith_code_lossless(enc, stats, 4 * (ca * 5 + cb),
                                   100 + 32 * (cb >= 3), d)

    def seg(marker, body):
        return (bytes([0xFF, marker])
                + _st.pack(">H", len(body) + 2) + body)

    blob = (b"\xff\xd8"
            + seg(0xDE, _st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
            + base[2:-2]
            + seg(0xDF, bytes([0x10]))  # horizontal-only expansion
            + seg(0xCF, _st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
            + seg(0xCC, bytes([0x00, 0x10]))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
            + enc.flush() + b"\xff\xd9")
    assert C.decode_jpeg_gray(blob) == (w, h, img.astype(np.uint8).tobytes())

    # a DAC segment placed BEFORE the SOF15 header (B.2 placement) must
    # be honored, and DRI in a differential frame refuses loudly
    blob2 = (b"\xff\xd8"
             + seg(0xDE, _st.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0]))
             + base[2:-2]
             + seg(0xDF, bytes([0x10]))
             + seg(0xCC, bytes([0x00, 0x10]))  # DAC before the frame
             + seg(0xCF, _st.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0]))
             + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
             + enc.flush() + b"\xff\xd9")
    assert C.decode_jpeg_gray(blob2) == (w, h,
                                         img.astype(np.uint8).tobytes())
    blob3 = (b"\xff\xd8"
             + seg(0xDE, _st.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0]))
             + base[2:-2]
             + seg(0xDF, bytes([0x10]))
             + seg(0xCF, _st.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0]))
             + seg(0xDD, _st.pack(">H", 4))  # DRI inside the frame
             + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
             + enc.flush() + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="restart"):
        C.decode_jpeg_gray(blob3)


def test_jpeg_extended_sequential_sof1():
    """SOF1 extended-sequential huffman (r6): 8-bit decodes exactly like
    baseline (same transform, different SOF marker + table ids allowed);
    12-bit level-shifts by 2048, uses the extended-range DHT tables and
    roundtrips via decode_jpeg_gray12; decode_jpeg_gray routes 12-bit
    streams to ValueError; restart intervals reset the DC predictor;
    the huffman and arithmetic entropy coders agree bit-for-bit on the
    same image (same quant + DCT, independent entropy layers)."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(7)
    # 8-bit: even constant blocks are exact; the stream really is SOF1
    blocks = rng.integers(0, 128, (3, 4), dtype=np.uint8) * 2
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    h, w = img.shape
    blob = C.encode_jpeg_ext_gray(w, h, img.tobytes(), precision=8)
    assert b"\xff\xc1" in blob
    assert C.decode_jpeg_gray(blob) == (w, h, img.tobytes())
    # lossy natural image: SOF1 and SOF0 must decode identically
    nat = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    b0 = C.encode_jpeg_gray(17, 24, nat.tobytes())
    b1 = C.encode_jpeg_ext_gray(17, 24, nat.tobytes(), precision=8)
    assert C.decode_jpeg_gray(b1) == C.decode_jpeg_gray(b0)

    # 12-bit: even constant blocks exact through decode_jpeg_gray12,
    # with restart intervals in play
    blocks12 = (rng.integers(0, 2048, (2, 3)) * 2).astype("<u2")
    img12 = np.kron(blocks12,
                    np.ones((8, 8), dtype=np.uint16)).astype("<u2")
    h2, w2 = img12.shape
    blob12 = C.encode_jpeg_ext_gray(w2, h2, img12.tobytes(),
                                    precision=12, restart_every=2)
    assert C.decode_jpeg_gray12(blob12) == (w2, h2, img12.tobytes())
    with pytest.raises(ValueError, match="12-bit"):
        C.decode_jpeg_gray(blob12)

    # differential: huffman (SOF1) vs QM-coder (SOF9) at 12-bit decode
    # to the SAME samples on a lossy natural image
    nat12 = rng.integers(0, 4096, (19, 21)).astype("<u2")
    bh_ = C.encode_jpeg_ext_gray(21, 19, nat12.tobytes(), precision=12)
    ba_ = C.encode_jpeg_arith_gray(21, 19, nat12.tobytes(), precision=12)
    assert C.decode_jpeg_gray12(bh_) == C.decode_jpeg_gray12(ba_)

    # truncation fails loudly, not with fabricated tail blocks
    with pytest.raises(ValueError):
        C.decode_jpeg_gray12(blob12[:len(blob12) - 10])


def test_jpeg_hierarchical_huffman_differential():
    """SOF7 differential lossless HUFFMAN pyramids (r6): SOF0 base +
    EXP + SOF7 refinement reproduce the input exactly, with and without
    restart intervals in the differential scan; a missing DHT is
    malformed input; the huffman and arithmetic pyramids agree (both
    are exact by construction)."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (21, 26), dtype=np.uint8)
    blob = C.encode_jpeg_hierarchical(26, 21, img.tobytes(),
                                      entropy="huffman")
    assert b"\xff\xc7" in blob
    assert C.decode_jpeg_gray(blob) == (26, 21, img.tobytes())

    # restart intervals split the differential scan losslessly
    blob_r = C.encode_jpeg_hierarchical(26, 21, img.tobytes(),
                                        entropy="huffman",
                                        restart_every=100)
    assert blob_r != blob
    assert C.decode_jpeg_gray(blob_r) == (26, 21, img.tobytes())

    # both entropy stacks are exact, so they agree end-to-end
    blob_a = C.encode_jpeg_hierarchical(26, 21, img.tobytes())
    assert C.decode_jpeg_gray(blob_a) == C.decode_jpeg_gray(blob)

    # stripping the differential frame's DHT (the one after SOF7) is
    # malformed input
    sof7_at = blob.index(b"\xff\xc7")
    dht_at = blob.index(b"\xff\xc4", sof7_at)
    ln = int.from_bytes(blob[dht_at + 2:dht_at + 4], "big")
    broken = blob[:dht_at] + blob[dht_at + 2 + ln:]
    with pytest.raises(ValueError, match="huffman table"):
        C.decode_jpeg_gray(broken)

    # truncated differential entropy data fails loudly
    with pytest.raises(ValueError):
        C.decode_jpeg_gray(blob[:len(blob) - 12])

    # arith differentials still refuse restart intervals
    with pytest.raises(ValueError, match="huffman"):
        C.encode_jpeg_hierarchical(26, 21, img.tobytes(),
                                   restart_every=4)


def test_jpeg_hierarchical_dct_differential():
    """SOF5 differential sequential DCT pyramids (r6): the differential
    frame codes DCT(input - reference) with no level shift and no DC
    prediction (T.81 J.1.1.2). The expected output is rebuilt test-side
    from first principles (own cosine matrix, Annex K quant) on top of
    the decoded base + J.1.1.3 upsample; a constant image (zero diff)
    roundtrips exactly; restart intervals split the block scan; a
    missing DQT is malformed input; arithmetic DCT differentials
    (SOF13) stay a loud seam."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    def dct_m():
        m = np.zeros((8, 8))
        for k in range(8):
            for i in range(8):
                m[k, i] = ((1 / np.sqrt(8)) if k == 0
                           else np.sqrt(2 / 8)) * np.cos(
                               (2 * i + 1) * k * np.pi / 16)
        return m

    rng = np.random.default_rng(41)
    h, w = 24, 32
    img = rng.integers(0, 256, (h, w)).astype(np.int64)
    blob = C.encode_jpeg_hierarchical(w, h, img.astype(np.uint8).tobytes(),
                                      entropy="huffman",
                                      differential="dct")
    assert b"\xff\xc5" in blob
    gw, gh, gpx = C.decode_jpeg_gray(blob)
    got = np.frombuffer(gpx, np.uint8).reshape(h, w).astype(np.int64)

    # test-side expected reconstruction
    pad = np.empty((h, w), dtype=np.int64)  # dims already multiples of 2
    pad[:, :] = img
    half = ((pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2]
             + pad[1::2, 1::2] + 2) >> 2).astype(np.uint8)
    _, _, bpx = C.decode_jpeg_gray(
        C.encode_jpeg_gray(w // 2, h // 2, half.tobytes()))
    ref = np.frombuffer(bpx, np.uint8).reshape(h // 2, w // 2).astype(
        np.int64)
    up = C._hier_upsample(ref, h, w)
    diff = (img - up).astype(np.float64)
    M = dct_m()
    q = np.array(C._JPEG_QTABLE, dtype=np.float64).reshape(8, 8)
    expected = np.empty((h, w), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = diff[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            quant = np.round((M @ blk @ M.T) / q) * q
            rec = np.round(M.T @ quant @ M).astype(np.int64)
            expected[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = rec
    expected = np.clip((up + expected) % 65536, 0, 255)
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, expected)

    # restart intervals: same reconstruction, split scan
    blob_r = C.encode_jpeg_hierarchical(w, h,
                                        img.astype(np.uint8).tobytes(),
                                        entropy="huffman",
                                        differential="dct",
                                        restart_every=3)
    assert blob_r != blob
    assert C.decode_jpeg_gray(blob_r) == (gw, gh, gpx)

    # zero diff (constant image) is exact end-to-end
    flat = np.full((16, 16), 88, dtype=np.uint8)
    blob_c = C.encode_jpeg_hierarchical(16, 16, flat.tobytes(),
                                        entropy="huffman",
                                        differential="dct")
    assert C.decode_jpeg_gray(blob_c) == (16, 16, flat.tobytes())

    # stripping the differential DQT is malformed input
    sof5_at = blob.index(b"\xff\xc5")
    dqt_at = blob.index(b"\xff\xdb", sof5_at)
    ln = int.from_bytes(blob[dqt_at + 2:dqt_at + 4], "big")
    broken = blob[:dqt_at] + blob[dqt_at + 2 + ln:]
    with pytest.raises(ValueError, match="quant table"):
        C.decode_jpeg_gray(broken)

    # SOF13 (arithmetic DCT differential, r6): same transform chain
    # under the QM coder — must decode bit-for-bit like the SOF5 stream
    blob13 = C.encode_jpeg_hierarchical(w, h,
                                        img.astype(np.uint8).tobytes(),
                                        entropy="arith",
                                        differential="dct")
    assert b"\xff\xcd" in blob13
    w13, h13, px13 = C.decode_jpeg_gray(blob13)
    assert (w13, h13) == (w, h)
    # NOT identical to SOF5's output: the bases differ (SOF9 vs SOF0
    # encode the same half image through the same quant chain, so they
    # reconstruct the same reference) — with equal references the DCT
    # differential chain is also equal, so outputs DO agree
    assert px13 == gpx
    # constant image exact through SOF13 too
    blob13c = C.encode_jpeg_hierarchical(16, 16, flat.tobytes(),
                                         entropy="arith",
                                         differential="dct")
    assert C.decode_jpeg_gray(blob13c) == (16, 16, flat.tobytes())


def test_jpeg_hierarchical_progressive_differential():
    """SOF6/SOF14 differential PROGRESSIVE pyramids (r6): the same
    no-shift / zero-DC-prediction DCT coefficients as SOF5/SOF13, split
    into a DC-first scan + a full-band AC-first scan. Because all four
    DCT-differential stacks share the base chain and quantizer, their
    pyramids of one image must decode bit-for-bit equal; constant
    images are exact; truncating the AC scan fails loudly."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(47)
    h, w = 24, 32
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ref5 = C.decode_jpeg_gray(C.encode_jpeg_hierarchical(
        w, h, img.tobytes(), entropy="huffman", differential="dct"))

    blob6 = C.encode_jpeg_hierarchical(w, h, img.tobytes(),
                                       entropy="huffman",
                                       differential="dct-progressive")
    assert b"\xff\xc6" in blob6
    assert C.decode_jpeg_gray(blob6) == ref5

    blob14 = C.encode_jpeg_hierarchical(w, h, img.tobytes(),
                                        entropy="arith",
                                        differential="dct-progressive")
    assert b"\xff\xce" in blob14
    assert C.decode_jpeg_gray(blob14) == ref5

    # constant image: zero diff -> exact through both progressive stacks
    flat = np.full((16, 16), 90, dtype=np.uint8)
    for entropy in ("huffman", "arith"):
        b = C.encode_jpeg_hierarchical(16, 16, flat.tobytes(),
                                       entropy=entropy,
                                       differential="dct-progressive")
        assert C.decode_jpeg_gray(b) == (16, 16, flat.tobytes())

    # truncation inside the differential scans is detected
    with pytest.raises(ValueError):
        C.decode_jpeg_gray(blob6[:len(blob6) - 6])
    with pytest.raises(ValueError):
        C.decode_jpeg_gray(blob14[:len(blob14) - 6])

    # restart intervals stay rejected in progressive differentials
    with pytest.raises(ValueError, match="restart_every"):
        C.encode_jpeg_hierarchical(16, 16, flat.tobytes(),
                                   entropy="huffman",
                                   differential="dct-progressive",
                                   restart_every=2)


def test_jpeg_16bit_quant_tables():
    """Pq=1 DQT segments (r6): 16-bit big-endian quantizer entries —
    the 12-bit parameter space an 8-bit DQT cannot express. The SOF1
    encoder's quant16 path quantizes with 3x Annex K (q00=48):
    even-constant blocks at multiples of 6 from the level shift
    survive exactly; an invalid Pq nibble is malformed input."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(53)
    # 12-bit: v = 2048 + 6k keeps (v-2048)*8 divisible by q00=48
    blocks = (2048 + 6 * rng.integers(-300, 300, (2, 3))).astype("<u2")
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint16)).astype("<u2")
    h, w = img.shape
    blob = C.encode_jpeg_ext_gray(w, h, img.tobytes(), precision=12,
                                  quant16=True)
    # the stream really carries a Pq=1 DQT (129-byte body + marker len)
    dqt_at = blob.index(b"\xff\xdb")
    assert blob[dqt_at + 4] == 0x10
    assert int.from_bytes(blob[dqt_at + 2:dqt_at + 4], "big") == 2 + 129
    assert C.decode_jpeg_gray12(blob) == (w, h, img.tobytes())

    # lossy 12-bit natural image: 16-bit-DQT stream decodes without
    # error and differs from the 8-bit-DQT stream's quantization
    nat = rng.integers(0, 4096, (17, 19)).astype("<u2")
    b16 = C.encode_jpeg_ext_gray(19, 17, nat.tobytes(), precision=12,
                                 quant16=True)
    b8 = C.encode_jpeg_ext_gray(19, 17, nat.tobytes(), precision=12)
    assert C.decode_jpeg_gray12(b16)[:2] == (19, 17)
    assert C.decode_jpeg_gray12(b16) != C.decode_jpeg_gray12(b8)

    # invalid Pq nibble is malformed input
    bad = bytearray(blob)
    bad[dqt_at + 4] = 0x20
    with pytest.raises(ValueError):
        C.decode_jpeg_gray12(bytes(bad))


def test_jpeg_subsampled_luma():
    """Subsampled-LUMA layouts (r6): nothing in T.81 requires component
    1 to carry the max sampling factors. Hand-built 3-component stream
    with Y at 1x1 and Cb/Cr at 2x2 (so luma is quarter resolution):
    every decoder upsamples the luma plane like any other component.
    Constant blocks keep the whole chain analytic."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    w = h = 16  # one MCU at hmax=vmax=2
    # all three components quantize with table 0 (q00=16), so even
    # offsets from the level shift are exact for luma AND chroma
    y0, cb0, cr0 = 120, 128 + 16, 128 - 32
    dc_tab = C._huff_codes(C._JPEG_DC_BITS, C._JPEG_DC_VALS)
    ac_tab = C._huff_codes(C._JPEG_AC_BITS, C._JPEG_AC_VALS)
    q = np.array(C._JPEG_QTABLE, dtype=np.float64).reshape(8, 8)
    zz = C._JPEG_ZIGZAG

    wtr = C._BitWriter()
    prev = {1: 0, 2: 0, 3: 0}
    # MCU order: Y (1 block at 1x1), Cb (4 blocks at 2x2), Cr (4 blocks)
    for cid, val, nblk in ((1, y0, 1), (2, cb0, 4), (3, cr0, 4)):
        for _ in range(nblk):
            blk = np.full((8, 8), float(val)) - 128.0
            prev[cid] = C._encode_block(wtr, blk, q, dc_tab, ac_tab,
                                        prev[cid])
    wtr.flush()

    def seg(marker, body):
        return (bytes([0xFF, marker])
                + _st.pack(">H", len(body) + 2) + body)

    blob = (b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + bytes(
                C._JPEG_QTABLE[zz[i]] for i in range(64)))
            + seg(0xC0, _st.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, 0x11, 0, 2, 0x22, 0, 3, 0x22, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(C._JPEG_DC_BITS)
                  + bytes(C._JPEG_DC_VALS))
            + seg(0xC4, bytes([0x10]) + bytes(C._JPEG_AC_BITS)
                  + bytes(C._JPEG_AC_VALS))
            + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
            + bytes(wtr.out) + b"\xff\xd9")

    # gray surface: the quarter-res constant luma upsamples to constant
    gw, gh, gpx = C.decode_jpeg_gray(blob)
    assert (gw, gh) == (w, h)
    assert gpx == bytes([y0]) * (w * h)

    # color surface: JFIF conversion of the constant planes
    cw_, ch_, nch, px = C.decode_jpeg(blob)
    assert (cw_, ch_, nch) == (w, h, 3)
    r = min(255, max(0, int(np.floor(y0 + 1.402 * (cr0 - 128) + 0.5))))
    g = min(255, max(0, int(np.floor(y0 - 0.344136 * (cb0 - 128)
                                     - 0.714136 * (cr0 - 128) + 0.5))))
    b = min(255, max(0, int(np.floor(y0 + 1.772 * (cb0 - 128) + 0.5))))
    assert px == bytes([r, g, b]) * (w * h)


def test_jpeg_multiscan_noninterleaved():
    """Non-interleaved multi-scan sequential JPEG (r6, T.81 B.2.3):
    three single-component scans — each component's blocks in raster
    order over its OWN grid (not the MCU-padded grid), DC predictor
    fresh per scan — must decode bit-for-bit like the interleaved scan
    of the same planes, at every subsampling and at odd dimensions."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(59)
    for w, h, sub in [(24, 16, "4:2:0"), (17, 13, "4:2:0"),
                      (16, 16, "4:4:4"), (19, 11, "4:2:2")]:
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        hy, vy = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[sub]
        cw, ch = -(-w // hy), -(-h // vy)
        cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        kw = dict(subsampling=sub, cb_pixels=cb.tobytes(),
                  cr_pixels=cr.tobytes())
        b_int = C.encode_jpeg_color(w, h, y.tobytes(), **kw)
        b_non = C.encode_jpeg_color(w, h, y.tobytes(), interleave=False,
                                    **kw)
        assert b_non != b_int
        assert b_non.count(b"\xff\xda") == 3  # three scans on the wire
        assert C.decode_jpeg(b_non) == C.decode_jpeg(b_int), (w, h, sub)
        assert C.decode_jpeg_gray(b_non) == C.decode_jpeg_gray(b_int)

    # truncation inside a later scan still fails loudly
    with pytest.raises(ValueError):
        C.decode_jpeg(b_non[:len(b_non) - 4])

    # the ARITHMETIC stack gets the same treatment: three QM scans
    # (fresh coder + statistics per scan) == the interleaved stream
    for w, h, sub in [(24, 16, "4:2:0"), (17, 13, "4:4:4")]:
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        hy, vy = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[sub]
        cw, ch = -(-w // hy), -(-h // vy)
        kw = dict(subsampling=sub,
                  cb_pixels=rng.integers(0, 256, (ch, cw),
                                         dtype=np.uint8).tobytes(),
                  cr_pixels=rng.integers(0, 256, (ch, cw),
                                         dtype=np.uint8).tobytes())
        a_int = C.encode_jpeg_arith_color(w, h, y.tobytes(), **kw)
        a_non = C.encode_jpeg_arith_color(w, h, y.tobytes(),
                                          interleave=False, **kw)
        assert a_non.count(b"\xff\xda") >= 3
        assert C.decode_jpeg(a_non) == C.decode_jpeg(a_int), (w, h, sub)
        # and the huffman and arithmetic non-interleaved streams agree
        b_non2 = C.encode_jpeg_color(w, h, y.tobytes(),
                                     interleave=False, **kw)
        assert C.decode_jpeg(a_non) == C.decode_jpeg(b_non2)


def test_jpeg_cmyk_ycck():
    """4-component CMYK/YCCK JPEG (r6): the Adobe APP14 transform byte
    picks the interpretation; channels return in the stored
    (inverted-ink) convention. Even-constant planes are exact; YCCK
    runs the YCC triplet through the JFIF matrix leaving K alone; a
    5-component frame stays a loud seam."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    w = h = 16
    cC, cM, cY, cK = 40, 80, 120, 200  # even -> quantizer-exact
    mk = [bytes([v]) * (w * h) for v in (cC, cM, cY, cK)]
    blob = C.encode_jpeg_cmyk(w, h, *mk)
    gw, gh, nch, px = C.decode_jpeg(blob)
    assert (gw, gh, nch) == (w, h, 4)
    assert px == bytes([cC, cM, cY, cK]) * (w * h)

    # YCCK: same planes, transform=2 -> JFIF conversion of the triplet
    blob2 = C.encode_jpeg_cmyk(w, h, *mk, ycck=True)
    assert blob2 != blob
    _, _, nch2, px2 = C.decode_jpeg(blob2)
    r = min(255, max(0, int(np.floor(cC + 1.402 * (cY - 128) + 0.5))))
    g = min(255, max(0, int(np.floor(cC - 0.344136 * (cM - 128)
                                     - 0.714136 * (cY - 128) + 0.5))))
    b = min(255, max(0, int(np.floor(cC + 1.772 * (cM - 128) + 0.5))))
    assert (nch2, px2) == (4, bytes([r, g, b, cK]) * (w * h))

    # no APP14 at all: 4 components default to CMYK-as-stored
    app14_at = blob.index(b"\xff\xee")
    ln = int.from_bytes(blob[app14_at + 2:app14_at + 4], "big")
    stripped = blob[:app14_at] + blob[app14_at + 2 + ln:]
    assert C.decode_jpeg(stripped) == (w, h, 4, px)

    # gray surface still returns the first component plane
    assert C.decode_jpeg_gray(blob) == (w, h, bytes([cC]) * (w * h))

    # bumping ncomp to 5 without a fifth component spec is malformed
    # input (truncated SOF), not silent garbage
    bad = bytearray(stripped)
    sof_at = bad.index(b"\xff\xc0")
    bad[sof_at + 9] = 5  # ncomp byte
    with pytest.raises(ValueError):
        C.decode_jpeg(bytes(bad))


def test_avi_mrle_video():
    """MS-RLE AVI video (r6): frames are BI_RLE8 streams; pixels a
    frame never writes keep the previous frame's value (the codec's
    inter-frame delta). Full-paint roundtrip through the identity-gray
    palette is exact (RGB = 3x index); a hand-built delta frame proves
    the skip semantics; a custom palette maps through strf."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(61)
    w, h = 12, 6
    f0 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f1 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    blob = C.encode_avi_mrle([f0.tobytes(), f1.tobytes()], w, h)
    gw, gh, frames = C.decode_mrle_video(blob)
    assert (gw, gh) == (w, h)
    for src, got in zip((f0, f1), frames):
        exp = np.repeat(src[:, :, None], 3, axis=2)
        assert got == exp.tobytes()

    # container sniff agrees
    assert C.decode_avi_frames(blob)[2] == "mrle"

    # hand-built DELTA second frame: EOL-skip the whole bottom row,
    # then repaint only the first 4 pixels of the next row, EOB — all
    # other pixels must KEEP frame 0's values
    delta = bytearray()
    delta += b"\x00\x00"            # end of line: skip stored row 0
    delta += bytes([4, 200])        # run of 4 at x=0..3 of stored row 1
    delta += b"\x00\x01"            # end of bitmap
    # splice: replace frame 2's chunk in the encoder's container,
    # fixing the RIFF and LIST-movi sizes for the shrunken chunk
    enc0 = C.encode_avi_mrle([f0.tobytes(), f0.tobytes()], w, h)
    first = enc0.index(b"00dc")
    second = enc0.index(b"00dc", first + 4)
    (ln,) = _st.unpack("<I", enc0[second + 4:second + 8])
    old_total = 8 + ln + (ln & 1)
    new_body = (b"00dc" + _st.pack("<I", len(delta)) + bytes(delta)
                + (b"\x00" if len(delta) % 2 else b""))
    shrink = old_total - len(new_body)
    patched = bytearray(enc0[:second] + new_body
                        + enc0[second + old_total:])
    (riff_ln,) = _st.unpack("<I", patched[4:8])
    patched[4:8] = _st.pack("<I", riff_ln - shrink)
    movi_at = patched.index(b"movi") - 8  # its LIST header
    (movi_ln,) = _st.unpack("<I", patched[movi_at + 4:movi_at + 8])
    patched[movi_at + 4:movi_at + 8] = _st.pack("<I", movi_ln - shrink)
    patched = bytes(patched)
    _, _, dframes = C.decode_mrle_video(patched)
    base = np.repeat(f0[:, :, None], 3, axis=2).copy()
    # stored row 1 (bottom-up) = display row h-2; x 0..3 -> 200
    base[h - 2, 0:4, :] = 200
    assert dframes[1] == base.tobytes()
    assert dframes[0] == np.repeat(f0[:, :, None], 3, axis=2).tobytes()

    # custom palette maps through strf
    pal = [(255 - k, k, k // 2) for k in range(256)]
    blob_p = C.encode_avi_mrle([f0.tobytes()], w, h, palette=pal)
    _, _, pframes = C.decode_mrle_video(blob_p)
    lut = np.array(pal, dtype=np.uint8)
    assert pframes[0] == lut[f0].tobytes()

    # a non-MRLE stream refuses the MRLE surface
    raw = C.encode_avi_raw([f0.tobytes()], w, h)
    with pytest.raises(ValueError, match="non-MRLE"):
        C.decode_mrle_video(raw)


def test_bmp_embedded_jpeg_png():
    """BI_JPEG (4) / BI_PNG (5) BMPs (r6): the printer-passthrough
    forms wrap a whole JPEG/PNG stream after the header — decode hands
    the embedded bytes to the native codecs."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(67)
    img = (rng.integers(0, 128, (16, 16), dtype=np.uint8) * 2)
    blocks = np.kron(rng.integers(0, 128, (2, 2), dtype=np.uint8) * 2,
                     np.ones((8, 8), dtype=np.uint8))

    def wrap(blob, comp, w, h):
        hdr = (_st.pack("<IiiHHIIiiII", 40, w, h, 1, 0, comp,
                        len(blob), 0, 0, 0, 0))
        off = 14 + 40
        return (b"BM" + _st.pack("<IHHI", off + len(blob), 0, 0, off)
                + hdr + blob)

    jb = C.encode_jpeg_gray(16, 16, blocks.tobytes())
    assert C.decode_bmp(wrap(jb, 4, 16, 16)) == C.decode_jpeg(jb)
    pb = C.encode_png(16, 16, img.tobytes())
    assert C.decode_bmp(wrap(pb, 5, 16, 16)) == C.decode_png_ex(pb)

    # unknown compression still refuses loudly
    with pytest.raises(NotImplementedError, match="compression 7"):
        C.decode_bmp(wrap(jb, 7, 16, 16))


def test_avi_mrle_zeroed_handler_and_progressive_base_pyramid():
    """Two review-r6 regressions: (1) an MRLE AVI whose muxer zeroed
    fccHandler signals the codec via strf biCompression=1 — must not be
    misread as uncompressed DIB; (2) a DHP pyramid whose BASE frame is
    multi-scan (progressive SOF2) must collect every scan, not truncate
    at the first SOS."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(71)
    w, h = 12, 6
    f0 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    blob = bytearray(C.encode_avi_mrle([f0.tobytes()], w, h))
    hdl = blob.index(b"vids") + 4
    assert blob[hdl:hdl + 4] == b"MRLE"
    blob[hdl:hdl + 4] = b"\x00\x00\x00\x00"
    assert C.decode_avi_frames(bytes(blob))[2] == "mrle"
    _, _, frames = C.decode_mrle_video(bytes(blob))
    assert frames[0] == np.repeat(f0[:, :, None], 3, axis=2).tobytes()

    # hand-build a pyramid with a PROGRESSIVE base: DHP + SOF2 stream
    # segments + EXP + SOF7 lossless refinement computed against the
    # progressive base's decode (multi-scan base must fully decode)
    import struct as _st

    img = rng.integers(0, 256, (10, 14), dtype=np.uint8).astype(np.int64)
    w2, h2 = 7, 5
    half = img[0::2, 0::2].astype(np.uint8)
    base = C.encode_jpeg_progressive(w2, h2, half.tobytes())
    assert base.count(b"\xff\xda") > 1  # genuinely multi-scan
    _, _, bpx = C.decode_jpeg_gray(base)
    ref = np.frombuffer(bpx, np.uint8).reshape(h2, w2).astype(np.int64)
    up = C._hier_upsample(ref, 10, 14)
    sdiffm = (img - up) % 65536
    sdiff = np.where(sdiffm >= 32768, sdiffm - 65536, sdiffm)
    ll_vals = list(range(17))
    ll_bits = [0] * 16
    ll_bits[4] = 17
    tab = C._huff_codes(ll_bits, ll_vals)
    wtr = C._BitWriter()
    for d in sdiff.reshape(-1):
        d = int(d)
        if d == -32768:
            code, length = tab[16]
            wtr.write(code, length)
            continue
        size, bits = C._magnitude(d)
        code, length = tab[size]
        wtr.write(code, length)
        if size:
            wtr.write(bits, size)
    wtr.flush()

    def seg(marker, body):
        return (bytes([0xFF, marker])
                + _st.pack(">H", len(body) + 2) + body)

    pyramid = (b"\xff\xd8"
               + seg(0xDE, _st.pack(">BHHB", 8, 10, 14, 1)
                     + bytes([1, 0x11, 0]))
               + base[2:-2]
               + seg(0xDF, bytes([0x11]))
               + seg(0xC7, _st.pack(">BHHB", 8, 10, 14, 1)
                     + bytes([1, 0x11, 0]))
               + seg(0xC4, bytes([0x00]) + bytes(ll_bits) + bytes(ll_vals))
               + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
               + bytes(wtr.out) + b"\xff\xd9")
    assert C.decode_jpeg_gray(pyramid) == (
        14, 10, img.astype(np.uint8).tobytes())


def test_wav_multichannel():
    """>2-channel WAV (r6): PCM, float32 and G.711 are sample-granular,
    so 6-channel (5.1) streams decode to the same interleaved ints the
    format stores; ADPCM stays mono/stereo."""
    import struct as _st

    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    def wav(afmt, channels, bits, body):
        fmt = _st.pack("<HHIIHH", afmt, channels, 8000,
                       8000 * channels * bits // 8,
                       channels * bits // 8, bits)
        riff = (b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
                + b"data" + _st.pack("<I", len(body)) + body)
        return b"RIFF" + _st.pack("<I", len(riff)) + riff

    rng = np.random.default_rng(73)
    pcm = rng.integers(-30000, 30000, 6 * 10).astype("<i2")
    rate, got = C.decode_wav(wav(1, 6, 16, pcm.tobytes()))
    assert rate == 8000 and got == pcm.tolist()

    f32 = rng.random(8 * 5).astype("<f4")
    _, gotf = C.decode_wav(wav(3, 8, 32, f32.tobytes()))
    assert gotf == f32.tolist()

    # 4-channel mu-law expands through the same table as mono
    comp = rng.integers(0, 256, 4 * 9).astype(np.uint8)
    _, gotm = C.decode_wav(wav(7, 4, 8, comp.tobytes()))
    _, mono = C.decode_wav(wav(7, 1, 8, comp.tobytes()))
    assert gotm == mono

    # ADPCM >2ch stays a loud seam
    with pytest.raises(NotImplementedError, match="mono/stereo"):
        C.decode_wav(wav(0x11, 6, 4, b"\x00" * 48))


def test_encode_bmp_all_modes():
    """encode_bmp (r6): every mode — 24-bit BGR, 8-bit palettized,
    BI_RLE8 runs, BI_BITFIELDS 32-bit — roundtrips through decode_bmp
    to B=G=R replication of the gray input (the analytic-oracle
    contract: decoded RGB sum = 3x the gray sum)."""
    import numpy as np

    from rlis2osm_spark.functions import codecs as C

    rng = np.random.default_rng(79)
    for w, h in [(7, 5), (12, 9), (4, 4)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        exp = np.repeat(img[:, :, None], 3, axis=2).tobytes()
        for mode in ("bgr24", "pal8", "rle8", "bf32"):
            got = C.decode_bmp(C.encode_bmp(w, h, img.tobytes(),
                                            mode=mode))
            assert got == (w, h, 3, exp), (w, h, mode)
    with pytest.raises(ValueError, match="mode"):
        C.encode_bmp(4, 4, bytes(16), mode="png")


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    w=st.integers(min_value=1, max_value=28),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    entropy=st.sampled_from(["arith", "huffman"]),
)
def test_jpeg_hierarchical_roundtrip_property(w, h, seed, entropy):
    """Lossless-differential pyramids are exact for ANY image by
    construction (lossy base + mod-65536 refinement) — property-test
    both entropy stacks across arbitrary dims, including 1-pixel
    degenerate pyramids."""
    from rlis2osm_spark.functions.codecs import (
        decode_jpeg_gray, encode_jpeg_hierarchical)

    px = bytes((seed * 31 + k * 7919) % 256 for k in range(w * h))
    blob = encode_jpeg_hierarchical(w, h, px, entropy=entropy)
    assert decode_jpeg_gray(blob) == (w, h, px)
