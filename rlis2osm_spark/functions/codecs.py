"""Real media codecs with no external libraries (VERDICT r2 #3):

- PNG: stdlib ``zlib`` + ``struct`` over the public PNG spec (8-bit
  grayscale, scanline filters 0-4 on decode, 0-2 on encode);
- WAV: ``struct`` over the public RIFF/WAVE spec (16-bit PCM mono).

These convert the multimodal operators' ``decode_stub=False`` seam into a
working decoder for the two formats the derived corpus emits; jpeg/gif/
video remain behind the disclosed ``NotImplementedError`` seam
(operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               filter_type: int = 0) -> bytes:
    """8-bit grayscale PNG. ``pixels`` is row-major ``width*height`` bytes;
    ``filter_type`` in {0 (None), 1 (Sub), 2 (Up)} is applied to every
    scanline (the decoder handles all five standard filters)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filters 0/1/2")
    raw = bytearray()
    prior = bytes(width)
    for r in range(height):
        row = pixels[r * width:(r + 1) * width]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub: delta vs left neighbor
            raw += bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF
                         for i in range(width))
        else:  # Up: delta vs same column of prior row
            raw += bytes((row[i] - prior[i]) & 0xFF for i in range(width))
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """PNG -> (width, height, row-major grayscale pixels). Supports 8-bit
    grayscale (color type 0) with any standard scanline filter; other
    color types / bit depths raise NotImplementedError (the codec seam)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            interlace = body[12]
            if depth != 8 or ctype != 0 or interlace != 0:
                raise NotImplementedError(
                    f"decode_png supports non-interlaced 8-bit grayscale "
                    f"only (got depth={depth}, color_type={ctype}, "
                    f"interlace={interlace})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("IDAT size mismatch")
    out = bytearray()
    prior = bytes(width)
    for r in range(height):
        ft = raw[r * stride]
        row = bytearray(raw[r * stride + 1:(r + 1) * stride])
        if ft == 1:  # Sub
            for i in range(1, width):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(width):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(width):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(width):
                left = row[i - 1] if i else 0
                upleft = prior[i - 1] if i else 0
                row[i] = (row[i] + _paeth(left, prior[i], upleft)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter {ft}")
        out += row
        prior = bytes(row)
    return width, height, bytes(out)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """16-bit PCM mono WAV from an int iterable (clamped to int16)."""
    body = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(s)))) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """WAV -> (sample_rate, int16 samples). 16-bit PCM mono only; other
    encodings raise NotImplementedError (the codec seam)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    samples: list[int] = []
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            afmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if afmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"decode_wav supports 16-bit PCM mono only "
                    f"(got fmt={afmt}, ch={channels}, bits={bits})")
        elif tag == b"data":
            samples = [s[0] for s in struct.iter_unpack("<h", body[:len(body) & ~1])]
    if rate is None:
        raise ValueError("missing fmt chunk")
    return rate, samples
