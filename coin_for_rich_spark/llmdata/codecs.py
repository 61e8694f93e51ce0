"""Pure-stdlib media codecs: PNG (8-bit grayscale) and WAV (PCM16 mono).

The container ships no media libraries (PIL/librosa/pyav), but two real
formats need none: PNG's pixel stream is zlib (stdlib) behind a documented
chunk layout + per-row filters, and WAV is a RIFF header around raw PCM.
These are complete, spec-faithful implementations for the supported subset —
REAL decode, not a stub — and they draw the honest codec boundary tightly:
anything outside 8-bit grayscale PNG / 16-bit mono PCM WAV raises
``NotImplementedError`` naming the missing capability.

Encoders exist so the engine can *generate* valid media deterministically
(test fixtures, synthetic corpora); decoders implement the full filter set
(None/Sub/Up/Average/Paeth for PNG) so they also read externally produced
files of the supported subset, not just our own output.

All pixel/sample math is integer-exact (uint8 / int16 → int64 sums), so any
statistic derived from a decode is bit-identical across engines.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode_gray(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG (filter 0)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("png_encode_gray expects a 2-D (h, w) array")
    h, w = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a (h, w) uint8 array.

    Implements the full per-row filter set (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth), so any spec-conforming encoder's grayscale-8 output decodes —
    interlacing, palettes, other bit depths and color types are outside the
    supported subset and raise.
    """
    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_MAGIC)
    width = height = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color) != (8, 0):
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} is outside "
                    "the supported subset (8-bit grayscale)"
                )
            if interlace != 0:
                raise NotImplementedError("interlaced PNG is not supported")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("PNG pixel stream length mismatch")
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * stride]
        row = np.frombuffer(raw, dtype=np.uint8, count=width, offset=y * stride + 1)
        row = row.astype(np.int64)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth carry left state
            cur = np.zeros(width, dtype=np.int64)
            left = 0
            for x in range(width):
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + int(prev[x])) // 2
                else:
                    pred = _paeth(left, int(prev[x]), int(prev[x - 1]) if x else 0)
                left = (int(row[x]) + pred) % 256
                cur[x] = left
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def resample_gray(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w) uint8 image to (target_h,
    target_w) — source pixel for output (x, y) is (floor(x·w/W), floor(y·h/H)),
    the standard NN mapping. Integer index math only: deterministic on any
    platform, and exactly predictable by an oracle that knows the source
    pixels."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    if target_w < 1 or target_h < 1:
        raise ValueError("target dimensions must be >= 1")
    xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
    ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
    return px[np.ix_(ys, xs)]


def wav_encode_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a mono PCM16 WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError("wav_encode_pcm16 expects a 1-D array")
    payload = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono PCM16 WAV to (int16 samples, sample_rate).

    Walks the RIFF chunk list (so extra chunks like LIST/fact are skipped);
    compressed, multi-channel, or non-16-bit audio is outside the supported
    subset and raises.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise NotImplementedError(
                    f"WAV format {audio_fmt}/{channels}ch/{bits}bit is outside "
                    "the supported subset (PCM mono 16-bit)"
                )
        elif typ == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if sample_rate is None or samples is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    return samples, sample_rate
