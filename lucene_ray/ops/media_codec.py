"""Real (pure-Python + stdlib) media codecs for the multimodal pipeline.

The container ships no image/audio codec libraries, but two real formats
are decodable from first principles with only the standard library:

- **PNG** (grayscale / RGB / RGBA, 8-bit): chunk parse with CRC checks,
  zlib inflate, and the full scanline unfilter set (None/Sub/Up/Average/
  Paeth) from the PNG spec. The encoder exercises every filter type
  (cycling per row) so decode tests cover the whole unfilter matrix.
- **WAV** (RIFF PCM 16-bit): header parse + numpy frombuffer.

These replace the former byte-histogram STUB as the decode kernel of the
multimodal actor stage (ops/multimodal.py) — the feature columns produced
downstream are now derived from real decoded pixels/samples.

Scale note: decoding happens inside map_batches actor workers, one payload
at a time (images/audio are row-wise opaque); the per-row loop is over
MEDIA ITEMS, which is the irreducible unit of codec work. The PNG
unfilter loops over image ROWS (each row vectorized over pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit image as a real PNG. ``pixels``: (h, w) grayscale or
    (h, w, 3|4) RGB(A) uint8. Scanline filters CYCLE 0..4 by row so the
    decoder's whole unfilter set is exercised by any image >= 5 rows."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch  # bytes per pixel at depth 8
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            pred = _paeth(left.astype(np.int16), prev.astype(np.int16), ul.astype(np.int16))
            filt = (row.astype(np.int16) - pred).astype(np.uint8)
        raw.append(ft)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a scanline (spec §9, filter 4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to (h, w) or (h, w, ch) uint8. Supports color
    types 0/2/4/6 at bit depth 8, no interlace — the subset the encoder
    above (and typical ML thumbnails) produce. CRCs are verified."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, bytearray(), None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS or inter:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} interlace={inter})"
                )
            meta = (w, h, _PNG_CHANNELS[color])
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = line + prev
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential by definition; recur
            # pixel-group-at-a-time over the row (bpp-strided)
            row = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                # left/up/ul are RECONSTRUCTED bytes (mod 256) — masking
                # must happen per element, not once at row end
                left = int(row[i - ch]) if i >= ch else 0
                up = int(prev[i])
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[i - ch]) if i >= ch else 0
                    pred = int(
                        _paeth(
                            np.array([left], dtype=np.int16),
                            np.array([up], dtype=np.int16),
                            np.array([ul], dtype=np.int16),
                        )[0]
                    )
                row[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = (row & 0xFF).astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Real RIFF/WAVE container around 16-bit mono PCM."""
    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE PCM-16 mono payload -> (int16 samples, rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt} channels={ch} bits={bits})"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + length + (length & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate
