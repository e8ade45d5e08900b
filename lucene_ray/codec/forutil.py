"""FOR / PFor / constant-run bit-packing of 128-int blocks (numpy kernels).

Logical parity with the reference's packed-postings kernels:
  - FOR bit-packing of 128-int blocks: codecs/lucene99/ForUtil.java:30-56
    (block size fixed at 128, per-block bit width)
  - PFor with <= 7 patched exceptions, each exception's high bits stored as
    one byte: codecs/lucene99/PForUtil.java:27-60
  - delta + all-equal fast path (dense runs encode as a single marker):
    codecs/lucene99/ForDeltaUtil.java:25-62

This is a *storage-format re-expression*, not a byte-level port: the
reference's SIMD lane layout (gen_ForUtil.py) is replaced by MSB-first
bit-packing via ``np.packbits`` / ``np.unpackbits``; partial tail blocks are
packed with their own width instead of Lucene's VInt tail encoding. Logical
content (the int sequences) round-trips exactly.

Stream grammar (one stream = one term's docid-deltas, tfs, or pos-deltas):

  stream      := block*
  block       := FOR | CONST | PFOR          (values-per-block = 128, except
                                              the final block = n % 128)
  FOR         := width:u8 (0..32)  packed[ceil(n*width/8)]
  CONST       := 0x40  value:u32le           (all n values equal)
  PFOR        := 0x41 base_width:u8 n_exc:u8
                 (pos:u8 high:u8)*n_exc  packed[ceil(n*base_width/8)]

Width 0 encodes an all-zero block with zero payload bytes.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.config import BLOCK_SIZE, PFOR_MAX_EXCEPTIONS

_CONST_MARKER = 0x40
_PFOR_MARKER = 0x41


def _bit_width(max_val: int) -> int:
    return int(max_val).bit_length()


def _pack_bits(values: np.ndarray, width: int) -> bytes:
    """MSB-first pack of uint32 values at ``width`` bits each."""
    n = len(values)
    if width == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint32)
    bits = ((values[:, None] >> shifts) & 1).astype(np.uint8).reshape(-1)
    return np.packbits(bits).tobytes()


def _unpack_bits(buf: memoryview, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, count=nbytes))[: n * width]
    bits = bits.reshape(n, width).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(width - 1, -1, -1, dtype=np.uint32)).astype(
        np.uint32
    )
    return bits @ weights


def _encode_block(values: np.ndarray, allow_pfor: bool = True) -> bytes:
    """Encode one block (<= BLOCK_SIZE uint32 values)."""
    n = len(values)
    vmax = int(values.max()) if n else 0
    vmin = int(values.min()) if n else 0
    if n and vmax == vmin:
        return bytes([_CONST_MARKER]) + np.uint32(vmax).tobytes()
    width = _bit_width(vmax)
    for_bytes = 1 + (n * width + 7) // 8

    if allow_pfor and width > 1:
        # PFor: pick the base width covering all but <= 7 exceptions, with
        # exception high bits fitting one byte (width - base <= 8), as in
        # PForUtil.java: exceptions are (position, top-bits-byte) pairs.
        widths = np.array([_bit_width(int(v)) for v in values])
        for base in range(max(width - 8, 1), width):
            exc = np.nonzero(widths > base)[0]
            if len(exc) <= PFOR_MAX_EXCEPTIONS:
                pfor_bytes = 3 + 2 * len(exc) + (n * base + 7) // 8
                if pfor_bytes < for_bytes:
                    low = values.copy()
                    high = (values[exc] >> np.uint32(base)).astype(np.uint8)
                    low[exc] = values[exc] & ((np.uint32(1) << np.uint32(base)) - 1)
                    out = bytearray([_PFOR_MARKER, base, len(exc)])
                    for p, h in zip(exc, high):
                        out += bytes([int(p), int(h)])
                    out += _pack_bits(low, base)
                    return bytes(out)
                break  # wider bases only cost more
    return bytes([width]) + _pack_bits(values, width)


def _decode_block(buf: memoryview, offset: int, n: int) -> tuple[np.ndarray, int]:
    """Decode one block at ``offset``; returns (values, next_offset)."""
    marker = buf[offset]
    if marker == _CONST_MARKER:
        val = np.frombuffer(buf, dtype=np.uint32, count=1, offset=offset + 1)[0]
        return np.full(n, val, dtype=np.uint32), offset + 5
    if marker == _PFOR_MARKER:
        base = buf[offset + 1]
        n_exc = buf[offset + 2]
        p = offset + 3
        exc = np.frombuffer(buf, dtype=np.uint8, count=2 * n_exc, offset=p).reshape(
            n_exc, 2
        )
        p += 2 * n_exc
        nbytes = (n * base + 7) // 8
        values = _unpack_bits(buf[p : p + nbytes], n, base)
        if n_exc:
            values[exc[:, 0]] |= exc[:, 1].astype(np.uint32) << np.uint32(base)
        return values, p + nbytes
    width = marker
    nbytes = (n * width + 7) // 8
    values = _unpack_bits(buf[offset + 1 : offset + 1 + nbytes], n, width)
    return values, offset + 1 + nbytes


def encode_stream(
    values: np.ndarray, allow_pfor: bool = True
) -> tuple[bytes, np.ndarray]:
    """Encode a full int stream into blocks of BLOCK_SIZE.

    Returns (blob, block_byte_offsets int32) — offsets allow selective
    per-block decode (the skip-list replacement, SURVEY.md §2.1 skip-list
    sink row: random access over ``block_meta`` replaces skip levels).
    """
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    n_blocks = max(1, (n + BLOCK_SIZE - 1) // BLOCK_SIZE)
    offsets = np.empty(n_blocks, dtype=np.int32)
    parts: list[bytes] = []
    pos = 0
    for i in range(n_blocks):
        block = values[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        offsets[i] = pos
        enc = _encode_block(block, allow_pfor=allow_pfor)
        parts.append(enc)
        pos += len(enc)
    return b"".join(parts), offsets


def decode_stream(blob: bytes | memoryview, n: int) -> np.ndarray:
    """Decode a full stream of ``n`` values."""
    buf = memoryview(blob)
    out = np.empty(n, dtype=np.uint32)
    offset = 0
    done = 0
    while done < n:
        cnt = min(BLOCK_SIZE, n - done)
        vals, offset = _decode_block(buf, offset, cnt)
        out[done : done + cnt] = vals
        done += cnt
    return out


def decode_stream_blocks(
    blob: bytes | memoryview,
    n: int,
    block_offsets: np.ndarray,
    block_indices: np.ndarray,
) -> list[np.ndarray]:
    """Selectively decode only ``block_indices`` (sorted) of a stream."""
    buf = memoryview(blob)
    out = []
    for bi in block_indices:
        start = int(bi) * BLOCK_SIZE
        cnt = min(BLOCK_SIZE, n - start)
        vals, _ = _decode_block(buf, int(block_offsets[bi]), cnt)
        out.append(vals)
    return out
