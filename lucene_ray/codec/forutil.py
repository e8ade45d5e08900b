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

    if allow_pfor and width > 1 and n == BLOCK_SIZE:
        # PFor: pick the base width covering all but <= 7 exceptions, with
        # exception high bits fitting one byte (width - base <= 8), as in
        # PForUtil.java: exceptions are (position, top-bits-byte) pairs.
        # Only full blocks (Lucene encodes tails separately too).
        # bit widths via frexp exponent (exact for ints < 2^53, vectorized)
        widths = np.frexp(values.astype(np.float64))[1]
        hist = np.bincount(widths, minlength=width + 2)
        tail = hist[::-1].cumsum()[::-1]  # tail[b] = count(widths >= b)
        for base in range(max(width - 8, 1), width):
            n_exc = int(tail[base + 1])
            if n_exc <= PFOR_MAX_EXCEPTIONS:
                pfor_bytes = 3 + 2 * n_exc + (n * base + 7) // 8
                if pfor_bytes < for_bytes:
                    exc = np.nonzero(widths > base)[0]
                    low = values.copy()
                    high = (values[exc] >> np.uint32(base)).astype(np.uint8)
                    low[exc] = values[exc] & ((np.uint32(1) << np.uint32(base)) - 1)
                    out = bytearray([_PFOR_MARKER, base, n_exc])
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


def _pack_full_blocks(vals: np.ndarray, width: int) -> np.ndarray:
    """Pack a (k, BLOCK_SIZE) uint32 matrix at ``width`` bits/value into
    (k, 16*width) bytes, MSB-first — identical layout to ``_pack_bits`` but
    via uint64 word-lane shift-or (no 8-bytes-per-bit expansion; ~10x less
    memory traffic than the bit-tensor + packbits route)."""
    k = vals.shape[0]
    n_words = BLOCK_SIZE * width // 64  # BLOCK_SIZE*width is a multiple of 64
    words = np.zeros((k, n_words), dtype=np.uint64)
    v64 = vals.astype(np.uint64)
    for i in range(BLOCK_SIZE):
        bitpos = i * width
        w_idx = bitpos >> 6
        shift = 64 - (bitpos & 63) - width
        col = v64[:, i]
        if shift >= 0:
            words[:, w_idx] |= col << np.uint64(shift)
        else:
            words[:, w_idx] |= col >> np.uint64(-shift)
            words[:, w_idx + 1] |= col << np.uint64(64 + shift)
    # MSB-first byte order == big-endian words
    return words.byteswap().view(np.uint8).reshape(k, n_words * 8)


def encode_blocks_batched(
    values: np.ndarray,
    lens: np.ndarray,
    allow_pfor: bool = True,
) -> tuple[bytes, np.ndarray]:
    """Batch-encode MANY blocks in one vectorized pass.

    ``values`` is a contiguous tiling of blocks; ``lens`` (each 1..BLOCK_SIZE)
    gives the block lengths in order. Produces the same byte grammar as
    ``_encode_block`` per block. Returns (buffer, per-block byte offsets).

    Vectorization: per-block min/max via ``reduceat``; constant blocks
    scatter 5-byte runs; full FOR blocks group by bit width and pack each
    width group with ONE ``np.packbits`` call; PFor-eligible blocks pick the
    base as the 8th-largest per-value width; only partial tail blocks and
    the (rare) PFor blocks fall back to the scalar encoder. This is what
    makes segment build vectorized end-to-end (gen_ForUtil.py's generated
    SIMD kernels are the reference analog, codecs/lucene99/ForUtil.java:30).
    """
    n_b = len(lens)
    offsets = np.zeros(n_b, dtype=np.int64)
    if n_b == 0:
        return b"", offsets
    values = np.ascontiguousarray(values, dtype=np.uint32)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = starts + lens
    maxs = np.maximum.reduceat(values, starts)
    mins = np.minimum.reduceat(values, starts)
    widths = np.frexp(maxs.astype(np.float64))[1].astype(np.int64)  # bit_length

    is_const = maxs == mins
    is_full = lens == BLOCK_SIZE

    # scheme per block: 0=const, 1=FOR-full (width-grouped), 2=scalar
    scheme = np.full(n_b, 2, dtype=np.int8)
    scheme[is_const] = 0
    scheme[(~is_const) & is_full] = 1

    pfor_base = np.zeros(n_b, dtype=np.int64)
    n_exc_arr = np.zeros(n_b, dtype=np.int64)
    if allow_pfor:
        cand = np.nonzero((scheme == 1) & (widths > 1))[0]
        if len(cand):
            idx = starts[cand][:, None] + np.arange(BLOCK_SIZE)
            vw = np.frexp(values[idx].astype(np.float64))[1].astype(np.int64)
            vw_sorted = np.sort(vw, axis=1)
            eighth = vw_sorted[:, -(PFOR_MAX_EXCEPTIONS + 1)]
            w = widths[cand]
            base = np.maximum(np.maximum(eighth, w - 8), 1)
            n_exc = (vw > base[:, None]).sum(axis=1)
            pfor_bytes = 3 + 2 * n_exc + (BLOCK_SIZE * base + 7) // 8
            for_bytes = 1 + (BLOCK_SIZE * w + 7) // 8
            use = (base < w) & (pfor_bytes < for_bytes)
            sel = cand[use]
            scheme[sel] = 3
            pfor_base[sel] = base[use]
            n_exc_arr[sel] = n_exc[use]

    # encoded byte size per block
    sizes = np.empty(n_b, dtype=np.int64)
    sizes[scheme == 0] = 5
    sizes[scheme == 1] = 1 + (BLOCK_SIZE * widths[scheme == 1] + 7) // 8
    sizes[scheme == 2] = 1 + (lens[scheme == 2] * widths[scheme == 2] + 7) // 8
    sizes[scheme == 3] = (
        3 + 2 * n_exc_arr[scheme == 3] + (BLOCK_SIZE * pfor_base[scheme == 3] + 7) // 8
    )
    offsets[1:] = np.cumsum(sizes)[:-1]
    buf = np.zeros(int(sizes.sum()), dtype=np.uint8)

    # constant blocks: header 0x40 + u32le, scattered in one shot
    ci = np.nonzero(scheme == 0)[0]
    if len(ci):
        rows = np.empty((len(ci), 5), dtype=np.uint8)
        rows[:, 0] = _CONST_MARKER
        rows[:, 1:] = maxs[ci].astype("<u4").view(np.uint8).reshape(len(ci), 4)
        buf[offsets[ci][:, None] + np.arange(5)] = rows

    # full FOR blocks, one word-lane pack per distinct width
    fi = np.nonzero(scheme == 1)[0]
    if len(fi):
        for w in np.unique(widths[fi]):
            grp = fi[widths[fi] == w]
            if w == 0:
                buf[offsets[grp]] = 0
                continue
            idx = starts[grp][:, None] + np.arange(BLOCK_SIZE)
            packed = _pack_full_blocks(values[idx], int(w))
            nbytes = (BLOCK_SIZE * int(w) + 7) // 8
            buf[offsets[grp]] = w
            buf[offsets[grp][:, None] + 1 + np.arange(nbytes)] = packed[:, :nbytes]

    # PFor blocks, batched by base width (positions-delta streams are mostly
    # PFor: small deltas + few large gaps)
    pi = np.nonzero(scheme == 3)[0]
    if len(pi):
        for base in np.unique(pfor_base[pi]):
            grp = pi[pfor_base[pi] == base]
            idx = starts[grp][:, None] + np.arange(BLOCK_SIZE)
            vals = values[idx]
            vw = np.frexp(vals.astype(np.float64))[1]
            exc_mask = vw > base
            lows = np.where(
                exc_mask, vals & ((np.uint32(1) << np.uint32(base)) - 1), vals
            ).astype(np.uint32)
            packed = _pack_full_blocks(lows, int(base))
            nbytes = (BLOCK_SIZE * int(base) + 7) // 8
            hdr_off = offsets[grp]
            n_exc_g = n_exc_arr[grp]
            buf[hdr_off] = _PFOR_MARKER
            buf[hdr_off + 1] = base
            buf[hdr_off + 2] = n_exc_g
            # exception (pos, high-byte) pairs: ragged/tiny -> python loop,
            # no numpy calls inside
            highs = (vals >> np.uint32(base)).astype(np.uint8)
            exc_rows, exc_pos = np.nonzero(exc_mask)
            high_vals = highs[exc_rows, exc_pos]
            row_start = np.searchsorted(exc_rows, np.arange(len(grp)))
            row_end = np.append(row_start[1:], len(exc_rows))
            for r in range(len(grp)):
                o = int(hdr_off[r]) + 3
                for e in range(int(row_start[r]), int(row_end[r])):
                    buf[o] = exc_pos[e]
                    buf[o + 1] = high_vals[e]
                    o += 2
            pack_start = hdr_off + 3 + 2 * n_exc_g
            buf[pack_start[:, None] + np.arange(nbytes)] = packed[:, :nbytes]

    # scalar fallback: partial tail blocks only (one per term)
    rest = np.nonzero(scheme == 2)[0]
    for b in rest:
        enc = _encode_block(values[starts[b] : ends[b]], allow_pfor=False)
        if len(enc) != sizes[b]:  # both paths must agree on the scheme
            raise AssertionError(
                f"batched size mismatch: block {b} "
                f"expected {sizes[b]} got {len(enc)}"
            )
        buf[offsets[b] : offsets[b] + len(enc)] = np.frombuffer(enc, dtype=np.uint8)
    return buf.tobytes(), offsets


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


def _unpack_full_blocks(packed: np.ndarray, width: int) -> np.ndarray:
    """Inverse of ``_pack_full_blocks``: (k, 16*width) bytes -> (k,
    BLOCK_SIZE) uint32, via big-endian uint64 word lanes."""
    k = packed.shape[0]
    n_words = BLOCK_SIZE * width // 64
    words = (
        packed[:, : n_words * 8]
        .reshape(k, n_words, 8)
        .copy()
        .view(">u8")
        .reshape(k, n_words)
        .astype(np.uint64)
    )
    out = np.empty((k, BLOCK_SIZE), dtype=np.uint32)
    mask = (np.uint64(1) << np.uint64(width)) - np.uint64(1)
    for i in range(BLOCK_SIZE):
        bitpos = i * width
        w_idx = bitpos >> 6
        shift = 64 - (bitpos & 63) - width
        if shift >= 0:
            out[:, i] = (words[:, w_idx] >> np.uint64(shift)) & mask
        else:
            hi = words[:, w_idx] << np.uint64(-shift)
            lo = words[:, w_idx + 1] >> np.uint64(64 + shift)
            out[:, i] = (hi | lo) & mask
    return out


def decode_blocks_batched(
    buf: np.ndarray, block_offsets: np.ndarray, block_lens: np.ndarray
) -> np.ndarray:
    """Decode MANY blocks in one vectorized pass (mirror of
    ``encode_blocks_batched``) — the whole-segment decoder used by merge.

    ``buf``: uint8 array containing every block back to back (possibly with
    unrelated bytes between streams); ``block_offsets`` absolute offsets of
    each block header; ``block_lens`` value counts. Returns the concatenated
    values in block order.
    """
    n_b = len(block_offsets)
    total = int(block_lens.sum())
    out = np.empty(total, dtype=np.uint32)
    if n_b == 0:
        return out
    out_starts = np.concatenate(([0], np.cumsum(block_lens)[:-1]))
    headers = buf[block_offsets]
    is_full = block_lens == BLOCK_SIZE

    # constant blocks
    ci = np.nonzero(headers == _CONST_MARKER)[0]
    if len(ci):
        vals = (
            buf[block_offsets[ci][:, None] + 1 + np.arange(4)]
            .copy()
            .view("<u4")
            .reshape(-1)
        )
        idx = np.repeat(out_starts[ci], block_lens[ci]) + (
            np.arange(int(block_lens[ci].sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(block_lens[ci])[:-1])), block_lens[ci])
        )
        out[idx] = np.repeat(vals, block_lens[ci])

    # full FOR blocks, grouped by width
    fi = np.nonzero((headers <= 32) & is_full)[0]
    if len(fi):
        for w in np.unique(headers[fi]):
            grp = fi[headers[fi] == w]
            if w == 0:
                for b in grp:
                    out[out_starts[b] : out_starts[b] + BLOCK_SIZE] = 0
                continue
            nbytes = (BLOCK_SIZE * int(w) + 7) // 8
            packed = buf[block_offsets[grp][:, None] + 1 + np.arange(nbytes)]
            vals = _unpack_full_blocks(packed, int(w))
            idx = out_starts[grp][:, None] + np.arange(BLOCK_SIZE)
            out[idx.reshape(-1)] = vals.reshape(-1)

    done = np.zeros(n_b, dtype=bool)
    done[ci] = True
    done[fi] = True

    # full PFor blocks, grouped by base width (positions streams are mostly
    # PFor); exceptions patched in a short python loop
    pi = np.nonzero((headers == _PFOR_MARKER) & is_full)[0]
    if len(pi):
        bases = buf[block_offsets[pi] + 1]
        n_excs = buf[block_offsets[pi] + 2].astype(np.int64)
        for base in np.unique(bases):
            grp_mask = bases == base
            grp = pi[grp_mask]
            ne = n_excs[grp_mask]
            nbytes = (BLOCK_SIZE * int(base) + 7) // 8
            starts_p = block_offsets[grp] + 3 + 2 * ne
            packed = buf[starts_p[:, None] + np.arange(nbytes)]
            vals = _unpack_full_blocks(packed, int(base))
            for r in np.nonzero(ne)[0]:
                o = int(block_offsets[grp[r]]) + 3
                for _e in range(int(ne[r])):
                    pos = int(buf[o])
                    high = int(buf[o + 1])
                    vals[r, pos] |= np.uint32(high) << np.uint32(int(base))
                    o += 2
            idx = out_starts[grp][:, None] + np.arange(BLOCK_SIZE)
            out[idx.reshape(-1)] = vals.reshape(-1)
        done[pi] = True

    # tails (and any non-full PFor, which the encoder never emits) via the
    # scalar block decoder
    rest = np.nonzero(~done)[0]
    for b in rest:
        vals, _ = _decode_block(buf, int(block_offsets[b]), int(block_lens[b]))
        out[out_starts[b] : out_starts[b] + block_lens[b]] = vals
    return out


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
