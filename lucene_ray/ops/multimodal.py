"""Multimodal column plumbing: opaque binary payloads + typed metadata
through actor-pool decode/feature stages.

The container has no image/audio codecs, so the DECODE KERNEL IS STUBBED
(deterministic byte-level features; the real-codec branch raises
NotImplementedError) — but the Ray-side plumbing is real and tested:
  - binary column + metadata schema (media_id, media_type, payload, n_bytes)
  - actor-pool stage (callable class: "codec" loaded once per actor in
    __init__, batches in __call__) with small batch_size because payload
    rows are wide (ray_guide: memory-aware batch sizing for binary blobs)
  - fixed-width feature vectors out (list<float> column), ready for the
    knn/dedup pipelines downstream
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def media_table(sf_dir: str) -> "ray.data.Dataset":
    """Treat document text bytes as opaque media payloads (schema demo)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        payloads = [t.encode() for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["application/octet-stream"] * batch.num_rows),
                "payload": pa.array(payloads, type=pa.large_binary()),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=1024)


class FeatureExtractor:
    """Actor-pool stage: byte-histogram 'features' from binary payloads.

    ``real_codec=True`` is the branch where an actual image/audio decoder
    would load in __init__ — unavailable in this environment, so it raises
    NotImplementedError by contract (clearly-marked stub)."""

    def __init__(self, n_bins: int = 16, real_codec: bool = False):
        if real_codec:
            raise NotImplementedError(
                "no media codecs in this environment; byte-histogram stub only"
            )
        self.n_bins = n_bins
        # "model load" happens once per actor: precompute the bin lookup
        self.bin_of_byte = (np.arange(256) * n_bins // 256).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(self.bin_of_byte[arr], minlength=self.n_bins).astype(
                np.float32
            )
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": batch.column("n_bytes"),
                "features": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def extract_features(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    """media -> features via the actor pool (small batches: wide rows)."""
    return media_table(sf_dir).map_batches(
        FeatureExtractor,
        fn_constructor_kwargs=dict(n_bins=16),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )


class FeatureSummarizer:
    """Actor-pool stage: integer byte-histogram summary (driver-gate twin of
    FeatureExtractor — same bins, pre-normalization counts, so every output
    column is exactly SQL-expressible: bin16 of a byte is its high nibble,
    which DuckDB reads straight out of hex(encode(text))). Vectorized: one
    bincount over the batch's concatenated payload bytes."""

    def __init__(self, n_bins: int = 16):
        assert 256 % n_bins == 0
        self.n_bins = n_bins
        self.bin_of_byte = (np.arange(256) * n_bins // 256).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload").combine_chunks()
        n = len(col)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64, count=n + 1)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
        lens = np.diff(offs)
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(
            row_of_byte * self.n_bins + self.bin_of_byte[data],
            minlength=n * self.n_bins,
        ).reshape(n, self.n_bins)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": batch.column("n_bytes"),
                "top_bin": pa.array(hist.argmax(axis=1), type=pa.int64()),
                "top_count": pa.array(hist.max(axis=1), type=pa.int64()),
            }
        )


def media_features_summary(sf_dir: str, concurrency: int = 2) -> pa.Table:
    """(media_id, n_bytes, top_bin, top_count): deterministic all-integer
    feature summary for the driver gate — top_bin is the modal high nibble
    (ties -> lowest bin, np.argmax first-wins), exactly mirrored in SQL by
    ranking hex-digit counts of hex(encode(text))."""
    ds = media_table(sf_dir).map_batches(
        FeatureSummarizer,
        fn_constructor_kwargs=dict(n_bins=16),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )
    import ray

    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def media_features_summary_sql() -> str:
    return """
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), pos AS (
  SELECT doc_id, h, unnest(range(1, length(h) // 2 + 1)) AS i FROM hx
), nib AS (
  SELECT doc_id,
         strpos('0123456789ABCDEF', substring(h, 2 * i - 1, 1)) - 1 AS bin
  FROM pos
), cnt AS (
  SELECT doc_id, bin, count(*)::BIGINT AS c FROM nib GROUP BY doc_id, bin
), ranked AS (
  SELECT doc_id, bin, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bin ASC) AS rn
  FROM cnt
)
SELECT r.doc_id AS media_id,
       octet_length(encode(d.text))::BIGINT AS n_bytes,
       r.bin::BIGINT AS top_bin,
       r.c AS top_count
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rn = 1
"""


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th fixed-size 'frame' from
    a binary payload — the video frame-sampling plumbing (rows EXPAND:
    one media row -> several frame rows, so output batches are wider than
    input; batch_size stays small). A real implementation replaces the
    chunk split with a container demuxer loaded once in __init__
    (real_codec branch raises by contract)."""

    def __init__(self, frame_bytes: int = 4096, stride: int = 4, real_codec: bool = False):
        if real_codec:
            raise NotImplementedError(
                "no video demuxer in this environment; fixed-chunk frames only"
            )
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n_frames = max(1, (len(payload) + self.frame_bytes - 1) // self.frame_bytes)
            for fi in range(0, n_frames, self.stride):
                ids.append(mid)
                idxs.append(fi)
                frames.append(payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.large_binary()),
            }
        )


class Resizer:
    """Actor-pool stage: area-average 'image' downsampling. The payload is
    interpreted as a row-major uint8 matrix (h inferred from n_bytes and a
    declared width); output is a fixed (out_h x out_w) byte matrix. The
    RESIZE KERNEL is real vectorized numpy — only the image DECODE is the
    stub (real_codec raises; a real deployment decodes in __init__)."""

    def __init__(self, width: int = 64, out_h: int = 8, out_w: int = 8, real_codec: bool = False):
        if real_codec:
            raise NotImplementedError(
                "no image codecs in this environment; raw-matrix resize only"
            )
        self.width = width
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            w = self.width
            # ceil division: a trailing partial row participates (zero-padded)
            h = max(1, -(-len(payload) // w))
            buf = np.frombuffer(payload, dtype=np.uint8)
            if len(buf) < h * w:
                buf = np.concatenate([buf, np.zeros(h * w - len(buf), dtype=np.uint8)])
            img = buf.reshape(h, w)
            # area-average pooling to (out_h, out_w): integer bucket edges
            ys = np.linspace(0, h, self.out_h + 1).astype(np.int64)
            xs = np.linspace(0, w, self.out_w + 1).astype(np.int64)
            small = np.empty((self.out_h, self.out_w), dtype=np.uint8)
            csum = img.astype(np.int64).cumsum(0).cumsum(1)
            padded = np.zeros((h + 1, w + 1), dtype=np.int64)
            padded[1:, 1:] = csum
            for i in range(self.out_h):
                for j in range(self.out_w):
                    y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
                    x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
                    y1, x1 = min(y1, h), min(x1, w)
                    area = max(1, (y1 - y0) * (x1 - x0))
                    tot = (
                        padded[y1, x1] - padded[y0, x1] - padded[y1, x0] + padded[y0, x0]
                    )
                    small[i, j] = tot // area
            out.append(small.tobytes())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "thumb": pa.array(out, type=pa.large_binary()),
            }
        )


def sample_frames(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    """media -> sampled frame rows via the actor pool."""
    return media_table(sf_dir).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_thumbs(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    """media -> fixed-size thumbnails via the actor pool."""
    return media_table(sf_dir).map_batches(
        Resizer,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
        num_cpus=1,
    )
