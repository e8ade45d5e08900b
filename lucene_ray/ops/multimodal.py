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
