"""Scalar-quantized (int7) vector index + re-ranked kNN.

Spec (reference, public Apache-2.0 algorithm):
- `lucene/core/.../util/quantization/ScalarQuantizer.java:89-148` —
  quantile-clipped linear quantization ``byte = round((clip(v) - minQ) *
  (2^bits - 1) / (maxQ - minQ))`` with a per-vector corrective offset
  ``sum(minQ * (v - minQ/2) + (dx - dxq) * dxq)`` that makes the quantized
  dot product an unbiased estimate of the float dot product.
- `ScalarQuantizedVectorSimilarity.java:70-88` (DotProduct) — score =
  ``int_dot * alpha^2 + query_corr + vector_corr`` (alpha = (maxQ-minQ)/
  (2^bits - 1)); cosine is dot over pre-normalized vectors.
- `Lucene99ScalarQuantizedVectorsFormat.java:107` — default confidence
  interval ``max(0.9, 1 - 1/(dim+1))``; 7-bit quantization (bytes in
  [0, 127]) like the format's default.
- `ScalarQuantizer.java:74` — quantiles from a sample capped at 25_000
  vectors.

Ray-Data shape (original implementation, not a port): the quantizer params
come from one bounded sample read; the build is a streaming ``map_batches``
that writes a partitioned int8 Parquet sidecar of
``(vec_id, qvec list<int8>, corr float64)`` — 4x smaller at rest than
float32, 8x than float64, so the full-corpus scan at query time moves 4-8x
fewer bytes through the object store. Search estimates scores with an
int32 matmul per batch, keeps a local oversampled top-R, reduces to Q*R
rows via a distributed groupby(query_id), then re-ranks ONLY those R<<N
candidates with one pruned exact read of the float table — the 100-TB pattern: the
quantized sidecar is the only full scan.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_ray.ops.knn import (
    N_QUERIES,
    TOP_K,
    _CACHE_ROOT,
    _distributed_rank_merge,
    _embedding_matrix,
    _load_queries,
    _local_topk_rows,
)

QUANT_BITS = 7  # Lucene99ScalarQuantizedVectorsFormat default (int7)
SAMPLE_CAP = 25_000  # ScalarQuantizer.SCALAR_QUANTIZATION_SAMPLE_SIZE


def default_confidence_interval(dim: int) -> float:
    """Lucene99ScalarQuantizedVectorsFormat.calculateDefaultConfidenceInterval."""
    return max(0.9, 1.0 - 1.0 / (dim + 1))


class ScalarQuantizer:
    """Vectorized twin of ScalarQuantizer.java:89-148 (float64 math; the
    estimate is only used to RANK candidates before an exact re-rank, so
    float32-vs-float64 rounding differences are immaterial)."""

    def __init__(self, min_q: float, max_q: float, bits: int = QUANT_BITS):
        if not (np.isfinite(min_q) and np.isfinite(max_q) and max_q >= min_q):
            raise ValueError(f"bad quantiles: [{min_q}, {max_q}]")
        self.min_q = float(min_q)
        self.max_q = float(max_q)
        self.bits = int(bits)
        divisor = float((1 << bits) - 1)
        rng = self.max_q - self.min_q
        self.scale = divisor / rng if rng > 0 else 0.0
        self.alpha = rng / divisor

    @classmethod
    def from_sample(cls, mat: np.ndarray, confidence_interval: float | None = None,
                    bits: int = QUANT_BITS) -> "ScalarQuantizer":
        """Quantiles over all components of a (bounded) vector sample —
        ScalarQuantizer.fromVectors with the sample already gathered."""
        ci = confidence_interval
        if ci is None:
            ci = default_confidence_interval(mat.shape[1])
        flat = np.sort(mat.ravel())
        tail = (1.0 - ci) / 2.0
        lo_i = int(tail * (len(flat) - 1))
        hi_i = int(np.ceil((1.0 - tail) * (len(flat) - 1)))
        return cls(float(flat[lo_i]), float(flat[hi_i]), bits)

    def quantize(self, mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(n, d) float64 -> ((n, d) uint8 in [0, 2^bits-1], (n,) float64
        corrective offsets). ScalarQuantizer.quantizeFloat vectorized."""
        dx = mat - self.min_q
        dxc = np.clip(mat, self.min_q, self.max_q) - self.min_q
        dxs = self.scale * dxc
        q = np.rint(dxs)
        dxq = q * self.alpha
        corr = (self.min_q * (mat - self.min_q / 2.0) + (dx - dxq) * dxq).sum(axis=1)
        return q.astype(np.uint8), corr

    def meta(self) -> dict:
        return {"min_q": self.min_q, "max_q": self.max_q, "bits": self.bits}


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def build_quant_index(sf_dir: str, index_dir: str | None = None) -> str:
    """Build (or reuse) the quantized sidecar for ``sf_dir``'s embeddings.

    One bounded sample read fixes the quantizer; the corpus itself streams
    through ``map_batches`` (never materialized). Deterministic: params are
    a pure function of the sorted sample, output partition files are a pure
    function of input row order. Resume = directory-exists check on the
    atomically renamed final dir."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "embeddings.parquet")
    if index_dir is None:
        index_dir = os.path.join(
            _CACHE_ROOT,
            "quant_" + hashlib.sha1(src.encode()).hexdigest()[:12],
        )
    meta_path = os.path.join(index_dir, "quantizer.json")
    if os.path.exists(meta_path):
        return index_dir

    # bounded sample read for the quantiles (first row groups up to the cap;
    # deterministic — file order, not execution order)
    f = pq.ParquetFile(src)
    batches = []
    seen = 0
    for b in f.iter_batches(batch_size=8192, columns=["embedding"]):
        batches.append(b)
        seen += b.num_rows
        if seen >= SAMPLE_CAP:
            break
    sample = _embedding_matrix(
        pa.Table.from_batches(batches, schema=pa.schema([f.schema_arrow.field("embedding")]))
        .column("embedding")
    )[:SAMPLE_CAP]
    sq = ScalarQuantizer.from_sample(_normalize(sample))

    tmp = index_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    min_q, max_q, bits = sq.min_q, sq.max_q, sq.bits

    def quantize_batch(batch: pa.Table) -> pa.Table:
        q = ScalarQuantizer(min_q, max_q, bits)
        mat = _normalize(_embedding_matrix(batch.column("embedding")))
        qv, corr = q.quantize(mat)
        d = qv.shape[1] if qv.size else 0
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "qvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(qv.ravel(), type=pa.uint8()), d
                ),
                "corr": pa.array(corr, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    ds.map_batches(quantize_batch, batch_format="pyarrow", batch_size=8192).write_parquet(tmp)
    with open(os.path.join(tmp, "quantizer.json"), "w") as fh:
        json.dump(sq.meta(), fh)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)
    return index_dir


def _quant_files(index_dir: str) -> list[str]:
    return sorted(
        os.path.join(index_dir, f)
        for f in os.listdir(index_dir)
        if f.endswith(".parquet")
    )


def knn_quantized(
    sf_dir: str, k: int = TOP_K, oversample: int = 8
) -> pa.Table:
    """(query_id, rank, vec_id): cosine top-k via the int7 quantized scan +
    exact re-rank of the oversampled candidates. Rank-identical to brute
    force whenever the candidate set covers the true top-k (it does at the
    gate's oversample on all gate corpora — verified; approximate recall at
    low oversample is pinned in tests/test_quant.py)."""
    import pyarrow.parquet as pq

    index_dir = build_quant_index(sf_dir)
    with open(os.path.join(index_dir, "quantizer.json")) as fh:
        m = json.load(fh)
    sq = ScalarQuantizer(m["min_q"], m["max_q"], m["bits"])

    q_ids, q_mat = _load_queries(sf_dir)
    qq, qcorr = sq.quantize(_normalize(q_mat))
    q_ref = ray.put((q_ids, qq.astype(np.int32), qcorr))
    alpha2 = sq.alpha * sq.alpha
    r = max(k * oversample, k)

    def local_topr(batch: pa.Table) -> pa.Table:
        qi, qm, qc = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        qv = batch.column("qvec")
        if isinstance(qv, pa.ChunkedArray):
            qv = qv.combine_chunks()
        d = qv.type.list_size
        vm = qv.flatten().to_numpy(zero_copy_only=False).astype(np.int32).reshape(len(ids), d)
        vc = batch.column("corr").to_numpy(zero_copy_only=False)
        # ScalarQuantizedVectorSimilarity.DotProduct.score:85
        est = (qm @ vm.T) * alpha2 + qc[:, None] + vc[None, :]
        rr = min(r, est.shape[1])
        out_q, out_v, out_s = _local_topk_rows(qi, ids, est, rr)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "est": pa.array(out_s, type=pa.float64()),
            }
        )

    cand_ds = ray.data.read_parquet(_quant_files(index_dir)).map_batches(
        local_topr, batch_format="pyarrow", batch_size=8192
    )
    # distributed top-R per query (groupby reduce — the driver holds Q*R
    # rows, never the per-block candidate stream), then ONE pruned exact
    # read of just those candidates' float vectors for the re-rank
    topr = _distributed_rank_merge(cand_ds, r, score_col="est").to_pandas()
    keep: dict[int, np.ndarray] = {
        int(qid): g.sort_values("rank").vec_id.to_numpy()
        for qid, g in topr.groupby("query_id")
    }
    all_ids = np.unique(np.concatenate(list(keep.values()))) if keep else np.array([], np.int64)

    src = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(
        src, columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", all_ids.tolist())],
    )
    cand_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    cand_mat = _normalize(_embedding_matrix(t.column("embedding")))
    pos = {int(v): i for i, v in enumerate(cand_ids)}

    qn = _normalize(q_mat)
    rows_q, rows_r, rows_v = [], [], []
    for i, qid in enumerate(q_ids):
        vids = keep.get(int(qid), np.array([], np.int64))
        idx = np.array([pos[int(v)] for v in vids], dtype=np.int64)
        sims = cand_mat[idx] @ qn[i]
        order = np.lexsort((vids, -sims))[:k]
        rows_q.extend([int(qid)] * len(order))
        rows_r.extend(range(len(order)))
        rows_v.extend(vids[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows_q, type=pa.int64()),
            "rank": pa.array(rows_r, type=pa.int32()),
            "vec_id": pa.array(rows_v, type=pa.int64()),
        }
    )
