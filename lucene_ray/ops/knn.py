"""Similarity search over the ``embeddings`` table (list<float> column).

- knn_bruteforce: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix (ray.put once, ray.get per actor/batch); per-batch
  LOCAL top-k then one tiny driver-side merge. The only data movement is the
  (n_batches x n_queries x k) candidate rows.
- knn_lsh: the scale path — random-hyperplane LSH bucketing; queries only
  scan rows sharing a bucket (multi-probe over H tables). Approximate;
  tested for recall against brute force, no SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

N_QUERIES = 5  # queries = embeddings with vec_id < N_QUERIES (deterministic)
TOP_K = 10
# the synthetic embeddings are near-orthogonal (top-10 neighbor cosine
# ~0.35-0.5): 5 planes x 16 tables gives ~0.8 expected recall at ~40% of the
# rows scanned; tighter (8x8) collapses recall to ~0.4 on this distribution
LSH_PLANES = 5
LSH_TABLES = 16


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    sel = ids < N_QUERIES
    q_ids = ids[sel]
    mat = np.stack([t.column("embedding")[int(i)].as_py() for i in np.nonzero(sel)[0]]).astype(
        np.float64
    )
    order = np.argsort(q_ids)
    return q_ids[order], mat[order]


def knn_bruteforce(sf_dir: str, k: int = TOP_K) -> "ray.data.Dataset":
    """(query_id, rank, vec_id): exact cosine top-k, ties by vec_id asc."""
    q_ids, q_mat = _load_queries(sf_dir)
    qn = np.linalg.norm(q_mat, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put((q_ids, q_mat, qn))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qm, qnorm = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        sims = (qm @ mat.T) / (qnorm[:, None] * n[None, :])
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for r in range(len(qi)):
            order = np.lexsort((ids, -sims[r]))[:kk]
            out_q.append(np.full(kk, qi[r], dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(sims[r][order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    # final merge: tiny (n_batches * n_queries * k rows) -> driver
    pdf = cands.to_pandas()
    rows = {"query_id": [], "rank": [], "vec_id": []}
    for qid in np.sort(pdf.query_id.unique()):
        g = pdf[pdf.query_id == qid]
        order = np.lexsort((g.vec_id.to_numpy(), -g.sim.to_numpy()))[:k]
        rows["query_id"].extend([int(qid)] * len(order))
        rows["rank"].extend(range(len(order)))
        rows["vec_id"].extend(g.vec_id.to_numpy()[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
        }
    )


def knn_bruteforce_sql(k: int = TOP_K) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS sim
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) - 1 AS rank
  FROM scored
)
SELECT query_id, rank::INTEGER AS rank, vec_id FROM ranked WHERE rank < {k}
"""


def knn_lsh(sf_dir: str, k: int = TOP_K) -> "ray.data.Dataset":
    """Approximate top-k via random-hyperplane LSH: vectors bucket by the
    sign pattern of LSH_PLANES projections, per LSH_TABLES independent
    tables; each query scans only its buckets' rows. Returns the same
    (query_id, rank, vec_id) shape; recall tested vs brute force."""
    q_ids, q_mat = _load_queries(sf_dir)
    rng = np.random.default_rng(424242)  # fixed planes — index determinism
    dim = q_mat.shape[1]
    planes = rng.standard_normal((LSH_TABLES, LSH_PLANES, dim))
    q_buckets = np.stack(
        [((q_mat @ planes[t].T) > 0) @ (1 << np.arange(LSH_PLANES)) for t in range(LSH_TABLES)],
        axis=1,
    )  # (n_q, tables)
    qn = np.linalg.norm(q_mat, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((q_ids, q_mat, qn, planes, q_buckets))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local(batch: pa.Table) -> pa.Table:
        qi, qm, qnorm, pl, qb = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mat = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        out_q, out_v, out_s = [], [], []
        # bucket signatures for this batch, all tables at once
        sigs = np.stack(
            [((mat @ pl[t].T) > 0) @ (1 << np.arange(LSH_PLANES)) for t in range(len(pl))],
            axis=1,
        )
        for r in range(len(qi)):
            hit = (sigs == qb[r]).any(axis=1)
            if not hit.any():
                continue
            sims = (mat[hit] @ qm[r]) / (n[hit] * qnorm[r])
            sel_ids = ids[hit]
            kk = min(k, len(sel_ids))
            order = np.lexsort((sel_ids, -sims))[:kk]
            out_q.append(np.full(kk, qi[r], dtype=np.int64))
            out_v.append(sel_ids[order])
            out_s.append(sims[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    pdf = ds.map_batches(local, batch_format="pyarrow", batch_size=4096).to_pandas()
    rows = {"query_id": [], "rank": [], "vec_id": []}
    for qid in np.sort(pdf.query_id.unique()) if len(pdf) else []:
        g = pdf[pdf.query_id == qid]
        order = np.lexsort((g.vec_id.to_numpy(), -g.sim.to_numpy()))[:k]
        rows["query_id"].extend([int(qid)] * len(order))
        rows["rank"].extend(range(len(order)))
        rows["vec_id"].extend(g.vec_id.to_numpy()[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
        }
    )
