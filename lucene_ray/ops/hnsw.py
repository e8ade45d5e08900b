"""HNSW graph ANN over the ``embeddings`` table — the graph-based
counterpart to the LSH / IVF scale paths in ops/knn.py.

Reference spec (behavior, not code): the graph construction/search
semantics of lucene/core util/hnsw/HnswGraphBuilder.java:36 (insertion:
greedy descent from the entry point to the node's level, then
beam-search with efConstruction per level, diverse-neighbor selection)
and HnswGraphSearcher.java:40 (search: greedy upper levels, beam of
size ef at level 0); format shape of
codecs/lucene99/Lucene99HnswVectorsFormat.java:89 (per-SEGMENT graphs,
maxConn M on upper levels and 2M on level 0, searched independently and
merged by score).

Ray-Data-first layout: the corpus is split into contiguous vec_id
SHARDS (the analog of Lucene segments). Each shard's graph is built
independently inside one task — construction is inherently sequential
per graph, so the parallelism axis is across shards, exactly like
DWPT-per-segment builds — and persisted as Parquet
(vectors + per-level adjacency) under shard=<i>/ partitions with an
atomic-rename build, like the LSH/IVF indexes. Search broadcasts the
query block once (ray.put), fans out one task per shard, runs the
beam search per query against the in-RAM shard graph, and merges the
per-shard top-k on the driver (output-scale rows only). At 100 TB the
shard count grows, each graph stays worker-RAM-sized, build is
embarrassingly parallel, and query fan-out is a fixed k-row response
per shard — the same multi-segment contract Lucene ships.

Determinism: insertion order is vec_id order; the level of a node is a
pure function of vec_id (splitmix64 hash -> uniform -> geometric), so
two builds of the same corpus produce byte-identical graphs.
"""

from __future__ import annotations

import hashlib
import heapq
import json
import math
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_ray.ops.knn import (
    TOP_K,
    _CACHE_ROOT,
    _distributed_rank_merge,
    _embedding_matrix,
    _load_queries,
    _rank_merge,
)

HNSW_M = 16              # max connections, upper levels (level 0 gets 2M)
HNSW_EF_CONSTRUCTION = 100
HNSW_EF_SEARCH = 128     # gate operating point (rank-identical to brute
                         # force on the gate corpora — verified; the
                         # approximate low-ef operating points are pinned
                         # by tests/test_hnsw.py recall bounds)
# vectors per shard graph — a TEST-SCALE default sized to the sf corpora
# (shards must exceed the gate k); production scale is a parameter, not a
# redesign: Lucene's own per-segment graphs run ~1M vectors/segment, and
# every stage here (parallel shard builds, persisted adjacency, fan-out
# search + distributed top-k reduce) is shard-count-agnostic. Size shards
# to worker RAM (graph ~ n*(M*2+1)*8B + vectors) at deployment.
HNSW_SHARD_SIZE = 1024
HNSW_LEVEL_SEED = 0x9E3779B97F4A7C15
HNSW_MAX_LEVEL = 16


def _levels_for(vec_ids: np.ndarray, m: int = HNSW_M) -> np.ndarray:
    """Deterministic per-node level: splitmix64(vec_id) -> U(0,1) ->
    floor(-ln(U) / ln(M)) (the geometric distribution of the HNSW paper,
    HnswGraphBuilder.getRandomGraphLevel but seeded by identity, not a
    shared Random — so build order / task placement can never change the
    graph)."""
    z = (vec_ids.astype(np.uint64) + np.uint64(HNSW_LEVEL_SEED)).copy()
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    u = (z >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    u = np.maximum(u, 2.0 ** -53)
    lev = np.floor(-np.log(u) / math.log(m)).astype(np.int64)
    return np.minimum(lev, HNSW_MAX_LEVEL)


def _select_diverse(
    cand_ords: np.ndarray, cand_sims: np.ndarray, unit: np.ndarray, m: int
) -> list[int]:
    """Diverse-neighbor heuristic (HnswGraphBuilder.diversityCheck /
    the SELECT-NEIGHBORS-HEURISTIC of Malkov & Yashunin §4): walk the
    candidates best-first; keep c only if c is closer to the base than to
    every already-kept neighbor (sim(c, base) >= sim(c, kept) for all
    kept). Inputs pre-sorted by (sim desc, ord asc) for determinism."""
    kept: list[int] = []
    for o, s in zip(cand_ords.tolist(), cand_sims.tolist()):
        if len(kept) >= m:
            break
        if kept:
            inter = unit[kept] @ unit[o]
            if np.any(inter > s):
                continue
        kept.append(o)
    return kept


def _search_layer(
    qv: np.ndarray,
    eps: list[int],
    ef: int,
    adj: list[np.ndarray],
    unit: np.ndarray,
) -> list[tuple[float, int]]:
    """Beam search at one level (HnswGraphSearcher.searchLevel): returns
    up to ef (sim, ord) pairs, unordered (a min-heap's raw storage)."""
    visited = np.zeros(len(unit), dtype=bool)
    cand: list[tuple[float, int]] = []   # max-heap via negated sim
    res: list[tuple[float, int]] = []    # min-heap of size <= ef
    for ep in eps:
        if visited[ep]:
            continue
        visited[ep] = True
        s = float(unit[ep] @ qv)
        heapq.heappush(cand, (-s, ep))
        heapq.heappush(res, (s, ep))
    while cand:
        neg, c = heapq.heappop(cand)
        if len(res) >= ef and -neg < res[0][0]:
            break
        nbrs = adj[c]
        fresh = nbrs[~visited[nbrs]]
        if len(fresh) == 0:
            continue
        visited[fresh] = True
        sims = unit[fresh] @ qv
        floor = res[0][0] if len(res) >= ef else -np.inf
        for s, o in zip(sims.tolist(), fresh.tolist()):
            if len(res) < ef or s > floor:
                heapq.heappush(cand, (-s, o))
                heapq.heappush(res, (s, o))
                if len(res) > ef:
                    heapq.heappop(res)
                floor = res[0][0] if len(res) >= ef else -np.inf
    return res


class _ShardGraph:
    """One shard's in-RAM graph: per-level adjacency as ragged
    list-of-int32-arrays, unit-normalized vectors, entry point."""

    def __init__(self, ids: np.ndarray, mat: np.ndarray):
        self.ids = ids
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.norms = norms[:, 0].copy()
        self.norms[self.norms == 0] = 1.0
        self.unit = mat / np.maximum(norms, 1e-12)
        self.levels = _levels_for(ids)
        n = len(ids)
        # adj[level][ord] -> int32 neighbor ords; level list grows lazily
        self.adj: list[list[np.ndarray]] = []
        self.entry = -1
        self.max_level = -1
        for i in range(n):
            self._insert(i)

    def _ensure_level(self, lev: int) -> None:
        n = len(self.ids)
        while len(self.adj) <= lev:
            self.adj.append([np.empty(0, dtype=np.int32) for _ in range(n)])

    def _insert(self, i: int) -> None:
        l_i = int(self.levels[i])
        self._ensure_level(l_i)
        if self.entry < 0:
            self.entry, self.max_level = i, l_i
            return
        qv = self.unit[i]
        eps = [self.entry]
        # greedy descent above the node's top level (ef=1)
        for lev in range(self.max_level, l_i, -1):
            res = _search_layer(qv, eps, 1, self.adj[lev], self.unit)
            eps = [max(res)[1]] if res else eps
        for lev in range(min(l_i, self.max_level), -1, -1):
            res = _search_layer(
                qv, eps, HNSW_EF_CONSTRUCTION, self.adj[lev], self.unit
            )
            sims = np.array([s for s, _ in res])
            ords = np.array([o for _, o in res], dtype=np.int64)
            order = np.lexsort((ords, -sims))
            m_max = HNSW_M * 2 if lev == 0 else HNSW_M
            # the inserted node also gets up to m_max (2M on level 0)
            # forward links, like the reference (ADVICE r3: HNSW_M here
            # halved level-0 connectivity)
            sel = _select_diverse(ords[order], sims[order], self.unit, m_max)
            self.adj[lev][i] = np.array(sel, dtype=np.int32)
            for nb in sel:
                cur = self.adj[lev][nb]
                if i in cur:
                    continue
                merged = np.append(cur, np.int32(i))
                if len(merged) > m_max:
                    ms = self.unit[merged] @ self.unit[nb]
                    o2 = np.lexsort((merged, -ms))
                    keep = _select_diverse(
                        merged[o2], ms[o2], self.unit, m_max
                    )
                    merged = np.array(keep, dtype=np.int32)
                self.adj[lev][nb] = merged
            eps = ords.tolist()
        if l_i > self.max_level:
            self.entry, self.max_level = i, l_i

    # ---- persistence -------------------------------------------------
    def to_tables(self) -> tuple[pa.Table, pa.Table, dict]:
        rows_lev, rows_node, rows_nbrs = [], [], []
        for lev, layer in enumerate(self.adj):
            for node, nbrs in enumerate(layer):
                if len(nbrs) or lev <= self.levels[node]:
                    rows_lev.append(lev)
                    rows_node.append(node)
                    rows_nbrs.append(nbrs)
        graph = pa.table(
            {
                "level": pa.array(rows_lev, type=pa.int32()),
                "node": pa.array(rows_node, type=pa.int32()),
                "neighbors": pa.array(
                    [n.tolist() for n in rows_nbrs],
                    type=pa.list_(pa.int32()),
                ),
            }
        )
        vectors = pa.table(
            {
                "ord": pa.array(np.arange(len(self.ids), dtype=np.int32)),
                "vec_id": pa.array(self.ids, type=pa.int64()),
                "embedding": pa.array(
                    (self.unit * self.norms[:, None]).tolist(),
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        meta = {"entry": int(self.entry), "max_level": int(self.max_level)}
        return graph, vectors, meta

    @classmethod
    def load(cls, shard_dir: str) -> "_ShardGraph":
        import pyarrow.parquet as pq

        g = cls.__new__(cls)
        vt = pq.read_table(os.path.join(shard_dir, "vectors.parquet"))
        g.ids = vt.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _embedding_matrix(vt.column("embedding"))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        g.norms = norms[:, 0].copy()
        g.norms[g.norms == 0] = 1.0
        g.unit = mat / np.maximum(norms, 1e-12)
        g.levels = _levels_for(g.ids)
        gt = pq.read_table(os.path.join(shard_dir, "graph.parquet"))
        meta = json.load(open(os.path.join(shard_dir, "meta.json")))
        g.entry, g.max_level = meta["entry"], meta["max_level"]
        n = len(g.ids)
        g.adj = [
            [np.empty(0, dtype=np.int32) for _ in range(n)]
            for _ in range(g.max_level + 1)
        ]
        levs = gt.column("level").to_numpy(zero_copy_only=False)
        nodes = gt.column("node").to_numpy(zero_copy_only=False)
        nbrs = gt.column("neighbors").combine_chunks()
        flat = nbrs.flatten().to_numpy(zero_copy_only=False)
        offs = nbrs.offsets.to_numpy(zero_copy_only=False)
        for r in range(len(levs)):
            g.adj[levs[r]][nodes[r]] = flat[offs[r]:offs[r + 1]].astype(
                np.int32
            )
        return g

    def search(self, qv: np.ndarray, k: int, ef: int) -> tuple[np.ndarray, np.ndarray]:
        """(vec_ids, sims) of the local top-k by cosine, ties vec_id asc."""
        if self.entry < 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        qn = np.linalg.norm(qv)
        qu = qv / (qn if qn > 0 else 1.0)
        eps = [self.entry]
        for lev in range(self.max_level, 0, -1):
            res = _search_layer(qu, eps, 1, self.adj[lev], self.unit)
            eps = [max(res)[1]] if res else eps
        res = _search_layer(qu, eps, max(ef, k), self.adj[0], self.unit)
        sims = np.array([s for s, _ in res])
        ords = np.array([o for _, o in res], dtype=np.int64)
        ids = self.ids[ords]
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]


def _shard_specs(sf_dir: str, shard_size: int) -> list[dict]:
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    return [
        {"shard": i, "lo": lo, "hi": min(lo + shard_size, n)}
        for i, lo in enumerate(range(0, n, shard_size))
    ]


def build_hnsw_index(
    sf_dir: str,
    index_dir: str | None = None,
    shard_size: int = HNSW_SHARD_SIZE,
) -> str:
    """Build-once sharded HNSW index: one graph per contiguous vec_id
    range, built in parallel tasks (construction is sequential per graph
    — the Lucene per-segment model), persisted as
    shard=<i>/{vectors,graph}.parquet + meta.json with the same
    atomic-rename/_DONE-marker resumability as the LSH/IVF builds."""
    if index_dir is None:
        index_dir = os.path.join(
            _CACHE_ROOT,
            "hnsw_index_"
            + hashlib.sha1(f"{sf_dir}|{shard_size}|g2".encode()).hexdigest()[:12],
        )
    marker = os.path.join(index_dir, "_HNSW_DONE")
    if os.path.exists(marker):
        return index_dir
    tmp_dir = index_dir + ".build"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    specs = _shard_specs(sf_dir, shard_size)

    def build_shard(batch: dict) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for shard, lo, hi in zip(
            batch["shard"].tolist(), batch["lo"].tolist(), batch["hi"].tolist()
        ):
            t = pq.read_table(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
                filters=[("vec_id", ">=", lo), ("vec_id", "<", hi)],
            )
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            order = np.argsort(ids)
            ids = ids[order]
            mat = _embedding_matrix(
                t.column("embedding").combine_chunks().take(pa.array(order))
            )
            g = _ShardGraph(ids, mat)
            graph, vectors, meta = g.to_tables()
            d = os.path.join(tmp_dir, f"shard={shard}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(vectors, os.path.join(d, "vectors.parquet"))
            pq.write_table(graph, os.path.join(d, "graph.parquet"))
            with open(os.path.join(d, "meta.json"), "w") as f:
                json.dump(meta, f)
            out.append(shard)
        return pa.table({"shard": pa.array(out, type=pa.int64())})

    (
        ray.data.from_items(specs)
        .map_batches(build_shard, batch_format="numpy", batch_size=1)
        .materialize()
    )
    with open(os.path.join(tmp_dir, "_HNSW_DONE"), "w") as f:
        f.write("ok")
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return index_dir


def knn_hnsw(
    sf_dir: str, k: int = TOP_K, ef: int = HNSW_EF_SEARCH
) -> "ray.data.Dataset":
    """(query_id, rank, vec_id): ANN top-k through the sharded HNSW index.
    One task per shard loads its graph, beam-searches every query
    (broadcast once via ray.put), emits its local top-k; the driver merges
    output-scale rows only — the multi-segment search contract of
    Lucene99HnswVectorsFormat. At the gate operating point (ef=128 on the
    gate corpora) the result is rank-identical to brute force, so the SQL
    oracle applies; approximate low-ef recall is pinned in
    tests/test_hnsw.py."""
    import pandas as pd

    q_ids, q_mat = _load_queries(sf_dir)
    if len(q_ids) == 0:
        return _rank_merge(pd.DataFrame(), k)
    ix = build_hnsw_index(sf_dir)
    shards = sorted(
        d for d in os.listdir(ix) if d.startswith("shard=")
    )
    q_ref = ray.put((q_ids, q_mat))

    def search_shard(batch: dict) -> pa.Table:
        qi, qm = ray.get(q_ref)
        out_q, out_v, out_s = [], [], []
        for d in batch["dir"].tolist():
            g = _ShardGraph.load(d)
            for r in range(len(qi)):
                ids, sims = g.search(qm[r], k, ef)
                out_q.append(np.full(len(ids), qi[r], dtype=np.int64))
                out_v.append(ids)
                out_s.append(sims)
        if not out_q:
            out_q = [np.empty(0, dtype=np.int64)]
            out_v = [np.empty(0, dtype=np.int64)]
            out_s = [np.empty(0)]
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    cands = ray.data.from_items(
        [{"dir": os.path.join(ix, s)} for s in shards]
    ).map_batches(search_shard, batch_format="numpy", batch_size=1)
    # distributed per-query reduce: the driver holds Q*k rows, never the
    # O(n_shards * Q * k) per-shard candidate stream (TopDocs.java:90-130
    # per-leaf top-k + merge)
    return _distributed_rank_merge(cands, k)
