"""HNSW graph ANN (ops/hnsw.py): gate-exactness, approximate recall
bounds, build determinism, multi-shard merge, and crash-resume safety."""

import os
import shutil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return set(map(tuple, df[["query_id", "vec_id"]].values))


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_ray.ops import hnsw

    ix = hnsw.build_hnsw_index(SF)
    return ix


def test_gate_ef_matches_bruteforce(ray_session, built):
    from lucene_ray.ops import hnsw, knn

    bf = knn.knn_bruteforce(SF).to_pandas()
    h = hnsw.knn_hnsw(SF).to_pandas()
    assert bf.equals(h)


def test_low_ef_recall_bound(ray_session, built):
    from lucene_ray.ops import hnsw, knn

    bf = _pairs(knn.knn_bruteforce(SF).to_pandas())
    h16 = _pairs(hnsw.knn_hnsw(SF, ef=16).to_pandas())
    recall = len(bf & h16) / len(bf)
    assert recall >= 0.9, recall


def test_build_determinism(ray_session, tmp_path):
    """Two independent builds of the same shard produce identical graphs
    (levels are a pure function of vec_id; insertion order is vec_id
    order — HnswGraphBuilder's shared-Random nondeterminism removed by
    design)."""
    import pyarrow.parquet as pq

    from lucene_ray.ops import hnsw

    a = hnsw.build_hnsw_index(SF, index_dir=str(tmp_path / "a"))
    b = hnsw.build_hnsw_index(SF, index_dir=str(tmp_path / "b"))
    for shard in sorted(os.listdir(a)):
        if not shard.startswith("shard="):
            continue
        ga = pq.read_table(os.path.join(a, shard, "graph.parquet"))
        gb = pq.read_table(os.path.join(b, shard, "graph.parquet"))
        assert ga.equals(gb)


def test_multi_shard_merge(ray_session, tmp_path):
    """A deliberately tiny shard size forces >1 graph; the fan-out merge
    must still equal brute force at the gate ef (the multi-segment search
    contract of Lucene99HnswVectorsFormat)."""
    from lucene_ray.ops import hnsw, knn

    ix = hnsw.build_hnsw_index(SF, index_dir=str(tmp_path / "small"), shard_size=128)
    shards = [d for d in os.listdir(ix) if d.startswith("shard=")]
    assert len(shards) >= 3

    import ray

    # route knn_hnsw through the small-shard index by pointing the cache
    # dir at it: easiest is a direct search over this index via the same
    # internals knn_hnsw uses
    q_ids, q_mat = hnsw._load_queries(SF)
    got = {}
    for d in sorted(shards):
        g = hnsw._ShardGraph.load(os.path.join(ix, d))
        for r in range(len(q_ids)):
            ids, sims = g.search(q_mat[r], 10, hnsw.HNSW_EF_SEARCH)
            got.setdefault(int(q_ids[r]), []).extend(zip(sims.tolist(), ids.tolist()))
    bf = knn.knn_bruteforce(SF).to_pandas()
    for qid, cand in got.items():
        arr = np.array(cand)
        order = np.lexsort((arr[:, 1], -arr[:, 0]))[:10]
        want = bf[bf.query_id == qid].sort_values("rank").vec_id.to_numpy()
        assert np.array_equal(arr[order, 1].astype(np.int64), want)


def test_stale_partial_build_discarded(ray_session, tmp_path):
    """A crashed build's .build dir must not leak rows into a rerun."""
    from lucene_ray.ops import hnsw

    ix_dir = str(tmp_path / "resume")
    stale = ix_dir + ".build"
    os.makedirs(os.path.join(stale, "shard=0"), exist_ok=True)
    with open(os.path.join(stale, "shard=0", "vectors.parquet"), "w") as f:
        f.write("garbage")
    ix = hnsw.build_hnsw_index(SF, index_dir=ix_dir)
    assert os.path.exists(os.path.join(ix, "_HNSW_DONE"))
    assert not os.path.exists(stale)
    g = hnsw._ShardGraph.load(os.path.join(ix, "shard=0"))
    assert len(g.ids) == 500


def test_levels_deterministic_function():
    from lucene_ray.ops import hnsw

    ids = np.arange(10000, dtype=np.int64)
    a = hnsw._levels_for(ids)
    b = hnsw._levels_for(ids)
    assert np.array_equal(a, b)
    # geometric-ish decay: level 0 dominates, some nodes above level 0
    assert (a == 0).mean() > 0.8
    assert (a > 0).any()
    assert a.max() <= hnsw.HNSW_MAX_LEVEL
