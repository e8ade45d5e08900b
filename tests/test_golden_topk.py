"""Rank-identity golden test (FIXTURES.md §4 / CheckHits semantics).

The golden file pins the flagship reference-query results (docids + float32
scores) produced by the exhaustive oracle on the deterministic 1000-doc
corpus. Any change to tokenization, docid assignment, stats, BM25 float
math, tie-breaks, merging, or pruning that alters the top-k breaks this
test. Regenerate ONLY with a deliberate format bump:

    python -m tests.test_golden_topk   # rewrites tests/data/golden_topk.json
"""

import json
import os

import numpy as np

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "golden_topk.json")


def compute_topk(pruned: bool):
    from lucene_ray.pipelines.flagship import REFERENCE_QUERIES, flagship_index
    from lucene_ray.search.engine import IndexSearcher

    ix = flagship_index(n_docs=1000)
    s = IndexSearcher(ix, pruned=pruned)
    out = {}
    for qid, q, k in REFERENCE_QUERIES:
        td = s.search(q, k)
        out[str(qid)] = {
            "query": q,
            "k": k,
            "docids": [int(d) for d in td.docids],
            "scores": [float(np.float32(x)) for x in td.scores],
        }
    return out


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.usefixtures("ray_session")
def test_rank_identity_exhaustive(golden):
    got = compute_topk(pruned=False)
    for qid, want in golden.items():
        assert got[qid]["docids"] == want["docids"], (qid, want["query"])
        np.testing.assert_allclose(
            got[qid]["scores"], want["scores"], rtol=1e-6, atol=0,
            err_msg=f"qid={qid} {want['query']!r}",
        )


@pytest.mark.usefixtures("ray_session")
def test_rank_identity_pruned(golden):
    got = compute_topk(pruned=True)
    for qid, want in golden.items():
        assert got[qid]["docids"] == want["docids"], (qid, want["query"])
        np.testing.assert_allclose(
            got[qid]["scores"], want["scores"], rtol=1e-6, atol=0,
            err_msg=f"qid={qid} {want['query']!r}",
        )


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    data = compute_topk(pruned=False)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {GOLDEN_PATH}: {sum(len(v['docids']) for v in data.values())} hits")
    ray.shutdown()
