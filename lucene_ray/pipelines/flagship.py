"""The flagship pipeline: synthetic source-code corpus -> inverted-index
build -> TieredMergePolicy merge -> BM25 top-k for the reference query set.

This is the end-to-end path the north star names: read_parquet ->
map_batches(tokenize+segment build) -> manifest commit -> merge actors ->
scorer actor pool over a query Dataset -> deterministic top-k reduce.
"""

from __future__ import annotations

import hashlib
import os

from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.merge import TieredMergePolicy, maybe_merge

# The reference query set (FIXTURES.md §2): single hot + rare terms,
# disjunctions, conjunctions, negations, phrases, case variants, absent
# terms, and k in {1, 10, 100}.
REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (0, "getmanager", 10),
    (1, "get", 10),                       # hot term
    (2, "readSpec", 10),                  # case variant -> read spec
    (3, "merge flush index", 10),         # OR
    (4, "parse AND block AND stream", 10),
    (5, "+index -merge token", 10),
    (6, '"get manager"', 10),             # phrase
    (7, "zzzabsent", 10),                 # empty
    (8, "sort", 1),                       # k=1 prunes hardest
    (9, "buffer codec norm", 100),        # k=100
    (10, "write_Stream", 10),             # snake+case mix
    (11, "read 500", 10),                 # digit split term
    (12, "merge^2 flush", 10),            # boosted term
    (13, "read*", 10),                    # prefix rewrite
    (14, "mrege~2", 10),                  # fuzzy rewrite
    (15, "bu?fer", 10),                   # wildcard rewrite
]


def flagship_corpus(n_docs: int = 1000, n_shards: int = 4, seed: int = 42) -> list[str]:
    d = os.path.join(
        "/tmp/lucene_ray_cache",
        f"corpus_n{n_docs}_s{n_shards}_seed{seed}",
    )
    return write_corpus(d, n_docs=n_docs, n_shards=n_shards, seed=seed, row_group_size=2048)


def flagship_index(n_docs: int = 1000, target_docs: int = 8192, seed: int = 42) -> str:
    paths = flagship_corpus(n_docs=n_docs, seed=seed)
    key = hashlib.sha1(f"{n_docs}:{target_docs}:{seed}".encode()).hexdigest()[:12]
    ix = os.path.join("/tmp/lucene_ray_cache", f"flagship_index_{key}")
    build_index(paths, ix, target_docs=target_docs)
    maybe_merge(ix, TieredMergePolicy())
    return ix


def run_flagship(n_docs: int = 1000, pruned: bool = True):
    """Build (cached/resumable) and run the reference query set through the
    scorer actor pool. Returns a pandas DataFrame (qid, rank, docid, score)."""
    import ray.data

    from lucene_ray.search.engine import search_queries_dataset

    ix = flagship_index(n_docs=n_docs)
    qds = ray.data.from_items(
        [{"qid": qid, "query": q, "k": k} for qid, q, k in REFERENCE_QUERIES]
    )
    out = search_queries_dataset(qds, ix, concurrency=2, pruned=pruned)
    return out.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
