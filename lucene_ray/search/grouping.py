"""Grouped top-k search — the reference ``grouping/`` module's two-pass
shape (FirstPassGroupingCollector selects the top groups, TopGroupsCollector
collects the top docs within each; ``grouping/src/java/org/apache/lucene/
search/grouping/FirstPassGroupingCollector.java``,
``TopGroupsCollector.java``).

Divergence (documented): group selection orders by (hit count desc, group
value asc) and within-group docs by a numeric doc-values field (desc or
asc, docid tie-break) instead of the reference's default relevance sort —
both orderings are float-free, so the whole result is exactly
SQL-checkable; relevance-ordered grouping would inherit the quantized-norm
float32 scores that are deliberately engine-owned (see bm25docs module
docstring).

Collection is exhaustive over the matching doc set (as in the reference:
grouping collectors see every hit), then one stored-fields gather for the
group keys and one doc-values gather for the sort keys — O(matches) work,
no full-corpus materialization.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.search.engine import fetch_doc_values, fetch_stored


class GroupDocs:
    """One group's slice of the result (grouping/GroupDocs.java shape)."""

    __slots__ = ("group_value", "group_rank", "hit_count", "docids", "values")

    def __init__(self, group_value, group_rank, hit_count, docids, values):
        self.group_value = group_value
        self.group_rank = group_rank
        self.hit_count = hit_count
        self.docids = docids
        self.values = values


def group_topk(
    searcher,
    query,
    group_field: str,
    sort_field: str,
    k_groups: int = 3,
    k_per_group: int = 2,
    ascending: bool = False,
) -> list[GroupDocs]:
    """Top ``k_groups`` groups of ``group_field`` over the docs matching
    ``query`` — groups ranked by (hit count desc, value asc), docs within a
    group by the ``sort_field`` doc value (desc unless ``ascending``),
    docid-asc tie-break, ``k_per_group`` docs each."""
    td = searcher.search(query, k=1 << 62)
    if len(td.docids) == 0:
        return []
    stored = fetch_stored(searcher.reader, td.docids)
    groups = np.asarray(stored.column(group_field).to_pylist(), dtype=object)
    vals = fetch_doc_values(searcher.reader, td.docids, sort_field)
    uniq, counts = np.unique(groups, return_counts=True)
    top = np.lexsort((uniq, -counts))[:k_groups]
    out = []
    for grank, gi in enumerate(top):
        sel = np.nonzero(groups == uniq[gi])[0]
        docs, v = td.docids[sel], vals[sel]
        order = np.lexsort((docs, v if ascending else -v))[:k_per_group]
        out.append(
            GroupDocs(uniq[gi], grank, int(counts[gi]), docs[order], v[order])
        )
    return out


def diversified_topk(
    searcher,
    query,
    sort_field: str,
    key_field: str,
    k: int = 10,
    max_hits_per_key: int = 1,
):
    """DiversifiedTopDocsCollector (misc/search/
    DiversifiedTopDocsCollector.java): top-``k`` matching docs where each
    key (a SORTED doc-values field here, the reference's NumericDocValues
    key source) contributes at most ``max_hits_per_key`` docs.

    Ordering is by a numeric doc-values field desc with docid-asc
    tie-break instead of relevance (same float-free rationale as
    group_topk). Semantics: rank docs within each key along the GLOBAL
    order, drop those past ``max_hits_per_key``, then take the global
    top-``k`` of the survivors — the reference's greedy PQ admission
    yields the same set whenever the queue never evicts (exactly the
    collect-then-cut view; divergence documented).

    Returns (docids, values, key_terms) aligned arrays. O(matches)
    vectorized; at scale this runs per-segment (top k*max_hits_per_key
    each) and merges, like any top-k collector.
    """
    from lucene_ray.search.engine import fetch_sorted_dv_values

    td = searcher.search(query, k=1 << 62)
    if len(td.docids) == 0:
        z = np.array([], dtype=np.int64)
        return z, z, np.array([], dtype=object)
    vals = fetch_doc_values(searcher.reader, td.docids, sort_field)
    keys = fetch_sorted_dv_values(searcher.reader, td.docids, key_field)
    order = np.lexsort((td.docids, -vals))
    docs_o, vals_o, keys_o = td.docids[order], vals[order], keys[order]
    # occurrence index of each row within its key, along the global order:
    # stable-sort by key preserves global order inside each key block
    by_key = np.argsort(keys_o, kind="stable")
    keys_s = keys_o[by_key]
    starts = np.concatenate(([True], keys_s[1:] != keys_s[:-1]))
    block_start = np.maximum.accumulate(np.where(starts, np.arange(len(keys_s)), 0))
    occ_sorted = np.arange(len(keys_s)) - block_start
    occ = np.empty(len(keys_o), dtype=np.int64)
    occ[by_key] = occ_sorted
    keep = np.nonzero(occ < max_hits_per_key)[0][:k]
    return docs_o[keep], vals_o[keep], keys_o[keep]
