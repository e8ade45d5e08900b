"""Segment merging: TieredMergePolicy math over the manifest + Ray merge
workers (the compaction stage).

Policy parity (index/TieredMergePolicy.java):
  - allowedSegCount from geometric tier levels: floor 2 MB, segsPerTier 10,
    mergeFactor = min(maxMergeAtOnce, segsPerTier)      [:394-411 budget loop]
  - candidate windows of <= mergeFactor segments, <= 5 GB after-merge bytes,
    with the "hitTooLarge keeps packing smaller segments" rule   [:512-552]
  - skip merges whose result is < 1.5x the biggest input (anti O(N^2)),
    and singleton no-delete merges                               [:558-578]
  - score = skew * totalBytes^0.05 * nonDelRatio^2 (lower wins), where skew =
    floored(largest)/flooredTotal, or 1/mergeFactor when hitTooLarge [:654-702]
  - at most one over-size merge per cycle                        [:621-651]

Deliberate divergence, documented: Lucene merges ARBITRARY segments and
renumbers docids (index/DocIDMerger.java) because its ids are ephemeral.
Our global docids are stable engine output (rank-identity + N-vs-4N golden
equality), so candidate windows slide over the DOCID-ORDERED segment list and
only *adjacent* runs merge (LogMergePolicy's contiguity rule,
index/LogMergePolicy.java) — the merged segment inherits the first input's
docid_base and locals shift by input offsets; global ids never change.
With an append-only corpus delCount == 0, so the delete terms vanish.

Execution: merge specs -> ray.data.from_items -> map_batches(tasks); each
task streams the input postings tables term-by-term (k-way by sorted term),
decodes, rebases docids, re-encodes blocks and impacts EXACTLY as at build
(SegmentMerger re-writes postings so stats are never stale,
index/SegmentMerger.java:109-165).
"""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.codec.forutil import decode_stream
from lucene_ray.config import (
    MERGE_FLOOR_SEGMENT_BYTES,
    MERGE_MAX_MERGE_AT_ONCE,
    MERGE_MAX_MERGED_SEGMENT_BYTES,
    MERGE_SEGS_PER_TIER,
)
from lucene_ray.index.manifest import (
    Manifest,
    SegmentEntry,
    read_manifest,
    segment_dir,
    write_entry,
    write_manifest,
)


class TieredMergePolicy:
    def __init__(
        self,
        floor_segment_bytes: int = MERGE_FLOOR_SEGMENT_BYTES,
        max_merged_segment_bytes: int = MERGE_MAX_MERGED_SEGMENT_BYTES,
        segs_per_tier: float = MERGE_SEGS_PER_TIER,
        max_merge_at_once: int = MERGE_MAX_MERGE_AT_ONCE,
    ):
        self.floor_segment_bytes = floor_segment_bytes
        self.max_merged_segment_bytes = max_merged_segment_bytes
        self.segs_per_tier = segs_per_tier
        self.max_merge_at_once = max_merge_at_once

    def _floor_size(self, b: int) -> int:
        return max(b, self.floor_segment_bytes)

    def allowed_seg_count(self, sizes: list[int]) -> float:
        """Budget loop, TieredMergePolicy.java:394-411."""
        tot = sum(sizes)
        min_size = min(sizes) if sizes else 0
        merge_factor = int(min(self.max_merge_at_once, self.segs_per_tier))
        level_size = self._floor_size(min_size)
        bytes_left = tot
        allowed = 0.0
        while True:
            level_count = bytes_left / level_size
            if level_count < self.segs_per_tier or level_size == self.max_merged_segment_bytes:
                allowed += np.ceil(level_count)
                break
            allowed += self.segs_per_tier
            bytes_left -= int(self.segs_per_tier * level_size)
            level_size = min(self.max_merged_segment_bytes, level_size * merge_factor)
        return max(allowed, self.segs_per_tier)

    def score(
        self, cand_sizes: list[int], hit_too_large: bool, non_del_ratio: float = 1.0
    ) -> float:
        """TieredMergePolicy.score, :654-702. Lower wins; candidates with
        more deletes score lower (reclaim priority, nonDelRatio^2 term)."""
        tot = sum(cand_sizes)
        tot_floored = sum(self._floor_size(b) for b in cand_sizes)
        merge_factor = int(min(self.max_merge_at_once, self.segs_per_tier))
        if hit_too_large:
            skew = 1.0 / merge_factor
        else:
            largest = max(cand_sizes)
            skew = self._floor_size(largest) / tot_floored
        return skew * (tot ** 0.05) * (non_del_ratio ** 2)

    def find_merges(self, segments: list[SegmentEntry]) -> list[list[str]]:
        """Return merge specs (lists of segment names, docid-adjacent runs).
        doFindMerges structure (:436-651) with the adjacency divergence
        documented in the module docstring."""
        if len(segments) < 2:
            return []
        ordered = sorted(segments, key=lambda e: e.docid_base)
        sizes = {e.name: e.bytes for e in ordered}
        # exclude too-big segments from eligibility (> max/2, :383-388)
        eligible = [
            e for e in ordered if e.bytes <= self.max_merged_segment_bytes / 2
        ]
        if not eligible:
            return []
        allowed = self.allowed_seg_count([sizes[e.name] for e in eligible])
        merge_factor = int(min(self.max_merge_at_once, self.segs_per_tier))

        specs: list[list[str]] = []
        taken: set[str] = set()
        have_one_large = False
        while True:
            pool = [e for e in eligible if e.name not in taken]
            if len(pool) <= allowed or len(pool) < 2:
                return specs
            best, best_score, best_too_large = None, None, False
            # windows over ADJACENT docid runs (contiguity constraint)
            for start in range(len(pool)):
                cand: list[SegmentEntry] = []
                tot = 0
                hit_too_large = False
                idx = start
                while (
                    idx < len(pool)
                    and len(cand) < merge_factor
                    and tot < self.max_merged_segment_bytes
                ):
                    e = pool[idx]
                    # adjacency: stop the window at a docid gap
                    if cand and e.docid_base != cand[-1].docid_base + cand[-1].doc_count:
                        break
                    if tot + e.bytes > self.max_merged_segment_bytes:
                        hit_too_large = True
                        if not cand:
                            cand.append(e)
                        idx += 1
                        continue  # keep packing smaller segments (:545-548)
                    cand.append(e)
                    tot += e.bytes
                    idx += 1
                if len(cand) < 2:
                    continue
                largest = max(c.bytes for c in cand)
                if not hit_too_large and tot < largest * 1.5:
                    continue  # anti O(N^2) rule (:558-573)
                if best_score is not None and not hit_too_large and len(cand) < merge_factor:
                    break  # tail of the list, only smaller merges left (:585-589)
                n_docs = sum(c.doc_count for c in cand)
                n_del = sum(getattr(c, "del_count", 0) for c in cand)
                s = self.score(
                    [c.bytes for c in cand],
                    hit_too_large,
                    non_del_ratio=1.0 - (n_del / n_docs if n_docs else 0.0),
                )
                if (best_score is None or s < best_score) and (
                    not hit_too_large or not have_one_large
                ):
                    best, best_score, best_too_large = cand, s, hit_too_large
            if best is None:
                return specs
            if best_too_large:
                have_one_large = True  # one over-size merge per cycle (:621-628)
            for e in best:
                taken.add(e.name)
            specs.append([e.name for e in best])


def merge_segments(index_dir: str, names: list[str]) -> SegmentEntry:
    """Execute one merge: k-way term merge with docid rebase; idempotent."""
    from lucene_ray.index.manifest import read_entry

    t0 = time.perf_counter()
    manifest = read_manifest(index_dir)
    entries = sorted(
        (e for e in manifest.segments if e.name in names),
        key=lambda e: e.docid_base,
    )
    assert len(entries) == len(names), "merge input missing from manifest"
    for a, b in zip(entries, entries[1:]):
        assert b.docid_base == a.docid_base + a.doc_count, "non-adjacent merge"
    new_base = entries[0].docid_base
    # del_gen AND dv_gen are part of the identity: the same inputs re-merged
    # after new deletes or DV updates must produce a NEW segment, not hit
    # the idempotency cache
    fp = hashlib.sha1(
        (
            "+".join(
                f"{e.name}:{getattr(e, 'del_gen', 0)}:{getattr(e, 'dv_gen', 0)}"
                for e in entries
            )
        ).encode()
    ).hexdigest()[:12]
    name = f"seg_{entries[0].name.split('_')[1]}m_{fp}"
    existing = read_entry(index_dir, name)
    if existing is not None:
        return existing

    tables = []
    offsets = []
    for e in entries:
        tables.append(
            pq.read_table(os.path.join(segment_dir(index_dir, e.name), "postings.parquet"))
        )
        offsets.append(e.docid_base - new_base)

    # concatenated norms for impact recomputation
    norm_parts, len_parts = [], []
    for e in entries:
        nt = pq.read_table(os.path.join(segment_dir(index_dir, e.name), "norms.parquet"))
        norm_parts.append(nt.column("norm").to_numpy(zero_copy_only=False))
        len_parts.append(nt.column("doc_len").to_numpy(zero_copy_only=False))
    norms = np.concatenate(norm_parts).astype(np.uint8)
    doc_lens = np.concatenate(len_parts)

    # ---- decode every input WHOLE-SEGMENT (batched block decoder), then
    # re-encode through the SAME vectorized path as the flush --------------
    from lucene_ray.codec.postings_codec import decode_segment_pairs

    with_positions = any(
        len(t.column("pos_blob")[0].as_py() or b"") > 0 for t in tables if t.num_rows
    )
    seg_decoded = [decode_segment_pairs(t, with_positions) for t in tables]
    all_terms = np.unique(np.concatenate([d[0] for d in seg_decoded]))
    pair_rank_parts, pair_doc_parts, tf_parts, pos_parts = [], [], [], []
    for i, (terms_i, df_i, doc_i, tf_i, pos_i) in enumerate(seg_decoded):
        ranks_i = np.searchsorted(all_terms, terms_i)
        pair_rank_parts.append(np.repeat(ranks_i, df_i))
        pair_doc_parts.append(doc_i + offsets[i])
        tf_parts.append(tf_i)
        # per-doc position deltas are self-contained (first delta is the
        # absolute position) -> the merged stream is a plain gather
        pos_parts.append(pos_i)
    pair_rank = np.concatenate(pair_rank_parts)
    pair_doc = np.concatenate(pair_doc_parts)
    tfs = np.concatenate(tf_parts)
    pos_concat = np.concatenate(pos_parts).astype(np.uint32)

    # ---- apply deletes: drop tombstoned docs' postings (the merge-time
    # reclaim, index/SegmentMerger.java liveDocs path). Docid SPACE is
    # preserved (stable global ids) — the bitmap is carried forward so
    # MatchAllDocs / norms stay consistent; only postings are reclaimed.
    any_deletes = any(getattr(e, "del_gen", 0) > 0 for e in entries)
    live_merged = None
    if any_deletes:
        from lucene_ray.index.writer import _load_livedocs

        live_merged = np.concatenate(
            [_load_livedocs(segment_dir(index_dir, e.name), e) for e in entries]
        )
        keep = live_merged[pair_doc]
        if not keep.all():
            if with_positions:
                pos_concat = pos_concat[np.repeat(keep, tfs)]
            pair_rank, pair_doc, tfs = pair_rank[keep], pair_doc[keep], tfs[keep]
            # prune terms whose postings vanished entirely
            present = np.unique(pair_rank)
            if len(present) < len(all_terms):
                all_terms = all_terms[present]
                pair_rank = np.searchsorted(present, pair_rank)

    # final pair order: (term rank, docid) — inputs were concatenated in
    # docid_base order, so a stable sort by rank suffices
    order = np.argsort(pair_rank, kind="stable")
    pair_rank_s = pair_rank[order]
    pair_doc_s = pair_doc[order]
    tfs_s = tfs[order]
    if with_positions:
        # reorder the positions stream segment-wise to match the pair order
        seg_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        lens_o = tfs[order]
        starts_o = seg_starts[order]
        within = np.arange(int(lens_o.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(lens_o)[:-1])), lens_o
        )
        pos_sorted = pos_concat[np.repeat(starts_o, lens_o) + within]
    else:
        pos_sorted = np.array([], dtype=np.uint32)

    from lucene_ray.codec.postings_codec import postings_table_from_pairs

    merged = postings_table_from_pairs(
        all_terms, pair_rank_s, pair_doc_s, tfs_s, pos_sorted, norms,
        with_positions=with_positions,
    )
    # sum_ttf is recomputed from the KEPT pairs, content-only (field "f:v"
    # postings excluded) — together with ``reclaimed`` below this makes
    # post-merge stats identical to a fresh index of the live docs
    # (reference merge semantics: df/N/ttf drop together when deletes are
    # reclaimed; before a merge they all still include tombstones)
    is_field_term = np.array([":" in t for t in all_terms], dtype=bool)
    sum_ttf = int(tfs[~is_field_term[pair_rank]].sum())
    d = segment_dir(index_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(merged, os.path.join(d, "postings.parquet"))
    pq.write_table(
        pa.table(
            {
                "norm": pa.array(norms, type=pa.uint8()),
                "doc_len": pa.array(doc_lens, type=pa.int64()),
            }
        ),
        os.path.join(d, "norms.parquet"),
    )
    stored = pa.concat_tables(
        [
            pq.read_table(os.path.join(segment_dir(index_dir, e.name), "stored.parquet"))
            for e in entries
        ]
    )
    pq.write_table(stored, os.path.join(d, "stored.parquet"))

    # doc values concat in doc order; points re-sorted with docid offsets
    # (deleted docs' point rows are dropped like their postings)
    dv_paths = [
        os.path.join(
            segment_dir(index_dir, e.name),
            f"docvalues_g{e.dv_gen}.parquet"
            if getattr(e, "dv_gen", 0) > 0
            else "docvalues.parquet",
        )
        for e in entries
    ]
    if all(os.path.exists(p) for p in dv_paths):
        dv = pa.concat_tables([pq.read_table(p) for p in dv_paths])
        pq.write_table(dv, os.path.join(d, "docvalues.parquet"))
        pt_parts = []
        for i, e in enumerate(entries):
            pt = pq.read_table(
                os.path.join(segment_dir(index_dir, e.name), "points.parquet")
            )
            docs = pt.column("docid").to_numpy(zero_copy_only=False) + offsets[i]
            pt_parts.append(
                pa.table(
                    {
                        "field": pt.column("field"),
                        "value": pt.column("value"),
                        "docid": pa.array(docs, type=pa.int64()),
                    }
                )
            )
        pts = pa.concat_tables(pt_parts)
        # sort on integer dictionary codes, not object strings (lexsort over
        # an object column falls back to python comparisons). Code order is
        # arbitrary — the reader masks per field and only needs the
        # within-field (value, docid) order, which the lexsort guarantees.
        f_dict = pts.column("field").combine_chunks().dictionary_encode()
        f_codes = f_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        f_np = np.asarray(f_dict.dictionary.to_pylist(), dtype=object)[f_codes]
        v_np = pts.column("value").to_numpy(zero_copy_only=False)
        d_np = pts.column("docid").to_numpy(zero_copy_only=False)
        # fold DV update generations into the rebuilt points (like postings
        # reclaim): the merged segment's points agree with its merged doc
        # values, so range queries see the updates from the merge on
        v_np = v_np.copy()
        for fname in dv.schema.names:
            fm = f_np == fname
            if fm.any():
                dv_col = dv.column(fname).to_numpy(zero_copy_only=False)
                v_np[fm] = dv_col[d_np[fm]]
        if live_merged is not None:
            m = live_merged[d_np]
            f_np, v_np, d_np, f_codes = f_np[m], v_np[m], d_np[m], f_codes[m]
        o = np.lexsort((d_np, v_np, f_codes))
        pq.write_table(
            pa.table(
                {
                    "field": pa.array(f_np[o], type=pa.string()),
                    "value": pa.array(v_np[o], type=pa.int64()),
                    "docid": pa.array(d_np[o], type=pa.int64()),
                }
            ),
            os.path.join(d, "points.parquet"),
        )
    del_gen, del_count, reclaimed = 0, 0, 0
    if any_deletes:
        del_count = int((~live_merged).sum())
        del_gen, reclaimed = 1, del_count  # every tombstone's postings dropped
        pq.write_table(
            pa.table({"live": pa.array(live_merged, type=pa.bool_())}),
            os.path.join(d, "livedocs_g1.parquet"),
        )

    secs = time.perf_counter() - t0
    doc_count = sum(e.doc_count for e in entries)
    seg_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for f in ("postings.parquet", "norms.parquet", "stored.parquet")
    )
    entry = SegmentEntry(
        name=name,
        docid_base=new_base,
        doc_count=doc_count,
        sum_ttf=sum_ttf,
        unique_terms=merged.num_rows,
        bytes=seg_bytes,
        del_gen=del_gen,
        del_count=del_count,
        reclaimed=reclaimed,
        input={"merged_from": [e.name for e in entries], "fingerprint": fp},
        metrics={
            "build_secs": round(secs, 4),
            "docs_per_sec": round(doc_count / secs, 1),
            "postings": int(pa.compute.sum(merged.column("df")).as_py() or 0),
            "merge_inputs": len(entries),
        },
    )
    write_entry(index_dir, entry)
    return entry


def maybe_merge(
    index_dir: str,
    policy: TieredMergePolicy | None = None,
    max_rounds: int = 10,
    use_ray: bool = True,
) -> Manifest:
    """Run merge rounds until the policy is satisfied (IndexWriter.maybeMerge
    cascade, index/IndexWriter.java:701). Each round's merges execute in
    parallel as a Ray Data task pool over the spec list; the manifest swap is
    a single atomic write per round."""
    policy = policy or TieredMergePolicy()
    manifest = read_manifest(index_dir)
    for _ in range(max_rounds):
        specs = policy.find_merges(manifest.live_segments)
        if not specs:
            return manifest
        new_entries = _execute_merges(index_dir, specs, use_ray)
        merged_away = {n for spec in specs for n in spec}
        keep = [e for e in manifest.segments if e.name not in merged_away]
        keep.extend(new_entries)
        keep.sort(key=lambda e: e.docid_base)
        manifest = Manifest(
            generation=manifest.generation + 1,
            analyzer=manifest.analyzer,
            doc_count=sum(e.doc_count for e in keep),
            sum_ttf=sum(e.sum_ttf for e in keep),
            segments=keep,
        )
        write_manifest(index_dir, manifest)
    return manifest


def force_merge(index_dir: str, use_ray: bool = False) -> Manifest:
    """ForceMerge(1): one final global merge round
    (index/IndexWriter.java:2098)."""
    manifest = read_manifest(index_dir)
    live = sorted(manifest.live_segments, key=lambda e: e.docid_base)
    while len(live) > 1:
        # merge in windows of max_merge_at_once until one remains
        specs = [
            [e.name for e in live[i : i + MERGE_MAX_MERGE_AT_ONCE]]
            for i in range(0, len(live), MERGE_MAX_MERGE_AT_ONCE)
        ]
        specs = [s for s in specs if len(s) > 1]
        if not specs:
            break
        new_entries = _execute_merges(index_dir, specs, use_ray)
        merged_away = {n for spec in specs for n in spec}
        live = [e for e in live if e.name not in merged_away] + new_entries
        live.sort(key=lambda e: e.docid_base)
        manifest = Manifest(
            generation=manifest.generation + 1,
            analyzer=manifest.analyzer,
            doc_count=sum(e.doc_count for e in live),
            sum_ttf=sum(e.sum_ttf for e in live),
            segments=live,
        )
        write_manifest(index_dir, manifest)
    return manifest


def _execute_merges(index_dir: str, specs: list[list[str]], use_ray: bool) -> list[SegmentEntry]:
    if not use_ray or len(specs) == 1:
        return [merge_segments(index_dir, spec) for spec in specs]
    import json as _json

    import ray.data

    def run(batch: dict) -> dict:
        out = []
        for spec_json in batch["spec"]:
            entry = merge_segments(index_dir, _json.loads(spec_json))
            out.append(_json.dumps(entry.__dict__))
        return {"entry": np.array(out)}

    ds = ray.data.from_items([{"spec": _json.dumps(s)} for s in specs]).repartition(
        len(specs)
    )
    out = []
    for batch in ds.map_batches(run, batch_size=None).iter_batches(batch_format="pyarrow"):
        for e in batch.column("entry").to_pylist():
            out.append(SegmentEntry(**_json.loads(e)))
    return out
