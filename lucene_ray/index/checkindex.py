"""CheckIndex: whole-index invariant verification (index/CheckIndex.java:
101,526,1054-1079 re-expressed over the Parquet segment format).

Checks per segment:
  - terms sorted strictly ascending (term dict order)
  - docids strictly increasing within each posting list; df == len(postings)
  - ttf == sum(tf); segment sum_ttf == manifest entry
  - every per-block pareto impact is a true (tf, norm) upper-bound set
  - norms table length == doc_count; norm == intToByte4(doc_len)
  - stored-fields sha256 matches the source Parquet rows (content invariant)
Index-level:
  - docid_base prefix-sum consistency, doc_count totals
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq

from lucene_ray.codec.postings_codec import decode_term_postings
from lucene_ray.config import BLOCK_SIZE
from lucene_ray.index.manifest import segment_dir
from lucene_ray.search.reader import IndexReader
from lucene_ray.util.smallfloat import int_to_byte4


def check_index(index_dir: str, verify_content: bool = True) -> dict:
    reader = IndexReader(index_dir)
    problems: list[str] = []
    n_terms = n_postings = 0

    expected_base = 0
    for entry in reader.segments:
        if entry.docid_base != expected_base:
            problems.append(
                f"{entry.name}: docid_base {entry.docid_base} != prefix sum {expected_base}"
            )
        expected_base += entry.doc_count

        sr = reader.segment_reader(entry.name)
        d = segment_dir(index_dir, entry.name)
        postings = pq.read_table(os.path.join(d, "postings.parquet"))
        terms = postings.column("term").to_pylist()
        if terms != sorted(terms):
            problems.append(f"{entry.name}: terms not sorted")
        if len(set(terms)) != len(terms):
            problems.append(f"{entry.name}: duplicate terms")

        seg_ttf = 0
        for row in postings.to_pylist():
            tp = decode_term_postings(row)
            n_terms += 1
            n_postings += len(tp.docids)
            if len(tp.docids) != row["df"]:
                problems.append(f"{entry.name}/{row['term']}: df mismatch")
            if np.any(np.diff(tp.docids) <= 0):
                problems.append(f"{entry.name}/{row['term']}: docids not increasing")
            if tp.docids[-1] >= entry.doc_count or tp.docids[0] < 0:
                problems.append(f"{entry.name}/{row['term']}: docid out of range")
            if int(tp.tfs.sum()) != row["ttf"]:
                problems.append(f"{entry.name}/{row['term']}: ttf mismatch")
            if np.any(tp.tfs <= 0):
                problems.append(f"{entry.name}/{row['term']}: nonpositive tf")
            if ":" not in row["term"]:
                # keyword-field postings are excluded from sum_ttf (it is
                # the content-only avgdl numerator)
                seg_ttf += int(tp.tfs.sum())
            # impacts: true upper bounds per block
            for b, packed in enumerate(row["impacts"]):
                sl = slice(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, len(tp.docids)))
                tfs = tp.tfs[sl]
                nms = sr.norm_bytes[tp.docids[sl]]
                pairs = [((p >> 8), p & 0xFF) for p in packed]
                for tf, nm in zip(tfs, nms):
                    if not any(ptf >= tf and pnm <= nm for ptf, pnm in pairs):
                        problems.append(
                            f"{entry.name}/{row['term']}: impact not an upper bound in block {b}"
                        )
                        break
        # entry.sum_ttf always equals the postings-side content ttf (at
        # build it is the full doc_len sum; after a delete-reclaiming merge
        # it was recomputed from the kept pairs). The doc_len sum bounds it
        # from above, with equality iff nothing was reclaimed.
        if seg_ttf != entry.sum_ttf:
            problems.append(
                f"{entry.name}: postings ttf {seg_ttf} != manifest {entry.sum_ttf}"
            )
        dl_all = int(sr.doc_len.sum())
        reclaimed = getattr(entry, "reclaimed", 0)
        # discountOverlaps: norms exclude posInc==0 tokens, sum_ttf counts
        # them (BM25Similarity.java:99-101 / sumTotalTermFreq semantics) —
        # the invariant is sum_ttf == doc_len sum + overlaps (exact at
        # build and overlap-free merges; bound after reclaiming merges)
        overlaps = int((entry.metrics or {}).get("overlaps", 0) or 0)
        if reclaimed == 0 and entry.sum_ttf != dl_all + overlaps:
            problems.append(
                f"{entry.name}: sum_ttf {entry.sum_ttf} != doc_len sum"
                f" {dl_all} + overlaps {overlaps}"
            )
        if reclaimed > 0 and entry.sum_ttf > dl_all + overlaps:
            problems.append(
                f"{entry.name}: sum_ttf {entry.sum_ttf} exceeds doc_len sum"
                f" {dl_all} + overlaps {overlaps}"
            )
        if reclaimed > getattr(entry, "del_count", 0):
            problems.append(f"{entry.name}: reclaimed > del_count")

        if len(sr.norm_bytes) != entry.doc_count:
            problems.append(f"{entry.name}: norms length mismatch")
        if not np.array_equal(int_to_byte4(sr.doc_len), sr.norm_bytes):
            problems.append(f"{entry.name}: norm != intToByte4(doc_len)")

        # live-docs invariants (Lucene90LiveDocsFormat checks)
        if getattr(entry, "del_gen", 0) > 0:
            if sr.live_mask is None or len(sr.live_mask) != entry.doc_count:
                problems.append(f"{entry.name}: livedocs length mismatch")
            else:
                ndel = int((~sr.live_mask).sum())
                if ndel != getattr(entry, "del_count", 0):
                    problems.append(
                        f"{entry.name}: del_count {entry.del_count} != bitmap {ndel}"
                    )
        elif getattr(entry, "del_count", 0):
            problems.append(f"{entry.name}: del_count without del_gen")

        # doc-values / points cross-checks (Lucene90DocValuesFormat /
        # points checkIntegrity role): dv is doc-ordered and full-length;
        # the value-sorted points table is a permutation of the dv pairs
        dv_path = os.path.join(d, "docvalues.parquet")
        pt_path = os.path.join(d, "points.parquet")
        # DV update generations: the latest gen file must exist with full
        # doc-ordered length and the base schema (points stay index-time —
        # their consistency check below runs against the BASE generation)
        dv_gen = getattr(entry, "dv_gen", 0)
        if dv_gen > 0:
            gpath = os.path.join(d, f"docvalues_g{dv_gen}.parquet")
            if not os.path.exists(gpath):
                problems.append(f"{entry.name}: dv_gen {dv_gen} file missing")
            else:
                gdv = pq.read_table(gpath)
                base_names = (
                    pq.read_schema(dv_path).names if os.path.exists(dv_path) else []
                )
                if sorted(gdv.schema.names) != sorted(base_names):
                    problems.append(f"{entry.name}: dv gen schema != base schema")
                for col in gdv.schema.names:
                    if len(gdv.column(col)) != entry.doc_count:
                        problems.append(
                            f"{entry.name}: dv gen [{col}] length mismatch"
                        )
        if os.path.exists(dv_path):
            dv = pq.read_table(dv_path)
            for col in dv.schema.names:
                if len(dv.column(col)) != entry.doc_count:
                    problems.append(f"{entry.name}: docvalues[{col}] length mismatch")
            if os.path.exists(pt_path):
                pt = pq.read_table(pt_path)
                fields = np.asarray(pt.column("field").to_pylist(), dtype=object)
                pvals = pt.column("value").to_numpy(zero_copy_only=False)
                pdocs = pt.column("docid").to_numpy(zero_copy_only=False)
                for f in np.unique(fields):
                    m = fields == f
                    if np.any(np.diff(pvals[m]) < 0):
                        problems.append(f"{entry.name}: points[{f}] not value-sorted")
                    if np.any((pdocs[m] < 0) | (pdocs[m] >= entry.doc_count)):
                        problems.append(f"{entry.name}: points[{f}] docid out of range")
                    if str(f) in dv.schema.names:
                        # every point agrees with the doc-ordered dv value;
                        # merges reclaim deleted docs' points (like postings),
                        # so full-permutation equality holds only delete-free
                        dvv = dv.column(str(f)).to_numpy(zero_copy_only=False)
                        if np.any(dvv[pdocs[m]] != pvals[m]):
                            problems.append(
                                f"{entry.name}: points[{f}] value != docvalues"
                            )
                        n_missing = entry.doc_count - int(m.sum())
                        n_gone = getattr(entry, "del_count", 0)
                        if n_missing > n_gone:
                            problems.append(
                                f"{entry.name}: points[{f}] missing {n_missing} "
                                f"docs with only {n_gone} deleted"
                            )

        # term-vectors sidecar (TermVectorsReader checkIntegrity role):
        # doc-major sorted, docids in range, freq == len(positions) with
        # strictly-increasing positions, and per-doc freq sums equal the
        # CONTENT doc_len (TV is content-only, like norms) — tombstoned
        # docs' rows are reclaimed at merge, so the equality is asserted
        # for live docs and bounded for the rest
        tv_path = os.path.join(d, "termvectors.parquet")
        if os.path.exists(tv_path):
            tv = pq.read_table(tv_path)
            tdocs = tv.column("doc").to_numpy(zero_copy_only=False)
            tfreq = tv.column("freq").to_numpy(zero_copy_only=False).astype(np.int64)
            if np.any(np.diff(tdocs) < 0):
                problems.append(f"{entry.name}: termvectors not doc-sorted")
            if len(tdocs) and (tdocs[0] < 0 or tdocs[-1] >= entry.doc_count):
                problems.append(f"{entry.name}: termvectors docid out of range")
            plens = tv.column("positions").combine_chunks()
            import pyarrow.compute as pc

            if not np.array_equal(
                pc.list_value_length(plens).to_numpy(zero_copy_only=False),
                tfreq,
            ):
                problems.append(f"{entry.name}: termvectors freq != len(positions)")
            flat = pc.list_flatten(plens).to_numpy(zero_copy_only=False)
            starts = np.r_[0, np.cumsum(tfreq)[:-1]]
            # overlap analyzers (ngram/shingle/synonym) legitimately emit
            # the same term twice at ONE position (posInc==0), so with
            # overlaps the invariant relaxes to non-decreasing — the
            # reference CheckIndex allows pos == lastPos (ADVICE r3)
            bad = np.diff(flat) < 0 if overlaps > 0 else np.diff(flat) <= 0
            if len(flat) > 1:
                # boundaries between rows may legitimately decrease
                bad[starts[1:] - 1] = False
                if bad.any():
                    problems.append(
                        f"{entry.name}: termvectors positions not increasing"
                    )
            per_doc = np.bincount(tdocs, weights=tfreq, minlength=entry.doc_count)
            live = sr.live_mask if sr.live_mask is not None else np.ones(
                entry.doc_count, bool
            )
            # TV freqs count every token; doc_len may be overlap-discounted
            # (posInc==0 synonyms) — equality only for overlap-free segments
            if getattr(entry, "reclaimed", 0) == 0 and overlaps == 0:
                mismatch = per_doc != sr.doc_len
            else:
                mismatch = live & (per_doc < sr.doc_len)
            if mismatch.any():
                problems.append(
                    f"{entry.name}: termvectors freq sums != doc_len for "
                    f"{int(mismatch.sum())} docs"
                )

        # SORTED_NUMERIC sidecar: one row per doc, values ASC per doc
        # (SortedNumericDocValuesField write contract)
        snd_path = os.path.join(d, "docvalues_sortednumeric.parquet")
        if os.path.exists(snd_path):
            snd = pq.read_table(snd_path)
            if snd.num_rows != entry.doc_count:
                problems.append(
                    f"{entry.name}: sortednumeric sidecar rows != doc_count"
                )
            import pyarrow.compute as pc

            for col in snd.schema.names:
                c = snd.column(col).combine_chunks()
                flat = c.values.to_numpy(zero_copy_only=False)
                offs = c.offsets.to_numpy(zero_copy_only=False)
                if len(flat) > 1:
                    bad = np.diff(flat) < 0
                    # row boundaries may drop; EMPTY docs make boundary
                    # offsets hit 0 (leading — the -1 would wrap to the
                    # LAST diff and mask a real violation) or len(flat)
                    # (trailing — one past the diff array), so clamp to
                    # the valid diff-index range (ADVICE r4)
                    b = offs[1:-1] - 1
                    bad[b[(b >= 0) & (b < len(bad))]] = False
                    if bad.any():
                        problems.append(
                            f"{entry.name}: sortednumeric {col} values not "
                            "ascending within a doc"
                        )

        # shapes sidecar: doc-major local docids in range; v9 edge-origin
        # flags, when present, must be complete (all three bool columns,
        # no nulls) and every triangle must keep >= 1 boundary edge (a
        # tessellation component with all-internal edges is impossible)
        sh_path = os.path.join(d, "shapes.parquet")
        if os.path.exists(sh_path):
            sh_schema = pq.read_schema(sh_path)
            flag_cols = [c for c in ("fab", "fbc", "fca") if c in sh_schema.names]
            sh = pq.read_table(sh_path, columns=["docid"] + flag_cols)
            sdocs = sh.column("docid").to_numpy(zero_copy_only=False)
            if len(sdocs) and (sdocs.min() < 0 or sdocs.max() >= entry.doc_count):
                problems.append(f"{entry.name}: shapes docid out of range")
            if flag_cols:
                if len(flag_cols) != 3:
                    problems.append(
                        f"{entry.name}: shapes edge flags incomplete "
                        f"({flag_cols})"
                    )
                elif len(sdocs):
                    fl = [
                        sh.column(c).to_numpy(zero_copy_only=False)
                        for c in ("fab", "fbc", "fca")
                    ]
                    if not bool((fl[0] | fl[1] | fl[2]).all()):
                        problems.append(
                            f"{entry.name}: shapes triangle with no "
                            "boundary-flagged edge"
                        )

        # binary DV sidecar: one row per doc
        bdv_path = os.path.join(d, "docvalues_binary.parquet")
        if os.path.exists(bdv_path):
            if pq.ParquetFile(bdv_path).metadata.num_rows != entry.doc_count:
                problems.append(
                    f"{entry.name}: binary DV sidecar rows != doc_count"
                )

        if verify_content and "file" in entry.input:
            # merged segments carry "merged_from" lineage instead; their
            # stored sha256 column was concatenated from verified inputs
            stored = pq.read_table(os.path.join(d, "stored.parquet"))
            src = pq.ParquetFile(entry.input["file"]).read_row_groups(
                list(range(entry.input["rg_start"], entry.input["rg_end"])),
                columns=["content"],
            )
            expect = [
                hashlib.sha256(t.encode()).hexdigest() if t is not None else None
                for t in src.column("content").to_pylist()
            ]
            got = stored.column("content_sha256").to_pylist()
            if expect != got:
                problems.append(f"{entry.name}: content sha256 mismatch vs source")

    if reader.doc_count != expected_base:
        problems.append(f"manifest doc_count {reader.doc_count} != sum {expected_base}")
    return {
        "ok": not problems,
        "problems": problems,
        "segments": len(reader.segments),
        "terms": n_terms,
        "postings": n_postings,
    }


def exorcise_index(index_dir: str) -> dict:
    """CheckIndex.exorciseIndex (index/CheckIndex.java:3975): detach every
    segment whose files are unreadable or inconsistent from the manifest so
    the rest of the index opens cleanly — the lose-those-docs repair of
    last resort (the reference prints the same warning: back up first).

    Surviving segments keep their global docid bases; a removed segment is
    a GAP in the docid space (ids are never renumbered), marked
    ``deleted=True`` in a new manifest generation so retained history still
    references the dropped files."""
    import os

    from lucene_ray.index.manifest import (
        Manifest,
        read_manifest,
        write_manifest,
    )

    manifest = read_manifest(index_dir)
    removed: list[tuple[str, str]] = []
    for e in manifest.live_segments:
        d = segment_dir(index_dir, e.name)
        try:
            post_pf = pq.ParquetFile(os.path.join(d, "postings.parquet"))
            post_pf.read_row_group(0) if post_pf.metadata.num_row_groups else None
            norms = pq.read_table(os.path.join(d, "norms.parquet"))
            if len(norms) != e.doc_count:
                raise ValueError(
                    f"norms rows {len(norms)} != doc_count {e.doc_count}"
                )
            stored = pq.ParquetFile(os.path.join(d, "stored.parquet"))
            if stored.metadata.num_rows != e.doc_count:
                raise ValueError(
                    f"stored rows {stored.metadata.num_rows} != doc_count"
                    f" {e.doc_count}"
                )
        except Exception as ex:  # any unreadable/corrupt file condemns it
            removed.append((e.name, repr(ex)))
    if removed:
        bad = {n for n, _ in removed}
        for e in manifest.segments:
            if e.name in bad:
                e.deleted = True
        live = manifest.live_segments
        manifest = Manifest(
            generation=manifest.generation + 1,
            analyzer=manifest.analyzer,
            index_sort=getattr(manifest, "index_sort", None),
            user_data=getattr(manifest, "user_data", None),
            doc_count=sum(e.doc_count for e in live),
            sum_ttf=sum(e.sum_ttf for e in live),
            segments=manifest.segments,
        )
        write_manifest(index_dir, manifest)
    return {
        "removed": removed,
        "segments_left": len(manifest.live_segments),
    }
