"""Randomized writer workout (the TestIndexWriter random-ops analog):
interleaved delete_docs / delete_by_term / update_numeric_docvalues /
add_documents / merges / rollback, verified after EVERY op against an
independent Python model (live doc sets per term, exact counts, latest DV
values) plus CheckIndex. Docids are per-commit coordinates: rollback
rewinds the doc space and later adds reuse it (writer.rollback docstring).
A 6-trial x 24-op sweep ran green out-of-band; 3x16 committed."""

import os
import random
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.checkindex import check_index
from lucene_ray.index.manifest import read_manifest
from lucene_ray.index.merge import TieredMergePolicy, force_merge, maybe_merge
from lucene_ray.index.writer import (
    add_documents,
    delete_by_term,
    delete_docs,
    rollback,
    update_numeric_docvalues,
)
from lucene_ray.search.engine import IndexSearcher, fetch_doc_values
from lucene_ray.search.reader import IndexReader

WORDS = ["merge", "flush", "sort", "batch", "scan", "tree"]

def key_of(i):
    # letters-only key (the CodeAnalyzer splits letter<->digit transitions)
    a, b, c = i // 676, (i // 26) % 26, i % 26
    return "key" + chr(97 + a) + chr(97 + b) + chr(97 + c)

def run_trial_in(seed, root, n_ops=24):
    rng = random.Random(seed)
    d = os.path.join(root, f"workout_{seed}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rows, model_docs = [], []
    for i in range(80):
        toks = [key_of(i)] + [WORDS[j] for j in range(len(WORDS)) if (i >> j) & 1 or j == i % 6]
        rows.append({"repo": "r", "path": f"p{i}", "commit": "c", "lang": "t",
                     "content": " ".join(toks)})
        model_docs.append(set(toks))
    src = os.path.join(d, "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src, row_group_size=20)
    ix = os.path.join(d, "ix")
    build_index([src], ix, target_docs=20)

    alive = set(range(80))
    dv = {i: len(rows[i]["content"]) for i in range(80)}  # n_chars = text len
    nxt = [80]
    history = {read_manifest(ix).generation: (set(alive), dict(dv), list(model_docs), nxt[0])}

    def snap():
        history[read_manifest(ix).generation] = (set(alive), dict(dv), list(model_docs), nxt[0])

    def verify(step, op):
        s = IndexSearcher(ix)
        for w in WORDS[:3]:
            got = set(s.search(w, 10_000_000).docids.tolist())
            want = {i for i in alive if w in model_docs[i]}
            assert got == want, (seed, step, op, w, got ^ want)
            assert s.count(w) == len(want), (seed, step, op, w)
        # dv spot check over alive docs
        samp = sorted(rng.sample(sorted(alive), min(10, len(alive))))
        vals = fetch_doc_values(IndexReader(ix), samp, "n_chars")
        for i, v in zip(samp, vals):
            assert int(v) == dv[i], (seed, step, op, i, int(v), dv[i])
        r = check_index(ix, verify_content=False)
        assert r["ok"], (seed, step, op, r["problems"][:3])

    for step in range(n_ops):
        op = rng.choice(["del_docs", "del_term", "dv_update", "add", "merge", "force", "rollback"])
        if op == "del_docs" and alive:
            pick = set(rng.sample(sorted(alive), min(3, len(alive))))
            delete_docs(ix, sorted(pick))
            alive -= pick
            snap()
        elif op == "del_term" and alive:
            victim = rng.choice(sorted(alive))
            term = key_of(victim) if rng.random() < 0.7 else rng.choice(WORDS)
            delete_by_term(ix, term)
            alive -= {i for i in alive if term in model_docs[i]}
            snap()
        elif op == "dv_update":
            term = rng.choice(WORDS)
            val = rng.randint(1000, 9999)
            update_numeric_docvalues(ix, term, "n_chars", val)
            for i in alive:
                if term in model_docs[i]:
                    dv[i] = val
            snap()
        elif op == "add":
            n = rng.randint(1, 2)
            newrows = []
            for _ in range(n):
                i = nxt[0]; nxt[0] += 1
                toks = [key_of(i), rng.choice(WORDS)]
                newrows.append({"repo": "r", "path": f"p{i}", "commit": "c",
                                "lang": "t", "content": " ".join(toks)})
                if i < len(model_docs):
                    model_docs[i] = set(toks)  # docid reused post-rollback
                else:
                    model_docs.append(set(toks))
                alive.add(i)
                dv[i] = len(newrows[-1]["content"])
            add_documents(ix, pa.Table.from_pylist(newrows))
            snap()
        elif op == "merge":
            maybe_merge(ix, TieredMergePolicy(), use_ray=False)
            snap()
        elif op == "force":
            force_merge(ix)
            snap()
        elif op == "rollback" and len(history) > 1:
            g = rng.choice(sorted(history)[:-1])
            rollback(ix, g)
            a, dvs, md, nx = history[g]
            alive, dv, model_docs = set(a), dict(dvs), list(md)
            nxt[0] = nx
            snap()
        verify(step, op)
    return True



@pytest.mark.parametrize("seed", [0, 1, 2])
def test_writer_workout(seed, tmp_path, ray_session):
    run_trial_in(seed, str(tmp_path), n_ops=16)
