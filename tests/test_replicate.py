"""Replication (lucene/replicator IndexReplicationHandler / IndexRevision):
revision shipping, incremental delta copies, idempotence, crash repair."""

import glob
import os

import numpy as np
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.replicate import replicate
from lucene_ray.index.writer import delete_docs, soft_delete_docs
from lucene_ray.search.engine import IndexSearcher


@pytest.fixture()
def primary(tmp_path, ray_session):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=200, n_shards=2, seed=21, row_group_size=64)
    src = str(tmp_path / "primary")
    build_index(sorted(glob.glob(corpus + "/*.parquet")), src, target_docs=60)
    return src


def _docs(ix, q="merge"):
    return IndexSearcher(ix).search(q, 1 << 62).docids.tolist()


def test_replica_is_search_identical(primary, tmp_path):
    dst = str(tmp_path / "replica")
    stats = replicate(primary, dst)
    assert stats["changed"] and stats["bytes"] > 0
    for q in ("merge", "merge flush", "+sort -hash"):
        assert _docs(dst, q) == _docs(primary, q)


def test_second_round_is_noop(primary, tmp_path):
    dst = str(tmp_path / "replica")
    replicate(primary, dst)
    again = replicate(primary, dst)
    assert again == {
        "generation": again["generation"],
        "segments": 0,
        "files": 0,
        "bytes": 0,
        "changed": False,
    }


def test_incremental_ships_only_deltas(primary, tmp_path):
    dst = str(tmp_path / "replica")
    first = replicate(primary, dst)
    victims = _docs(primary)[:4]
    delete_docs(primary, victims)
    soft_delete_docs(primary, _docs(primary)[-2:])
    inc = replicate(primary, dst)
    assert inc["changed"]
    # only the new livedocs/softdeletes generations + rewritten entry.json
    # move — a small fraction of the full revision
    assert inc["bytes"] < first["bytes"] / 4
    assert _docs(dst) == _docs(primary)


def test_crash_repair(primary, tmp_path):
    dst = str(tmp_path / "replica")
    replicate(primary, dst)
    # simulate a lost data file on the replica
    seg = sorted(glob.glob(os.path.join(dst, "segments", "*", "postings.parquet")))[0]
    os.remove(seg)
    # bump the primary so the generation differs (repair happens on the
    # next revision ship; same-generation is a declared no-op)
    delete_docs(primary, _docs(primary)[:1])
    replicate(primary, dst)
    assert os.path.exists(seg)
    assert _docs(dst) == _docs(primary)


def test_ray_task_path(primary, tmp_path, ray_session):
    dst = str(tmp_path / "replica_ray")
    stats = replicate(primary, dst, use_ray=True)
    assert stats["changed"]
    assert _docs(dst) == _docs(primary)
