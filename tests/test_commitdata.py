"""Commit user data (index/manifest.py set_live_commit_data —
IndexWriter.setLiveCommitData / IndexCommit.getUserData): publish,
carry-forward through merges and deletes, retained-history reads,
two-phase commit, split copies."""

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ix(ray_session, tmp_path):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import documents_as_corpus

    small = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pq.read_table(documents_as_corpus(SF)), small, row_group_size=64
    )
    out = str(tmp_path / "ix")
    build_index([small], out, target_docs=64)
    return out


def test_set_and_get(ix):
    from lucene_ray.index.manifest import (
        get_live_commit_data,
        read_manifest,
        set_live_commit_data,
    )

    assert get_live_commit_data(ix) is None
    g0 = read_manifest(ix).generation
    m = set_live_commit_data(ix, {"max_seq_no": "417", "source": "unit"})
    assert m.generation == g0 + 1
    assert get_live_commit_data(ix) == {"max_seq_no": "417", "source": "unit"}
    # retained history: the previous commit still reads WITHOUT data
    assert get_live_commit_data(ix, generation=g0) is None
    # replace
    set_live_commit_data(ix, {"max_seq_no": "500"})
    assert get_live_commit_data(ix) == {"max_seq_no": "500"}


def test_carries_through_merge_and_deletes(ix):
    from lucene_ray.index.manifest import (
        get_live_commit_data,
        set_live_commit_data,
    )
    from lucene_ray.index.merge import TieredMergePolicy, maybe_merge
    from lucene_ray.index.writer import delete_docs

    set_live_commit_data(ix, {"ckpt": "a"})
    maybe_merge(ix, TieredMergePolicy(), use_ray=False)
    assert get_live_commit_data(ix) == {"ckpt": "a"}
    delete_docs(ix, [1, 2])
    assert get_live_commit_data(ix) == {"ckpt": "a"}


def test_split_copies_user_data(ix, tmp_path):
    from lucene_ray.index.manifest import (
        get_live_commit_data,
        read_manifest,
        set_live_commit_data,
    )
    from lucene_ray.index.split import split_index

    set_live_commit_data(ix, {"origin": "src"})
    names = [e.name for e in read_manifest(ix).live_segments[:2]]
    dest = str(tmp_path / "out")
    split_index(ix, dest, names)
    assert get_live_commit_data(dest) == {"origin": "src"}


def test_two_phase_commit_preserves_user_data(ix):
    import dataclasses

    from lucene_ray.index.manifest import (
        commit_prepared,
        get_live_commit_data,
        prepare_commit,
        read_manifest,
    )

    m = read_manifest(ix)
    staged = dataclasses.replace(
        m, generation=m.generation + 1, user_data={"staged": "yes"}
    )
    prepare_commit(ix, staged)
    assert get_live_commit_data(ix) is None  # not visible until commit
    commit_prepared(ix)
    assert get_live_commit_data(ix) == {"staged": "yes"}
