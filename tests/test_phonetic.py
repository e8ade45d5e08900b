"""Phonetic encoders + PhoneticFilter inject chains
(analysis/phonetic.py — analysis/phonetic/.../PhoneticFilter.java):
reference vectors, canonical published examples, inject ordering,
overlap accounting through a real index."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.analysis.phonetic import metaphone, soundex


def test_reference_module_vectors():
    """TestPhoneticFilter.testAlgorithms — the Metaphone/Soundex rows."""
    words = "aaa bbb ccc easgasg".split()
    assert [metaphone(w) for w in words] == ["A", "B", "KKK", "ESKS"]
    assert [soundex(w) for w in words] == ["A000", "B000", "C000", "E220"]


def test_soundex_nara_canon():
    for w, want in [
        ("Robert", "R163"), ("Rupert", "R163"),
        ("Ashcraft", "A261"), ("Ashcroft", "A261"),  # the H/W rule
        ("Tymczak", "T522"), ("Pfister", "P236"), ("Honeyman", "H555"),
        ("Washington", "W252"), ("", ""),
    ]:
        assert soundex(w) == want, (w, soundex(w))


def test_metaphone_published_canon():
    got = [
        metaphone(w)
        for w in "The quick brown fox jumped over the lazy dogs".split()
    ]
    assert got == ["0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS", "TKS"]
    for w, want in [
        ("testing", "TSTN"), ("metaphone", "MTFN"), ("church", "XRX"),
        ("school", "SKL"), ("knight", "NT"), ("wright", "RT"),
        ("phone", "FN"), ("xylophone", "SLFN"), ("thumb", "0M"),
        ("judge", "JJ"), ("ration", "RXN"), ("a", "A"), ("", ""),
    ]:
        assert metaphone(w) == want, (w, metaphone(w))


def test_refined_soundex():
    from lucene_ray.analysis.phonetic import refined_soundex

    # TestPhoneticFilter's RefinedSoundex row
    words = "aaa bbb ccc easgasg".split()
    assert [refined_soundex(w) for w in words] == ["A0", "B1", "C3", "E034034"]
    # commons-codec javadoc example
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("") == ""


def test_inject_order_and_identity_passthrough():
    a = get_analyzer("phonetic_metaphone")
    # phonetic first, original second (PhoneticFilter emits encoded first)
    assert a.tokenize_text("brown fox") == ["BRN", "brown", "FKS", "fox"]
    # "b" encodes to "B" != "b" -> still injected (case differs)
    assert a.tokenize_text("b") == ["B", "b"]


def test_flat_stream_positions_mark_overlaps():
    a = get_analyzer("phonetic_soundex")
    row_idx, terms, positions = a.tokenize_flat(
        pa.array(["robert rupert"], type=pa.string())
    )[:3]
    assert terms.to_pylist() == ["R163", "robert", "R163", "rupert"]
    assert positions.tolist() == [0, 0, 1, 1]  # twins share the position
    assert a.has_overlaps


def test_index_and_search_by_code(ray_session, tmp_path):
    """Both 'robert' and 'rupert' docs match a soundex-code TermQuery;
    CheckIndex's overlap invariant holds for the injected twins."""
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.checkindex import check_index
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery, TermQuery

    src = str(tmp_path / "c.parquet")
    pa.parquet.write_table(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a", "b", "c"],
                "commit": ["0" * 40] * 3,
                "lang": ["en"] * 3,
                "content": ["robert called", "rupert called", "nothing here"],
            }
        ),
        src,
    )
    ix = str(tmp_path / "ix")
    build_index([src], ix, analyzer_name="phonetic_soundex")
    rep = check_index(ix)
    assert not rep.get("problems"), rep
    s = IndexSearcher(ix)
    td = s.search(BooleanQuery(must=[TermQuery("R163")]), 10)
    assert sorted(td.docids.tolist()) == [0, 1]
    # originals still searchable
    td2 = s.search(BooleanQuery(must=[TermQuery("robert")]), 10)
    assert td2.docids.tolist() == [0]
