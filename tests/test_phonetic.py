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


# ---- round-5: the remaining four encoders --------------------------------


def test_caverphone2_reference_vectors():
    """TestPhoneticFilter.testAlgorithms Caverphone2 row + the published
    spec's own examples (Hood, CTP150804)."""
    from lucene_ray.analysis.phonetic import caverphone2

    for w, want in [
        ("Darda", "TTA1111111"), ("Karleen", "KLN1111111"),
        ("Datha", "TTA1111111"), ("Carlene", "KLN1111111"),
        # spec examples
        ("Thompson", "TMPSN11111"), ("Stevenson", "STFNSN1111"),
        ("Peter", "PTA1111111"), ("", ""),
    ]:
        assert caverphone2(w) == want, (w, caverphone2(w))


def test_nysiis_reference_vectors():
    """TestPhoneticFilter.testAlgorithms Nysiis row + Taft canon."""
    from lucene_ray.analysis.phonetic import nysiis

    words = "aaa bbb ccc easgasg".split()
    assert [nysiis(w) for w in words] == ["A", "B", "C", "EASGAS"]
    for w, want in [
        ("MACINTOSH", "MCANT"), ("KNUTH", "NAT"), ("PHILLIPSON", "FALAPS"),
        ("BRIAN", "BRAN"), ("BROWN", "BRAN"), ("BRUN", "BRAN"),
        ("FERGUSON", "FARGAS"), ("JACKSON", "JACSAN"), ("", ""),
    ]:
        assert nysiis(w) == want, (w, nysiis(w))


def test_double_metaphone_reference_vectors():
    """TestDoubleMetaphoneFilter + TestPhoneticFilter DoubleMetaphone rows."""
    from lucene_ray.analysis.dmetaphone import double_metaphone as dm

    assert dm("international", 4) == ("ANTR", "ANTR")
    assert dm("international", 8) == ("ANTRNXNL", "ANTRNXNL")
    assert dm("Kuczewski", 4) == ("KSSK", "KXFS")
    assert dm("hello", 8) == ("HL", "HL")
    assert dm("12345", 8) == ("", "")  # non-convertable passes through
    assert dm("#$%@#^%&", 8) == ("", "")
    words = "aaa bbb ccc easgasg".split()
    assert [dm(w)[0] for w in words] == ["A", "PP", "KK", "ASKS"]


def test_double_metaphone_published_canon():
    """Philips' published branch pairs (the algorithm's own examples)."""
    from lucene_ray.analysis.dmetaphone import double_metaphone as dm

    for w, want in [
        ("smith", ("SM0", "XMT")), ("schmidt", ("XMT", "SMT")),
        ("snider", ("SNTR", "XNTR")), ("schneider", ("XNTR", "SNTR")),
        ("fisher", ("FXR", "FXR")), ("thumb", ("0M", "TM")),
        ("jose", ("HS", "HS")), ("michael", ("MKL", "MXL")),
        ("school", ("SKL", "SKL")), ("church", ("XRX", "XRK")),
        ("knight", ("NT", "NT")), ("wright", ("RT", "RT")),
        ("xavier", ("SF", "SFR")), ("cabrillo", ("KPRL", "KPR")),
        ("filipowicz", ("FLPT", "FLPF")), ("ghislane", ("JLN", "JLN")),
        ("gough", ("KF", "KF")), ("island", ("ALNT", "ALNT")),
        ("sugar", ("XKR", "SKR")), ("caesar", ("SSR", "SSR")),
    ]:
        assert dm(w) == want, (w, dm(w))


def test_dm_soundex_reference_vectors():
    """TestDaitchMokotoffSoundexFilter(+Factory) rows — value AND branch
    order are both pinned."""
    from lucene_ray.analysis.dmsoundex import dm_soundex as dms

    assert dms("aaa") == ("000000",)
    assert dms("bbb") == ("700000",)
    assert dms("ccc") == (
        "400000", "450000", "454000", "540000", "545000", "500000"
    )
    assert dms("easgasg") == ("045450",)
    assert dms("international") == ("063963",)
    assert dms("") == ()
    # chart-derivable examples
    assert dms("topf") == ("370000",)
    assert dms("mintz") == ("664000",)  # m/n same code, vowel-separated
    assert dms("mannheim") == ("665600",)  # adjacent nn folds
    assert dms("kleinmann") == ("586660",)  # nm -> 66 pattern


def test_dmetaphone_filter_token_order():
    """DoubleMetaphoneFilter inject semantics: original first, primary
    then alternate as posInc-0 twins; non-convertable pass through."""
    a = get_analyzer("phonetic_dmetaphone")
    assert a.tokenize_text("international") == ["international", "ANTR"]
    assert a.tokenize_text("kuczewski") == ["kuczewski", "KSSK", "KXFS"]
    assert a.tokenize_text("12345") == ["12345"]
    row, terms, pos = a.tokenize_flat(
        pa.array(["kuczewski called 12345"], type=pa.string())
    )[:3]
    assert terms.to_pylist() == [
        "kuczewski", "KSSK", "KXFS", "called", "KLT", "12345"
    ]
    assert pos.tolist() == [0, 0, 0, 1, 1, 2]
    assert a.has_overlaps


def test_dmsoundex_filter_token_order():
    """DaitchMokotoffSoundexFilter inject semantics: original first, all
    branch codes as posInc-0 twins in fork order."""
    a = get_analyzer("phonetic_dmsoundex")
    assert a.tokenize_text("ccc") == [
        "ccc", "400000", "450000", "454000", "540000", "545000", "500000"
    ]
    row, terms, pos = a.tokenize_flat(
        pa.array(["aaa easgasg"], type=pa.string())
    )[:3]
    assert terms.to_pylist() == ["aaa", "000000", "easgasg", "045450"]
    assert pos.tolist() == [0, 0, 1, 1]


def test_multi_phonetic_offsets_follow_original():
    """with_offsets: every twin inherits the original token's offsets
    (the filters restore saved state, changing only the term)."""
    a = get_analyzer("phonetic_dmetaphone")
    row, terms, pos, st, ln = a.tokenize_flat(
        pa.array(["smith kuczewski"], type=pa.string()), with_offsets=True
    )
    assert terms.to_pylist() == [
        "smith", "SM0", "XMT", "kuczewski", "KSSK", "KXFS"
    ]
    assert st.tolist() == [0, 0, 0, 6, 6, 6]
    assert ln.tolist() == [5, 5, 5, 9, 9, 9]


def test_index_and_search_by_dmetaphone_code(ray_session, tmp_path):
    """Alternate-code search: 'smith' and 'schmidt' docs share the XMT
    code (smith's alternate == schmidt's primary); overlap invariant
    holds through build + CheckIndex."""
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
                "content": ["smith forge", "schmidt forge", "nothing here"],
            }
        ),
        src,
    )
    ix = str(tmp_path / "ix")
    build_index([src], ix, analyzer_name="phonetic_dmetaphone")
    rep = check_index(ix)
    assert not rep.get("problems"), rep
    s = IndexSearcher(ix)
    td = s.search(BooleanQuery(must=[TermQuery("XMT")]), 10)
    assert sorted(td.docids.tolist()) == [0, 1]
    td2 = s.search(BooleanQuery(must=[TermQuery("smith")]), 10)
    assert td2.docids.tolist() == [0]


def test_encoders_never_throw_property():
    """checkRandomData analog (the reference runs every phonetic filter
    over random unicode): encoders accept anything, codes stay in their
    declared charsets, and the filter emission conditions hold."""
    from hypothesis import given, settings, strategies as st

    from lucene_ray.analysis.dmetaphone import double_metaphone
    from lucene_ray.analysis.dmsoundex import dm_soundex
    from lucene_ray.analysis.phonetic import caverphone2, nysiis

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=24))
    def prop(s):
        p, a = double_metaphone(s)
        assert set(p) <= set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0 ")
        assert len(p) <= 4 and len(a) <= 4
        for code in dm_soundex(s):
            assert len(code) == 6 and code.isdigit()
        cv = caverphone2(s)
        assert cv == "" or (
            len(cv) == 10 and set(cv) <= set("ABCDEFGHKLMNPRSTWY123")
        )
        ny = nysiis(s)
        assert len(ny) <= 6 and set(ny) <= set("ABCDEFGHIJKLMNOPQRSTUVWXYZ")

    prop()


def test_multi_phonetic_chain_property():
    """Random ascii-ish text through both multi-code chains: originals
    are preserved in order, twins only ever share positions."""
    from hypothesis import given, settings, strategies as st

    from lucene_ray.analysis import get_analyzer

    base = get_analyzer("code")
    dmet = get_analyzer("phonetic_dmetaphone")
    dms = get_analyzer("phonetic_dmsoundex")

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
    def prop(s):
        plain = base.tokenize_text(s)
        for an in (dmet, dms):
            toks = an.tokenize_text(s)
            # the original tokens appear as a subsequence, in order
            it = iter(toks)
            assert all(t in it for t in plain), (s, plain, toks)

    prop()
