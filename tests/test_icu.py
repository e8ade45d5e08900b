"""ICU normalization lite (analysis/icu.py nfkc_cf +
ICUNormalizeAnalyzer): the reference's own TestICUNormalizer2Filter
vectors, default-ignorable removal, idempotence."""

import random
import unicodedata

import pyarrow as pa

from lucene_ray.analysis import get_analyzer
from lucene_ray.analysis.icu import nfkc_cf, nfkc_cf_terms


def test_reference_vectors():
    """TestICUNormalizer2Filter.java:50-68 — the nfkc_cf defaults. The
    reference test drives the filter through MockTokenizer.WHITESPACE, so
    the vector check applies nfkc_cf to whitespace tokens (the registry
    analyzer's UAX#29 tokenizer would split the Indic virama+ZWJ cluster
    BEFORE the filter sees it — a tokenizer difference, not a filter one)."""
    cases = [
        ("This is a test", ["this", "is", "a", "test"]),
        ("Ruß", ["russ"]),
        ("ΜΆΪΟΣ", ["μάϊοσ"]),
        ("Μάϊος", ["μάϊοσ"]),
        ("𐐖", ["𐐾"]),
        ("ﴳﴺﰧ", ["طمطمطم"]),
        ("क्‍ष", ["क्ष"]),  # removal of default ignorables (ZWJ)
    ]
    for text, want in cases:
        assert [nfkc_cf(t) for t in text.split()] == want, text
    # the registry analyzer chain end-to-end on tokenizer-neutral input
    a = get_analyzer("icu_normalize")
    assert a.tokenize_text("This is a ΜΆΪΟΣ ﬁx") == [
        "this", "is", "a", "μάϊοσ", "fix",
    ]


def test_default_ignorable_removal():
    assert nfkc_cf("a­b") == "ab"          # soft hyphen
    assert nfkc_cf("a​‌‍b") == "ab"
    assert nfkc_cf("﻿") == ""              # BOM/ZWNBSP
    assert nfkc_cf("a\U000E0041b") == "ab"      # plane-14 tag
    assert nfkc_cf("️") == ""              # variation selector


def test_casefold_and_compat():
    assert nfkc_cf("ﬁ") == "fi"                 # compat ligature
    assert nfkc_cf("²") == "2"
    assert nfkc_cf("İ") == "i̇"            # full case folding
    assert nfkc_cf("ǅ") == "dž"


def test_idempotent_on_random_unicode():
    rng = random.Random(17)
    pool = (
        list(range(0x20, 0x250))
        + list(range(0x370, 0x400))
        + list(range(0x1E00, 0x1F00))
        + list(range(0xFB00, 0xFB10))
        + [0x00AD, 0x200D, 0xFE0F, 0x1D173]
    )
    for _ in range(300):
        s = "".join(chr(rng.choice(pool)) for _ in range(rng.randint(0, 12)))
        once = nfkc_cf(s)
        assert nfkc_cf(once) == once
        assert unicodedata.normalize("NFKC", once) == once


def test_terms_gather_and_empty_token_drop():
    terms = pa.array(["Ruß", "‍", "ﬁx", "Ruß"])
    assert nfkc_cf_terms(terms).to_pylist() == ["russ", "", "fix", "russ"]
    a = get_analyzer("icu_normalize")
    out = a.tokenize_array(pa.array(["Ruß ⁠ fix"]))
    # the pure-ignorable token normalizes to empty and is dropped
    assert out.to_pylist() == [["russ", "fix"]]
