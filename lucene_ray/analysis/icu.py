"""ICU normalization (lite) — the ICUNormalizer2Filter default mode
(analysis/icu/src/java/.../ICUNormalizer2Filter.java: nfkc_cf).

Unicode's NFKC_Casefold (UAX #31 / UCD NFKC_CF property) is implemented
from its definition — remove Default_Ignorable_Code_Points, then iterate
NFKC(casefold(.)) to a fixed point — using Python's unicodedata NFKC and
str.casefold (full case folding, C+F). The Default_Ignorable set below
is the published UCD PropList ranges (DerivedCoreProperties.txt,
Default_Ignorable_Code_Point), embedded as DATA like the stop lists.

This is a LITE stance, documented: the real ICU filter is table-driven
from the UCD's precomputed NFKC_CF mappings; the remove+fixpoint
composition reproduces it on the reference's own test vectors
(TestICUNormalizer2Filter — tests/test_icu.py) and is idempotent by
construction. ICU transforms/collation and the tailored break iterators
remain out of scope.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# UCD DerivedCoreProperties.txt: Default_Ignorable_Code_Point (published
# ranges, inclusive)
DEFAULT_IGNORABLE_RANGES = (
    (0x00AD, 0x00AD),   # SOFT HYPHEN
    (0x034F, 0x034F),   # COMBINING GRAPHEME JOINER
    (0x061C, 0x061C),   # ARABIC LETTER MARK
    (0x115F, 0x1160),   # HANGUL FILLERS
    (0x17B4, 0x17B5),   # KHMER INHERENT VOWELS
    (0x180B, 0x180D),   # MONGOLIAN FREE VARIATION SELECTORS
    (0x180E, 0x180E),   # MONGOLIAN VOWEL SEPARATOR
    (0x180F, 0x180F),   # MONGOLIAN FVS4
    (0x200B, 0x200F),   # ZWSP..RLM
    (0x202A, 0x202E),   # embedding/override controls
    (0x2060, 0x2064),   # WORD JOINER..INVISIBLE PLUS
    (0x2065, 0x2069),   # reserved + isolate controls
    (0x206A, 0x206F),   # deprecated format controls
    (0x3164, 0x3164),   # HANGUL FILLER
    (0xFE00, 0xFE0F),   # VARIATION SELECTORS
    (0xFEFF, 0xFEFF),   # ZERO WIDTH NO-BREAK SPACE
    (0xFFA0, 0xFFA0),   # HALFWIDTH HANGUL FILLER
    (0xFFF0, 0xFFF8),   # reserved
    (0x1BCA0, 0x1BCA3),  # SHORTHAND FORMAT CONTROLS
    (0x1D173, 0x1D17A),  # MUSICAL SYMBOL controls
    (0xE0000, 0xE0FFF),  # TAGS + reserved plane-14
)


def _is_default_ignorable(cp: int) -> bool:
    for lo, hi in DEFAULT_IGNORABLE_RANGES:
        if lo <= cp <= hi:
            return True
    return False


@lru_cache(maxsize=65536)
def nfkc_cf(s: str) -> str:
    """NFKC_Casefold: strip Default_Ignorables, then NFKC(casefold(.))
    to a fixed point (casefolding can expose new compatibility
    compositions; the loop converges in <= 4 steps on all of Unicode)."""
    s = "".join(ch for ch in s if not _is_default_ignorable(ord(ch)))
    prev = None
    while s != prev:
        prev = s
        s = unicodedata.normalize("NFKC", s.casefold())
    return s


def nfkc_cf_terms(terms):
    """Arrow token array -> normalized tokens (unique-value work only)."""
    import numpy as np
    import pyarrow as pa

    d = (
        terms.dictionary_encode()
        if not isinstance(terms, pa.DictionaryArray)
        else terms
    )
    vocab = d.dictionary.to_pylist()
    normed = [nfkc_cf(t) for t in vocab]
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.array(normed, dtype=object)[idx]
    return pa.array(out.tolist(), type=pa.string())
