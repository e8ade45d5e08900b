"""CJKWidthFilter fold — re-expressed from cjk/CJKWidthFilter.java:30-95
as spec: fullwidth-ASCII variants (FF01-FF5E) fold to ASCII, halfwidth
katakana (FF65-FF9D) to standard katakana, and a halfwidth voice mark
(FF9E dakuten / FF9F handakuten) COMBINES into the preceding katakana
when that kana has a voiced form (the KANA_COMBINE tables); an
uncombinable mark falls back to the combining chars U+3099/U+309A.

The three stages below (translate, literal pair replaces, mark translate)
reproduce the reference's single left-to-right pass exactly: the pair
replaces are left-to-right non-overlapping, so chained marks behave the
same (first combines, second falls through). The SQL mirror runs the
identical three stages (DuckDB translate + replace chain).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# FF65-FF9D -> standard katakana (KANA_NORM[:57]; FF9E/FF9F handled last)
_KANA_HALF = "･ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_KANA_FULL = "・ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"

# kana that take a dakuten (KANA_COMBINE_VOICED nonzero entries)
_VOICED_PAIRS = tuple(
    zip(
        "ウカキクケコサシスセソタチツテトハヒフヘホワヰヱヲヽ",
        "ヴガギグゲゴザジズゼゾダヂヅデドバビブベボヷヸヹヺヾ",
    )
)
# kana that take a handakuten (KANA_COMBINE_HALF_VOICED nonzero entries)
_HALF_VOICED_PAIRS = tuple(zip("ハヒフヘホ", "パピプペポ"))

_FW_FROM = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + _KANA_HALF
_FW_TO = "".join(chr(c) for c in range(0x21, 0x7F)) + _KANA_FULL
_FW_TRANS = str.maketrans(_FW_FROM, _FW_TO)
_MARK_TRANS = str.maketrans("ﾞﾟ", "゙゚")

_NEEDS_FOLD_RE = r"[\x{FF01}-\x{FF9F}]"


def fold_text(t: str) -> str:
    t = t.translate(_FW_TRANS)
    if "ﾞ" in t or "ﾟ" in t:
        for kana, voiced in _VOICED_PAIRS:
            t = t.replace(kana + "ﾞ", voiced)
        for kana, voiced in _HALF_VOICED_PAIRS:
            t = t.replace(kana + "ﾟ", voiced)
        t = t.translate(_MARK_TRANS)
    return t


def fold_array(texts: pa.Array) -> pa.Array:
    """Width-fold only the rows that contain chars in the fold range
    (vector scan first — the common corpus row is untouched zero-copy)."""
    need = pc.match_substring_regex(texts, _NEEDS_FOLD_RE)
    if not pc.any(need).as_py():
        return texts
    flags = need.to_numpy(zero_copy_only=False)
    out = texts.to_pylist()
    for i, hit in enumerate(flags):
        if hit and out[i] is not None:
            out[i] = fold_text(out[i])
    return pa.array(out, type=texts.type)


def sql_fold(col: str) -> str:
    """DuckDB mirror: translate + literal replace chain + mark translate
    (same three stages, same left-to-right non-overlap semantics)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = f"translate({col}, '{q(_FW_FROM)}', '{q(_FW_TO)}')"
    for kana, voiced in _VOICED_PAIRS:
        expr = f"replace({expr}, '{kana}ﾞ', '{voiced}')"
    for kana, voiced in _HALF_VOICED_PAIRS:
        expr = f"replace({expr}, '{kana}ﾟ', '{voiced}')"
    return f"translate({expr}, 'ﾞﾟ', '゙゚')"
