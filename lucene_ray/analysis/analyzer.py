"""Analyzers: vectorized tokenization over Arrow string arrays.

The reference's analysis chain (SURVEY.md §2.2) is CharFilter* -> Tokenizer ->
TokenFilter* pulled token-at-a-time (lucene/core/.../analysis/TokenStream.java).
Here the whole chain is a *vectorized batch function* over a pyarrow
StringArray, built from RE2 kernels (``pyarrow.compute`` uses RE2 — the same
regex engine as DuckDB), so the DuckDB oracle SQL produced by
:func:`tokenize_sql_expr` tokenizes **identically** to the engine.

Two analyzers:

``CodeAnalyzer`` (default for the index — the north star's
"StandardAnalyzer-equivalent with code-aware splitting"):
  1. split case transitions  ``fooBar -> foo Bar``, ``XMLHttp -> XML Http``
     (WordDelimiterGraphFilter SPLIT_ON_CASE_CHANGE semantics,
     lucene/analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java:95-146)
  2. split letter<->digit transitions ``SD500 -> SD 500``
     (SPLIT_ON_NUMERICS semantics, same file)
  3. lowercase (analysis/LowerCaseFilter.java:23)
  4. split on non-alphanumeric runs ``[^a-z0-9]+`` (snake_case splits here;
     StandardTokenizer-like word-break reduced to the ASCII ALPHANUM/NUM rules
     that fire on source code — SURVEY.md §7.4 item 2)
  5. drop empty tokens and tokens longer than 255 chars
     (maxTokenLength, analysis/standard/StandardAnalyzer.java:37; divergence:
     Lucene *splits* over-long tokens at the buffer boundary, we drop them)

``StandardLiteAnalyzer`` — closer to pure UAX#29 (keeps ``don't``, ``3.14``,
``SD500`` whole); used for golden-token conformance tests mirroring
TestStandardAnalyzer cases; not SQL-mirrored.

Scale notes: tokenization is a pure stateless ``map_batches`` stage —
zero-copy Arrow in, RE2 C++ kernels, no Python-per-row work in the
CodeAnalyzer path. Regexes are module-level constants (no per-batch compile).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.config import MAX_TOKEN_LEN

# (pattern, replacement) passes, applied in order. RE2-safe: no lookaround,
# backrefs \1 \2 valid in both pyarrow and DuckDB regexp_replace.
_SPLIT_PASSES: list[tuple[str, str]] = [
    (r"([a-z])([A-Z])", r"\1 \2"),        # camelCase
    (r"([A-Z])([A-Z][a-z])", r"\1 \2"),   # ACRONYMTail -> ACRONYM Tail
    (r"([A-Za-z])([0-9])", r"\1 \2"),     # letter->digit
    (r"([0-9])([A-Za-z])", r"\1 \2"),     # digit->letter
]

_SEP_PATTERN = r"[^a-z0-9]+"


def _filter_list_array(tokens: pa.ListArray, keep: np.ndarray) -> pa.ListArray:
    """Rebuild a list<string> array keeping only flattened elements where
    ``keep`` is True (preserving per-list order)."""
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # kept count per list via prefix sums of the keep mask
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    new_offsets = csum[offsets]
    values = tokens.values.filter(pa.array(keep))
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), values)


class CodeAnalyzer:
    """Stateless, vectorized code-aware analyzer (see module docstring)."""

    name = "code"

    def tokenize_array(self, texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
        """StringArray -> ListArray<string> of analyzed tokens per row."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s = texts
        for pat, repl in _SPLIT_PASSES:
            s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
        s = pc.utf8_lower(s)
        toks = pc.split_pattern_regex(s, pattern=_SEP_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.utf8_length(toks.values).to_numpy(zero_copy_only=False)
        keep = (lengths > 0) & (lengths <= MAX_TOKEN_LEN)
        if bool(keep.all()):
            return toks
        return _filter_list_array(toks, keep)

    def tokenize_flat(
        self, texts: pa.Array | pa.ChunkedArray
    ) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        """StringArray -> (row_index int64, term string, position int32).

        ``position`` is the 0-based token ordinal within its row (post-filter;
        no stopwords in the default chain, so position increments are all 1 —
        StandardAnalyzer's default stop set is empty,
        analysis/standard/StandardAnalyzer.java:34-38).
        """
        toks = self.tokenize_array(texts)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        total = int(counts.sum())
        positions = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
        return row_idx, toks.values, positions.astype(np.int32)

    def tokenize_text(self, text: str) -> list[str]:
        """Single-string convenience (tests, query parsing)."""
        return self.tokenize_array(pa.array([text], type=pa.string()))[0].as_py()


def tokenize_sql_expr(col: str) -> str:
    """DuckDB SQL expression producing exactly CodeAnalyzer's token list.

    Used to build oracle_sql() strings that are tokenization-identical to the
    Ray engine (both sides run RE2).
    """
    expr = col
    for pat, repl in _SPLIT_PASSES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    expr = f"lower({expr})"
    expr = f"string_split_regex({expr}, '{_SEP_PATTERN}')"
    expr = (
        f"list_filter({expr}, t -> t <> '' AND length(t) <= {MAX_TOKEN_LEN})"
    )
    return expr


# UAX#29-lite token pattern: ALPHANUM runs with medial apostrophe between
# letters and medial [.,] between digits (StandardTokenizerImpl.jflex:23-92
# ALPHANUM/NUM rules, ASCII subset).
_STD_TOKEN_RE = re.compile(
    r"[A-Za-z0-9]+(?:'[A-Za-z]+|[.,][0-9]+)*"
)


class StandardLiteAnalyzer:
    """UAX#29-lite analyzer (keeps ``don't``/``3.14``/``SD500`` whole),
    lowercased. Python-regex based; used for conformance tests only."""

    name = "standard"

    def tokenize_text(self, text: str) -> list[str]:
        return [
            t.lower() for t in _STD_TOKEN_RE.findall(text) if len(t) <= MAX_TOKEN_LEN
        ]

    def tokenize_array(self, texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
        pylist = texts.to_pylist()
        return pa.array(
            [self.tokenize_text(t or "") for t in pylist],
            type=pa.list_(pa.string()),
        )


_REGISTRY = {
    "code": CodeAnalyzer,
    "standard": StandardLiteAnalyzer,
}


def get_analyzer(name: str = "code"):
    """Analyzer registry — the extension surface mirroring Lucene's
    TokenizerFactory SPI (analysis/TokenizerFactory.java)."""
    return _REGISTRY[name]()
