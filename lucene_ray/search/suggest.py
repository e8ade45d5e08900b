"""Spell-check term suggester — the suggest module's core
(suggest/.../spell/DirectSpellChecker.java): candidate terms within a
Levenshtein budget of the input, ranked by (edit distance asc, doc freq
desc, term asc). The Levenshtein-automaton-vs-FST intersection becomes the
banded-DP scan over the (content) vocabulary that FuzzyQuery already uses —
vocab-sized work, never postings-sized.
"""

from __future__ import annotations

from lucene_ray.search.query import FuzzyQuery


def suggest_terms(
    reader,
    term: str,
    k: int = 5,
    max_edits: int = 2,
    include_exact: bool = False,
) -> list[tuple[str, int, int]]:
    """Top-k (term, distance, df) suggestions for ``term`` from the index
    vocabulary. ``include_exact=False`` drops the input itself when it is a
    dictionary word (DirectSpellChecker's suggestMode semantics)."""
    from lucene_ray.search.rewrite import expand_fuzzy_with_distance

    vocab = reader.vocabulary()
    pairs = expand_fuzzy_with_distance(vocab, FuzzyQuery(term, max_edits=max_edits))
    if not include_exact:
        pairs = [(t, d) for t, d in pairs if t != term]
    if not pairs:
        return []
    stats = reader.global_term_stats([t for t, _d in pairs])
    scored = sorted((d, -stats[t][0], t) for t, d in pairs)
    return [(t, d, -neg_df) for d, neg_df, t in scored[:k]]


def complete_terms(reader, prefix: str, k: int = 10) -> list[tuple[str, int]]:
    """Top-k (term, df) prefix completions from the term dictionary — the
    suggest module's Lookup role (suggest/Lookup.java:192 lookup(key, n);
    the FST prefix traversal of suggest/analyzing/AnalyzingSuggester
    becomes the sorted-vocab binary-search window PrefixQuery rewriting
    uses), ranked by (docFreq desc, term asc)."""
    from lucene_ray.search.query import PrefixQuery
    from lucene_ray.search.rewrite import expand_prefix

    cands = expand_prefix(reader.vocabulary(), PrefixQuery(prefix))
    if not cands:
        return []
    stats = reader.global_term_stats(cands)
    scored = sorted((-stats[t][0], t) for t in cands)
    return [(t, -neg_df) for neg_df, t in scored[:k]]


def infix_terms(reader, fragment: str, k: int = 10) -> list[tuple[str, int]]:
    """Top-k (term, df) suggestions CONTAINING ``fragment`` anywhere — the
    infix Lookup (suggest/.../analyzing/AnalyzingInfixSuggester.java:97:
    its internal per-suggestion index with prefix+infix matching becomes a
    substring scan over the sorted vocabulary — vocab-sized work, never
    postings-sized), ranked (docFreq desc, term asc) like complete_terms."""
    import numpy as np

    vocab = reader.vocabulary()
    if len(vocab) == 0:
        return []
    hit = np.char.find(vocab.astype(str), fragment) >= 0
    cands = [str(t) for t in vocab[hit]]
    if not cands:
        return []
    stats = reader.global_term_stats(cands)
    scored = sorted((-stats[t][0], t) for t in cands)
    return [(t, -neg_df) for neg_df, t in scored[:k]]


def word_breaks(reader, term: str, k: int = 10) -> list[tuple[str, str, int]]:
    """Top-k (left, right, df_sum) two-word breaks of an out-of-vocabulary
    token — WordBreakSpellChecker.suggestWordBreaks
    (suggest/.../spell/WordBreakSpellChecker.java:50): every split point
    whose halves BOTH exist in the term dictionary, ranked by combined
    docFreq desc then (left, right) asc (the reference ranks by change
    count then freq; with one split the change count is constant —
    documented)."""
    vocab = set(map(str, reader.vocabulary()))
    cands = [
        (term[:i], term[i:])
        for i in range(1, len(term))
        if term[:i] in vocab and term[i:] in vocab
    ]
    if not cands:
        return []
    stats = reader.global_term_stats(sorted({t for p in cands for t in p}))
    scored = sorted(
        (-(stats[a][0] + stats[b][0]), a, b) for a, b in cands
    )
    return [(a, b, -neg) for neg, a, b in scored[:k]]
