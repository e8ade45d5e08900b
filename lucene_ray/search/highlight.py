"""Snippet highlighting by re-analysis — the classic Highlighter strategy
(highlighter/.../highlight/Highlighter.java + QueryTermExtractor): postings
carry no offsets in this format (like Lucene without
IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS), so display-time
highlighting re-tokenizes the STORED text and recovers character offsets.
Display-path only: runs per returned hit, never per corpus row.

Offset recovery relies on the analyzer-kernel invariant (analyzer.py): the
split passes only INSERT boundaries, never change characters — so every
token is a sub-run of an ``[A-Za-z0-9]+`` run of the original text, split at
case/digit transitions, lowercased. ``token_spans`` re-derives (term, start,
end) per doc with plain python (one doc at a time, display path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_RUN_RE = re.compile(r"[A-Za-z0-9]+")
# case/digit boundaries, same rules as the index kernel (r1, r2, r3, r4)
_BOUNDARY_RE = re.compile(
    r"(?<=[a-z])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"
)


def token_spans(text: str, max_token_len: int = 255) -> list[tuple[str, int, int]]:
    """(lowercased token, char start, char end) for every analyzed token of
    ``text``, in order — byte-kernel-equivalent offsets."""
    out = []
    for m in _RUN_RE.finditer(text):
        run = m.group(0)
        base = m.start()
        prev = 0
        for b in _BOUNDARY_RE.finditer(run):
            piece = run[prev : b.start()]
            if piece and len(piece) <= max_token_len:
                out.append((piece.lower(), base + prev, base + b.start()))
            prev = b.start()
        piece = run[prev:]
        if piece and len(piece) <= max_token_len:
            out.append((piece.lower(), base + prev, base + len(run)))
    return out


@dataclass
class Fragment:
    text: str
    score: int  # number of highlighted term occurrences
    start: int


def highlight(
    text: str,
    query_terms,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    fragment_chars: int = 100,
    max_fragments: int = 3,
) -> list[str]:
    """Best-scoring highlighted fragments of ``text`` for the (analyzed)
    ``query_terms``. Fragments are windows of ~fragment_chars centred on
    matches, ranked by match count then position, non-overlapping."""
    terms = set(query_terms)
    spans = [(t, s, e) for t, s, e in token_spans(text) if t in terms]
    if not spans:
        return []

    frags: list[Fragment] = []
    used: list[tuple[int, int]] = []
    covered_upto = -1
    for _, s, _e in spans:
        if s <= covered_upto:
            continue  # this occurrence already sits inside a fragment
        w0 = max(0, s - fragment_chars // 2)
        # don't overlap earlier fragments: clamp the window start forward
        # instead of dropping the match (a hit just past a fragment edge
        # must still get its own fragment)
        for a, b in used:
            if w0 < b and s >= b:
                w0 = b
        w1 = min(len(text), w0 + fragment_chars)
        if any(not (w1 <= a or w0 >= b) for a, b in used):
            continue
        inside = [(t, ts, te) for t, ts, te in spans if w0 <= ts and te <= w1]
        if not inside:
            continue
        # build the marked-up fragment
        parts = []
        cur = w0
        for _t, ts, te in inside:
            parts.append(text[cur:ts])
            parts.append(pre_tag + text[ts:te] + post_tag)
            cur = te
        parts.append(text[cur:w1])
        frags.append(Fragment("".join(parts), len(inside), w0))
        used.append((w0, w1))
        covered_upto = max(covered_upto, w1 - 1)

    frags.sort(key=lambda f: (-f.score, f.start))
    return [f.text for f in frags[:max_fragments]]


def highlight_hits(
    searcher,
    query: str,
    k: int = 10,
    **kwargs,
) -> list[dict]:
    """Search + fetch stored content + highlight — the SearchFiles demo loop
    (demo/.../SearchFiles.java) with snippets."""
    from lucene_ray.search.engine import fetch_stored, query_terms

    bq = searcher.parse(query)
    bq = searcher._maybe_rewrite(bq)
    terms = query_terms(bq)
    td = searcher.search(bq, k)
    if len(td.docids) == 0:
        return []
    stored = fetch_stored(searcher.reader, td.docids)
    out = []
    has_content = "content" in stored.column_names
    for i, (d, s) in enumerate(zip(td.docids, td.scores)):
        row = {"docid": int(d), "score": float(s)}
        if has_content:
            row["fragments"] = highlight(
                stored.column("content")[i].as_py() or "", terms, **kwargs
            )
        out.append(row)
    return out
