"""SimpleQueryParser (queryparser/simple/SimpleQueryParser.java): the
lenient end-user syntax — ``+`` AND, ``|`` OR, ``-`` NOT, ``"..."`` phrase
(``~N`` slop), trailing ``*`` prefix, ``(...)`` precedence, ``~N`` fuzzy,
``\\`` escape, whitespace as the (configurable) default operator. The
parser NEVER raises on malformed input: unmatched ``(`` / ``"`` degrade to
plain text, extraneous ``)`` is skipped, double negation cancels —
byte-for-byte the reference's recovery rules (parseSubQuery /
consumePhrase / consumeToken / buildQueryTree state machine,
SimpleQueryParser.java:177-494).

Output is an engine-ready BooleanQuery over the default analyzed field;
nested levels freeze into NestedBooleanQuery clauses. The reference's
per-field ``weights`` map collapses to the single content field (the
engine's multi-field variant is CombinedFieldQuery — see bm25docs
combinedfield gates).
"""

from __future__ import annotations

from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NestedBooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

# feature flags (SimpleQueryParser.java:111-138)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WS = (" ", "\t", "\n", "\r")

MUST = "must"
SHOULD = "should"


class _State:
    __slots__ = ("data", "index", "length", "top", "top_occur", "current", "previous", "not_")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top = None          # leaf query, or list of clauses when top_occur set
        self.top_occur = None    # occur shared by the clause list (addClause model)
        self.current = None      # currentOperation
        self.previous = None     # previousOperation
        self.not_ = 0


class SimpleQueryParser:
    """parse(text) -> BooleanQuery (never raises)."""

    def __init__(self, analyzer, flags: int = ALL_OPERATORS,
                 default_operator: str = SHOULD):
        if default_operator not in (MUST, SHOULD):
            raise ValueError("default_operator must be 'must' or 'should'")
        self.analyzer = analyzer
        self.flags = flags
        self.default_operator = default_operator

    # -------------------------------------------------------------- public
    def parse(self, text: str) -> BooleanQuery:
        if text.strip() == "*":
            return BooleanQuery(should=[MatchAllDocsQuery()])
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        top = self._finish(state)
        if top is None:
            return BooleanQuery()  # MatchNoDocsQuery: empty boolean matches nothing
        if isinstance(top, BooleanQuery):
            return top
        return BooleanQuery(should=[top])

    # ------------------------------------------------------- state machine
    def _parse_sub(self, state: _State) -> None:
        f = self.flags
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous, ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and f & AND_OPERATOR:
                if state.current is None and state.top is not None:
                    state.current = MUST
                state.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if state.current is None and state.top is not None:
                    state.current = SHOULD
                state.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                state.not_ += 1
                state.index += 1
                continue  # keep the not count across the next dispatch
            elif c in _WS and f & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_subquery(self, state: _State) -> None:
        start = state.index = state.index + 1
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing ')': '(' is extraneous
        elif state.index == start:
            state.current = None  # '()' resets the pending operation
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, self._finish_branch(sub))
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        start = state.index = state.index + 1
        buf = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and self.flags & NEAR_OPERATOR):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing '"': degrade to plain text
        elif state.index == start:
            state.current = None  # '""' resets the pending operation
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        buf = []
        escaped = False
        prefix = False
        fuzzy = False
        f = self.flags
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and f & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and bool(f & PREFIX_OPERATOR)
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if not buf:
            return
        token = "".join(buf)
        if fuzzy:
            edits = min(self._parse_fuzziness(state), _MAX_EDITS)
            if edits == 0:
                branch = self._new_default_query(token)
            else:
                branch = self._new_fuzzy_query(token, edits)
        elif prefix:
            branch = self._new_prefix_query(token[:-1])
        else:
            branch = self._new_default_query(token)
        self._build_tree(state, branch)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        f = self.flags
        return (
            (c == '"' and bool(f & PHRASE_OPERATOR))
            or (c == "|" and bool(f & OR_OPERATOR))
            or (c == "+" and bool(f & AND_OPERATOR))
            or (c in "()" and bool(f & PRECEDENCE_OPERATORS))
            or (c in _WS and bool(f & WHITESPACE_OPERATOR))
        )

    def _parse_fuzziness(self, state: _State) -> int:
        """SimpleQueryParser.parseFuzziness:495 — digits after '~';
        empty -> 2, unparsable -> 0, negative -> 0."""
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        buf = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(state.data[state.index])
        try:
            val = int("".join(buf)) if buf else 2
        except ValueError:
            return 0
        return max(val, 0)

    # ------------------------------------------------------- tree building
    def _build_tree(self, state: _State, branch) -> None:
        if branch is None:
            return
        if state.not_ % 2 == 1:
            # -(x) == (NOT x AND match-all), one clause of the enclosing tree
            branch = NestedBooleanQuery(
                should=(MatchAllDocsQuery(),), must_not=(branch,)
            )
        if state.top is None:
            state.top = branch
            state.top_occur = None
        else:
            if state.current is None:
                state.current = self.default_operator
            if state.previous != state.current or state.top_occur is None:
                # operation change: current top becomes ONE clause of a new
                # parent (buildQueryTree:473-478)
                state.top = [self._as_clause(state.top, state.top_occur)]
                state.top_occur = state.current
            state.top.append(self._as_clause(branch, None))
            state.previous = state.current
        state.current = None

    def _as_clause(self, node, occur):
        """Collapse a clause list back into one query object."""
        if isinstance(node, list):
            bq = BooleanQuery()
            getattr(bq, occur).extend(node)
            return bq.freeze()
        return node

    def _finish_branch(self, state: _State):
        """A finished subquery becomes one clause of the outer tree."""
        top = self._finish(state)
        if isinstance(top, BooleanQuery):
            return top.freeze()
        return top

    def _finish(self, state: _State):
        if state.top is None:
            return None
        if isinstance(state.top, list):
            bq = BooleanQuery()
            getattr(bq, state.top_occur).extend(state.top)
            return bq
        return state.top

    # ----------------------------------------------------------- factories
    def _new_default_query(self, text: str):
        """newDefaultQuery:553 — full analysis chain; multi-token input
        combines with the default operator (createBooleanQuery)."""
        toks = self.analyzer.tokenize_text(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        bq = BooleanQuery()
        getattr(bq, self.default_operator).extend(TermQuery(t) for t in toks)
        return bq.freeze()

    def _new_phrase_query(self, text: str, slop: int):
        toks = self.analyzer.tokenize_text(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        return PhraseQuery(tuple(toks), slop=slop)

    def _new_prefix_query(self, text: str):
        if not text:
            return None
        return PrefixQuery(text.lower())

    def _new_fuzzy_query(self, text: str, edits: int):
        toks = self.analyzer.tokenize_text(text)
        base = "".join(toks) if toks else text.lower()
        if not base:
            return None
        return FuzzyQuery(base, max_edits=edits)
