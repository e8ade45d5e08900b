"""ExtendableQueryParser — classic syntax + pluggable per-field-key parser
extensions (queryparser/src/java/org/apache/lucene/queryparser/ext/).

Reference contract:
  - Extensions.java:106-112 splitExtensionField: the (already unescaped)
    field token splits at the FIRST delimiter occurrence; delimiter at
    position 0 means "use the default query field"; no delimiter means "no
    extension key".
  - ExtendableQueryParser.java:107-116 getFieldQuery: if the key resolves
    to a registered ParserExtension the leaf becomes
    ``extension.parse(ExtensionQuery(parser, field, rawText))``; an
    unresolved key (or no delimiter) falls back to the classic behavior —
    so ordinary fields containing the delimiter (``n_chars`` under a ``_``
    delimiter) are unaffected unless someone registers the key.
  - Extensions.java:157-161 buildExtensionField escapes the joined
    ``field<delim>key`` string, which is why a ':'-delimited extension
    field appears as ``title\\:key:term`` in query text.

Here the parser is a StandardQueryParser subclass (flat classic-compatible
assembly), so extensions compose with the whole flexible config surface.
Supported leaf shapes:
  - any non-':' delimiter: ``title_key:term`` and ``title_key:"a phrase"``
    (the classic field token passes through the lexer unchanged);
  - the default ':' delimiter's escaped form for WORD terms:
    ``title\\:key:term`` / ``\\:key:term`` (the reference's
    buildExtensionField output). A ':'-delimited QUOTED extension query is
    not lexable here — use a non-colon delimiter for quoted extension
    text (documented divergence; the reference reaches it only through
    its JavaCC field token).
As in the reference, a leaf whose query text carries unescaped
``*``/``?``/trailing ``~`` routes to wildcard/fuzzy handling instead of
the extension (getFieldQuery only fires for plain term/phrase leaves).

A ParserExtension is any callable ``(ExtensionQuery) -> query-or-None``
(ParserExtension.java:parse; None means "no clause" — the reference's
must-not-return-null contract is relaxed to match this repo's empty-leaf
convention).
"""

from __future__ import annotations

from dataclasses import dataclass

from lucene_ray.search.flexparser import StandardQueryParser
from lucene_ray.search.query import (
    _has_unescaped,
    _scale_boost,
    discard_escapes,
)

DEFAULT_EXTENSION_FIELD_DELIMITER = ":"


@dataclass(frozen=True)
class ExtensionQuery:
    """ExtensionQuery.java: the parse context handed to an extension."""

    top_level_parser: object
    field: str | None
    raw_query_text: str


class Extensions:
    """Extension registry + the field/key splitting scheme
    (Extensions.java; subclass to customize the scheme)."""

    def __init__(self, delimiter: str = DEFAULT_EXTENSION_FIELD_DELIMITER):
        if len(delimiter) != 1:
            raise ValueError("extension field delimiter must be one char")
        self.delimiter = delimiter
        self._extensions: dict[str, object] = {}

    def add(self, key: str, extension) -> None:
        self._extensions[key] = extension

    def get_extension(self, key: str):
        return self._extensions.get(key)

    def split_extension_field(
        self, default_field: str | None, field: str
    ) -> tuple[str | None, str | None]:
        """(field, key) per Extensions.splitExtensionField:106-112."""
        i = field.find(self.delimiter)
        if i < 0:
            return field, None
        return (default_field if i == 0 else field[:i]), field[i + 1:]

    def build_extension_field(self, key: str, field: str = "") -> str:
        from lucene_ray.search.query import escape

        return escape(f"{field}{self.delimiter}{key}")


def _split_first_unescaped_colon(w: str) -> tuple[str | None, str]:
    """The classic lexer's field-token split: the longest escaped-char-or-
    non-colon prefix followed by an unescaped ':'. Returns (None, w) when
    the word carries no field prefix."""
    esc = False
    for i, c in enumerate(w):
        if esc:
            esc = False
        elif c == "\\":
            esc = True
        elif c == ":":
            if i == 0 or i == len(w) - 1:
                return None, w
            return w[:i], w[i + 1:]
    return None, w


class ExtendableQueryParser(StandardQueryParser):
    """Classic-compatible parser with ParserExtension dispatch at the
    term/phrase leaf (ExtendableQueryParser.java:66-116)."""

    def __init__(
        self,
        analyzer,
        *,
        default_field: str | None = None,
        extensions: Extensions | None = None,
        **config,
    ):
        super().__init__(analyzer, **config)
        self.default_field = default_field
        self.extensions = extensions or Extensions()

    def _dispatch(self, raw_field: str, query_text: str, boost: float):
        fld, key = self.extensions.split_extension_field(
            self.default_field, raw_field
        )
        if key is None:
            return None
        ext = self.extensions.get_extension(key)
        if ext is None:
            return None
        q = ext(ExtensionQuery(self, fld, query_text))
        return [] if q is None else [_scale_boost(q, boost)]

    def _leaf(self, w, is_phrase, boost, slop, field):
        if is_phrase:
            # the phrase's field token arrives pre-lexed as `field`
            if field is not None:
                qs = self._dispatch(field, discard_escapes(w), boost)
                if qs is not None:
                    return qs
        else:
            ft, rest = _split_first_unescaped_colon(w)
            if ft is not None and not _has_unescaped(rest, "*?~"):
                qs = self._dispatch(
                    discard_escapes(ft), discard_escapes(rest), boost
                )
                if qs is not None:
                    return qs
        return super()._leaf(w, is_phrase, boost, slop, field)
