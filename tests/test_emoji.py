"""UnicodeEmojiAnalyzer — UAX#29 9.x emoji word-break (lite), pinned by
the reference's TestStandardAnalyzer emoji vectors
(core/src/test/.../standard/TestStandardAnalyzer.java:557-635)."""

import duckdb
import pytest

from lucene_ray.analysis import get_analyzer

ENG_FLAG = (
    "\U0001F3F4\U000E0067\U000E0062\U000E0065\U000E006E\U000E0067\U000E007F"
)

VECTORS = [
    # testEmoji
    ("💩 💩💩", ["💩", "💩", "💩"]),
    # testEmojiSequence (ZWJ)
    ("👩‍❤️‍👩", ["👩‍❤️‍👩"]),
    # testEmojiSequenceWithModifier (fitzpatrick)
    ("👨\U0001F3FC‍⚕️", ["👨\U0001F3FC‍⚕️"]),
    # testEmojiRegionalIndicator (flags pair up)
    ("🇺🇸🇺🇸", ["🇺🇸", "🇺🇸"]),
    # testEmojiVariationSequence (keycaps)
    ("#️⃣", ["#️⃣"]),
    ("3️⃣", ["3️⃣"]),
    # text presentation: lone '#'+VS15 drops; digit keeps its Extend char
    ("#︎", []),
    ("3︎", ["3︎"]),
    ("⭕︎", ["⭕"]),
    # testEmojiTagSequence (England flag)
    (ENG_FLAG, [ENG_FLAG]),
    # testEmojiTokenization
    ("poo💩poo", ["poo", "💩", "poo"]),
    ("💩中國💩", ["💩", "中", "國", "💩"]),
    # base analyzer behaviors survive
    ("don't stop 3.14 example.com", ["don't", "stop", "3.14", "example.com"]),
]


@pytest.fixture(scope="module")
def an():
    return get_analyzer("unicode_emoji")


@pytest.mark.parametrize("text,want", VECTORS, ids=range(len(VECTORS)))
def test_reference_vectors(an, text, want):
    assert an.tokenize_text(text) == want


def test_sql_mirror_lockstep(an):
    texts = [v[0] for v in VECTORS] + [
        "mixed 🇫🇷 text with é and 中文 #1️⃣ done",
        "a‍b glued extend chars",
    ]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {an.sql_expr('t')} FROM (SELECT unnest($1::VARCHAR[]) AS t)",
        [texts],
    ).fetchall()
    for txt, (sql_toks,) in zip(texts, rows):
        assert an.tokenize_text(txt) == sql_toks, txt
