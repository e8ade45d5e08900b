"""UAX29URLEmailTokenizer-lite — whole-span URL/email tokens + unicode
rules elsewhere, exact DuckDB mirror (the urlemail_stats gate contract),
plus an index drive asserting the whole-URL term is searchable."""

import duckdb
import pyarrow as pa

from lucene_ray.analysis import get_analyzer
from lucene_ray.analysis.urlemail import UrlEmailAnalyzer


def test_url_email_tokens():
    an = get_analyzer("url_email")
    assert an.tokenize_text("Contact John.Doe+tag@Example.COM for info") == [
        "contact", "john.doe+tag@example.com", "for", "info",
    ]
    assert an.tokenize_text(
        "see https://lucene.apache.org/core?q=1#frag and www.Example.org/path"
    ) == [
        "see", "https://lucene.apache.org/core?q=1#frag", "and",
        "www.example.org/path",
    ]
    assert an.tokenize_text("ftp://files.example.com/a.txt") == [
        "ftp://files.example.com/a.txt",
    ]
    # documented subset: mailto: bodies fall back to unicode rules
    assert an.tokenize_text("mailto:test@example.org")[0] == "mailto"
    # the base MidNumLet rules still hold for plain spans
    assert an.tokenize_text("don't 3.14 example.com") == [
        "don't", "3.14", "example.com",
    ]


def test_url_email_sql_parity():
    texts = [
        "Contact John.Doe+tag@Example.COM for info",
        "see https://lucene.apache.org/core/docs?q=1#frag and www.Example.org/p",
        "mailto:test@example.org out of scope",
        "plain text don't 3.14 example.com",
        "two a@b.io c.d@e-f.co.uk",
        "",
    ]
    an = get_analyzer("url_email")
    con = duckdb.connect()
    con.execute("CREATE TABLE x(t VARCHAR)")
    con.executemany("INSERT INTO x VALUES (?)", [(t,) for t in texts])
    rows = con.execute(
        f"SELECT {UrlEmailAnalyzer.sql_expr('t')} FROM x"
    ).fetchall()
    py = an.tokenize_array(pa.array(texts, pa.string())).to_pylist()
    for t, (sql_toks,), py_toks in zip(texts, rows, py):
        assert sql_toks == py_toks, (t, sql_toks, py_toks)


def test_url_email_rejected_by_builder(tmp_path, ray_session):
    """Scheme URLs carry ':' — reserved by the shared term dict for
    keyword fields — so build_index must REFUSE this analyzer (the
    supports_indexing contract; a ':' URL token would silently break the
    CheckIndex sum_ttf invariant)."""
    import pyarrow.parquet as pq
    import pytest

    from lucene_ray.index.builder import build_index

    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "content": pa.array(["https://x.io/a b"], pa.large_string()),
                "repo": ["r"], "path": ["a"], "commit": ["c"],
                "lang": ["txt"],
            }
        ),
        src,
    )
    with pytest.raises(Exception, match="analysis-surface|supports"):
        build_index([src], str(tmp_path / "ix"), analyzer_name="url_email",
                    target_docs=100)
