"""M2 tokenizer goldens + batch/scalar consistency (SURVEY.md §5.1)."""

import duckdb
import pyarrow as pa
import pytest

from sharesci_ray.functions.text import (
    SQL_TOKENIZE,
    flat_tokens,
    tokenize,
    tokenize_column,
)

GOLDENS = [
    ("camelCaseId", ["camel", "case", "id"]),
    ("HTMLParser", ["html", "parser"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("x = foo(bar, 42)", ["foo", "bar"]),
    ("", []),
    ("123 4567", []),
    ("a b c", []),  # all length-1
    ("résumé naïve", ["sum", "na", "ve"]),  # non-ascii are separators
    ("getFoo_bar42", ["get", "foo", "bar42"]),
    ("__init__", ["init"]),
    ("HTTPResponse2XX", ["http", "response2", "xx"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS, ids=range(len(GOLDENS)))
def test_goldens(text, expected):
    assert tokenize(text) == expected


def test_huge_line():
    text = "foo_bar " * 100_000
    toks = tokenize(text)
    assert len(toks) == 200_000
    assert set(toks) == {"foo", "bar"}


def test_batch_matches_scalar():
    texts = [g[0] for g in GOLDENS] + ["def main():\n  return fooBar != baz_qux"]
    col = pa.array(texts, pa.string())
    batch_lists = tokenize_column(col).to_pylist()
    for t, got in zip(texts, batch_lists):
        assert got == tokenize(t), t


def test_flat_tokens_matches():
    texts = ["getFoo barBaz", "", "x 12 yy"]
    flat, parent = flat_tokens(pa.array(texts))
    assert flat.to_pylist() == ["get", "foo", "bar", "baz", "yy"]
    assert list(parent) == [0, 0, 0, 0, 2]


def test_sql_tokenize_matches_python():
    """The DuckDB SQL fragment must replicate tokenize() exactly (oracle parity)."""
    texts = [g[0] for g in GOLDENS] + [
        "def parseHTTPHeader(self, raw_bytes):  # noqa",
        "SELECT * FROM t WHERE x='fooBar_baz99'",
    ]
    con = duckdb.connect()
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    con.register("docs", tbl)
    sql = f"SELECT {SQL_TOKENIZE.format(col='text')} AS toks FROM docs"
    got = [r[0] for r in con.execute(sql).fetchall()]
    for t, g in zip(texts, got):
        assert g == tokenize(t), t
