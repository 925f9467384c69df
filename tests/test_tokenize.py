"""The three tokenizer implementations (JVM expr, pandas batch, DuckDB SQL)
must agree exactly — rank-identity of BM25 depends on it (SURVEY.md §7)."""

import duckdb
import pandas as pd

from cuvs_lucene_spark.functions.tokenize import doclen_expr, tokenize_expr, tokenize_py

SAMPLES = [
    "def foo_bar(x): return x + 1",
    "Hello, WORLD!  123_abc",
    "",
    "   ",
    "UPPER lower MiXeD",
    "tabs\tand\nnewlines",
    "unicode: café naïve 中文 δ",
    "under_score __dunder__ 0x1f 42",
    "a-b.c/d",
]


def test_py_vs_duckdb():
    py = tokenize_py(pd.Series(SAMPLES)).tolist()
    for s, expected in zip(SAMPLES, py):
        got = duckdb.sql(
            "SELECT regexp_extract_all(lower(?), '[a-z0-9_]+')", params=[s]
        ).fetchone()[0]
        assert got == expected, s


def test_expr_vs_py(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    rows = df.select(tokenize_expr("text").alias("t"), doclen_expr("text").alias("n")).collect()
    py = tokenize_py(pd.Series(SAMPLES)).tolist()
    for row, expected in zip(rows, py):
        assert row["t"] == expected
        assert row["n"] == len(expected)


def test_none_handling():
    out = tokenize_py(pd.Series([None, "abc"]))
    assert out.iloc[0] == []
    assert out.iloc[1] == ["abc"]
