"""Analyzer golden + three-way equivalence tests.

Modeled on the reference's normalizer unit tests (golden values over small
inputs, SURVEY §5; e.g. foldASCII/lowercase `AddressesUtils.java:24-31`).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gazetteer_spark.analyzer import (
    analyze_pdf,
    py_term_counts,
    py_tokenize,
    shingles_expr,
    tokens_expr,
)

GOLDEN = [
    ("parseHttpResponse", ["parse", "http", "response"]),
    ("HTTPServer", ["http", "server"]),
    ("build_index_segment", ["build", "index", "segment"]),
    ("SCREAMING_SNAKE_CASE", ["screaming", "snake", "case"]),
    ("x = foo2Bar(baz3)", ["x", "foo2", "bar", "baz3"]),
    ("", []),
    ("   \t\r\n  ", []),
    ("...!!!", []),
    ("a", ["a"]),
    ("def f(x):\n    return x+1", ["def", "f", "x", "return", "x", "1"]),
    ("CamelCase123Next", ["camel", "case123", "next"]),
    ("é-ü-ñ", []),  # non-ascii folds out via the [^a-z0-9] split
    ("under__score", ["under", "score"]),
    ("v2API", ["v2", "api"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_py_tokenize_golden(text, expected):
    assert py_tokenize(text) == expected


def test_jvm_matches_python_on_golden(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDEN)], "i int, c string")
    rows = df.select("i", tokens_expr(F.col("c")).alias("toks")).collect()
    got = {r["i"]: r["toks"] for r in rows}
    for i, (text, expected) in enumerate(GOLDEN):
        assert got[i] == expected, f"case {i}: {text!r}"


def test_arrow_analyzer_matches_python(spark):
    texts = [t for t, _ in GOLDEN] + ["def merge(a, b): return a + b"] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, c string")
    rows = df.select("i", analyze_pdf(F.col("c")).alias("tt")).collect()
    for r in rows:
        want = py_term_counts(texts[r["i"]])
        got = {x["term"]: x["tf"] for x in r["tt"]}
        assert got == want


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_py_tokenize_terms_are_canonical(text):
    for t in py_tokenize(text):
        assert t
        assert t == t.lower()
        assert py_tokenize(t) == [t]  # idempotent on its own output


def test_property_jvm_vs_python_random(spark):
    import random

    rng = random.Random(42)
    alphabet = "abcXYZ_09 .\t\n-/éΩ"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, c string")
    rows = df.select("i", tokens_expr(F.col("c")).alias("toks")).collect()
    for r in rows:
        assert r["toks"] == py_tokenize(texts[r["i"]]), repr(texts[r["i"]])


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b"), (2, "")], "i int, c string")
    rows = (
        df.select("i", shingles_expr(tokens_expr(F.col("c")), 3).alias("s"))
        .orderBy("i")
        .collect()
    )
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []
    assert rows[2]["s"] == []
