"""Typed export-extractor surface (extractors.py) — unit oracles in Python."""

from __future__ import annotations

import hashlib
import math

import pytest

from gazetteer_spark import extractors, sources
from gazetteer_spark.analyzer import py_tokenize
from gazetteer_spark.index import spimi


def test_extract_documents(spark):
    rows = [(1, "Hello worldHTTPServer one"), (2, ""), (3, "a b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["docid"]: r
        for r in extractors.extract_documents(
            df, ["docid", "content_sha256", "n_chars", "n_tokens",
                 "n_distinct_terms", "avg_token_len"],
            id_col="doc_id", content_col="text",
        ).collect()
    }
    for i, text in rows:
        toks = py_tokenize(text)
        r = out[i]
        assert r["content_sha256"] == hashlib.sha256(text.encode()).hexdigest()
        assert r["n_chars"] == len(text)
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct_terms"] == len(set(toks))
        want_avg = round(sum(map(len, toks)) / len(toks), 6) if toks else 0.0
        assert r["avg_token_len"] == pytest.approx(want_avg, abs=1e-9)


def test_unknown_field_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(KeyError, match="unknown extractor"):
        extractors.extract_documents(df, ["docid", "nope"],
                                     id_col="doc_id", content_col="text")


@pytest.fixture(scope="module")
def small_index(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_extract"))
    spimi.build_index(spark, documents, d, n_shards=4,
                      id_col="doc_id", content_col="text")
    return d


def test_extract_terms_idf(spark, small_index):
    n_docs = spimi.load_stats(small_index)["n_docs"]
    out = extractors.extract_terms(
        spark, small_index, ["term", "df", "idf"]
    ).collect()
    assert out
    for r in out[:50]:
        want = round(math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)), 6)
        assert r["idf"] == pytest.approx(want, abs=1e-9)


def test_extract_shards_and_export(spark, small_index, tmp_path):
    out = extractors.extract_shards(
        spark, small_index,
        ["generation", "shard", "n_postings", "n_bytes", "bytes_per_posting"],
    ).collect()
    assert {r["shard"] for r in out} == set(range(4))
    for r in out:
        want = round(r["n_bytes"] / r["n_postings"], 6) if r["n_postings"] else 0.0
        assert r["bytes_per_posting"] == pytest.approx(want, abs=1e-9)
    # typed CSV export round-trip (the reference's CSVOutWriter role)
    df = extractors.extract_shards(spark, small_index, ["shard", "n_postings"])
    sources.write_table(df, str(tmp_path / "csv"), fmt="csv")
    back = sources.read_table(spark, str(tmp_path / "csv"), fmt="csv")
    assert sorted((r["shard"], r["n_postings"]) for r in back.collect()) == sorted(
        (str(r["shard"]), str(r["n_postings"])) for r in df.collect()
    )
