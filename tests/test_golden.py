"""Frozen golden-file tests (reference style: golden values over seeded
data, `MMapIndexTest.java:51-98`). tests/golden_n200.json was generated ONCE
from the pure-Python oracle and is checked in — the engine must reproduce it
exactly in every future round; a diff here means analyzer/scoring/docid
semantics drifted."""

from __future__ import annotations

import json
import os

import pytest

from gazetteer_spark.analyzer import py_term_counts
from gazetteer_spark.corpus import source_files
from gazetteer_spark.docs import build_doc_registry, docid_expr
from gazetteer_spark.index import spimi, wand

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_n200.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def corpus(spark, golden):
    return source_files(spark, golden["n_files"]).cache()


def test_analyzer_cases_frozen(golden):
    for text, want in golden["analyzer_cases"].items():
        assert py_term_counts(text) == want


def test_registry_frozen(spark, corpus, golden):
    reg = build_doc_registry(corpus).select("docid", "sha256", "doclen").collect()
    got = sorted([[r["docid"], r["sha256"], r["doclen"]] for r in reg])
    assert got == golden["registry"]


def test_topk_frozen(spark, corpus, golden, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("golden_idx"))
    docs = corpus.withColumn("docid", docid_expr("repo", "path", "commit"))
    spimi.build_index(spark, docs, d, n_shards=8)
    queries = [(int(qid), text) for qid, text in golden["queries"].items()]
    got = wand.topk(spark, d, queries, k=5).orderBy("query_id", "rank").collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append([r["rank"], r["docid"], r["score"]])
    for qid_s, want in golden["topk5"].items():
        have = by_q.get(int(qid_s), [])
        assert [(r, d_) for r, d_, _ in have] == [(r, d_) for r, d_, _ in want], qid_s
        for (_, _, gs), (_, _, ws) in zip(have, want):
            assert abs(gs - ws) < 1e-9
