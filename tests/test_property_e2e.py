"""Randomized end-to-end properties: for corpora the fixtures never
hand-picked, the compressed block-max path must stay rank-identical to the
pure-Python oracle, and doc-sharding must stay balanced (skew-free)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.index import spimi, wand
from gazetteer_spark.oracle import OracleIndex

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "parseHttp", "buildIndex", "merge_sort", "scan_table", "x1", "y2", "z9",
    "the", "of", "and",  # hot terms in every vocab draw
]


def _random_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randrange(1, 60)
        words = [WORDS[rng.randrange(len(WORDS))] for _ in range(n)]
        if rng.random() < 0.3:
            words.append(f"rare{i}")
        docs.append((i, " ".join(words)))
    return docs


def _random_queries(seed: int):
    rng = random.Random(seed * 31 + 7)
    qs = []
    for qid in range(12):
        n = rng.randrange(1, 4)
        qs.append((qid, " ".join(WORDS[rng.randrange(len(WORDS))] for _ in range(n))))
    qs.append((12, "rare3 the"))
    qs.append((13, "absent_zzz"))
    return qs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_corpus_rank_identical(spark, tmp_path_factory, seed):
    docs = _random_corpus(seed, 300)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp(f"prop_idx_{seed}"))
    spimi.build_index(spark, df, d, n_shards=8, id_col="doc_id", content_col="text")
    oracle = OracleIndex(docs)
    queries = _random_queries(seed)
    got = wand.topk(spark, d, queries, k=7).orderBy("query_id", "rank").collect()
    want = oracle.topk_batch(queries, k=7)
    assert [(r["query_id"], r["rank"], r["docid"]) for r in got] == [
        (q, r, dd) for q, r, dd, _ in want
    ]
    for row, (_, _, _, ws) in zip(got, want):
        assert abs(row["score"] - ws) < 1e-9


def test_doc_sharding_is_balanced(spark, tmp_path_factory):
    """hash(docid) sharding keeps shards even regardless of term skew — the
    design that makes the build's wide shuffle skew-free (SURVEY §7.3)."""
    docs = [(i, "the " * 50) for i in range(4000)]  # maximally hot corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("skew_idx"))
    spimi.build_index(spark, df, d, n_shards=16, id_col="doc_id", content_col="text")
    counts = [r["n_docs"] for r in spimi.load_manifest(spark, d).collect()]
    assert len(counts) == 16
    assert max(counts) < 2 * min(counts), counts
    # and the hot term still scores correctly
    got = wand.topk(spark, d, [(0, "the")], k=3).orderBy("rank").collect()
    assert [r["docid"] for r in got] == [0, 1, 2]  # all-equal scores → docid order
