"""End-to-end over the synthetic source-code table (BASELINE input shape).

Covers the north-rule correctness bar: deterministic docids from the
natural key, per-row sha256(content) equality vs the source (BASELINE
input_hint invariant), and rank-identical top-k on the 32-query reference
set via both the exact scorer and the compressed block-max path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.corpus import reference_queries, source_files
from gazetteer_spark.docs import (
    assert_no_docid_collisions,
    build_doc_registry,
    docid_expr,
    sha_invariant_violations,
)
from gazetteer_spark.index import spimi, wand
from gazetteer_spark.oracle import OracleIndex

N_FILES = 1500


@pytest.fixture(scope="module")
def source(spark):
    return source_files(spark, N_FILES).cache()


@pytest.fixture(scope="module")
def with_ids(source):
    return source.withColumn("docid", docid_expr("repo", "path", "commit")).cache()


@pytest.fixture(scope="module")
def src_index(spark, with_ids, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("src_idx"))
    spimi.build_index(spark, with_ids, d, n_shards=16)
    return d


def test_registry_sha_invariant(spark, source):
    reg = build_doc_registry(source)
    assert_no_docid_collisions(reg)
    assert sha_invariant_violations(source, reg) == 0
    # registry rows 1:1 with source
    assert reg.count() == source.count() == N_FILES


def test_docids_deterministic_across_runs(spark, source):
    a = sorted(r["docid"] for r in build_doc_registry(source).select("docid").collect())
    b = sorted(
        r["docid"]
        for r in build_doc_registry(source.repartition(7)).select("docid").collect()
    )
    assert a == b


def test_reference_queryset_rank_identical(spark, with_ids, src_index):
    docs = [(r["docid"], r["content"]) for r in with_ids.select("docid", "content").collect()]
    oracle = OracleIndex(docs)
    queries = reference_queries(N_FILES)
    got = (
        wand.topk(spark, src_index, queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = oracle.topk_batch(queries, k=10)
    assert [(r["query_id"], r["rank"], r["docid"]) for r in got] == [
        (q, r, d) for q, r, d, _ in want
    ]
    for row, (_, _, _, ws) in zip(got, want):
        assert abs(row["score"] - ws) < 1e-9


def test_rare_term_ranks_its_file_first(spark, with_ids, src_index):
    # "uniq_7" → terms (uniq, 7): "uniq" is in every file (idf≈0), "7" only
    # in file 7 — BM25 OR-semantics must put file 7 at rank 1.
    hits = wand.topk(spark, src_index, [(0, "uniq_7")], k=10).orderBy("rank").collect()
    src_row = with_ids.filter(F.col("content").endswith("uniq_7")).collect()
    assert len(src_row) == 1
    assert hits[0]["docid"] == src_row[0]["docid"]
    assert hits[0]["score"] > 10 * hits[1]["score"]


def test_k100_case(spark, with_ids, src_index):
    docs = [(r["docid"], r["content"]) for r in with_ids.select("docid", "content").collect()]
    oracle = OracleIndex(docs)
    got = wand.topk(spark, src_index, [(0, "return")], k=100).orderBy("rank").collect()
    want = oracle.topk("return", k=100)
    assert [(r["rank"], r["docid"]) for r in got] == [(rk, d) for rk, d, _ in want]
