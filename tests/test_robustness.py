"""Edge cases: empty/degenerate corpora, incompatible resume, collisions."""

from __future__ import annotations

import pytest

from gazetteer_spark.docs import assert_no_docid_collisions
from gazetteer_spark.index import spimi, wand


def test_build_with_empty_and_whitespace_docs(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(0, "real content words here"), (1, ""), (2, "   \n\t  "), (3, "...")],
        "doc_id long, text string",
    )
    d = str(tmp_path_factory.mktemp("idx_empty"))
    stats = spimi.build_index(spark, df, d, n_shards=4, id_col="doc_id",
                              content_col="text")
    # token-less docs carry no postings (they can never match a query);
    # corpus stats count only docs that contribute to scoring
    assert stats["n_docs"] == 1
    hits = wand.topk(spark, d, [(0, "content")], k=5).collect()
    assert [r["docid"] for r in hits] == [0]


def test_build_with_null_content_rows(spark, tmp_path_factory):
    """NULL content must not kill the build (the JVM tokenizer yields a NULL
    array that Arrow delivers as None to the fold UDFs) — both layouts."""
    df = spark.createDataFrame(
        [(0, "real content words here"), (1, None), (2, "more real words")],
        "doc_id long, text string",
    )
    for positions in (False, True):
        d = str(tmp_path_factory.mktemp(f"idx_null_{positions}"))
        stats = spimi.build_index(spark, df, d, n_shards=4, id_col="doc_id",
                                  content_col="text", positions=positions)
        assert stats["n_docs"] == 2
        hits = wand.topk(spark, d, [(0, "content")], k=5).collect()
        assert [r["docid"] for r in hits] == [0]


def test_resume_incompatible_params_rejected(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_params"))
    spimi.build_index(spark, documents, d, n_shards=4, id_col="doc_id",
                      content_col="text")
    with pytest.raises(ValueError, match="incompatible"):
        spimi.build_index(spark, documents, d, n_shards=8, id_col="doc_id",
                          content_col="text", resume=True)


def test_docid_collision_detection(spark):
    reg = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "docid long, sha256 string"
    )
    with pytest.raises(ValueError, match="collision"):
        assert_no_docid_collisions(reg)


def test_add_documents_requires_base(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_nobase"))
    with pytest.raises(FileNotFoundError):
        spimi.add_documents(spark, documents, d, id_col="doc_id",
                            content_col="text")


def test_single_doc_corpus(spark, tmp_path_factory):
    df = spark.createDataFrame([(7, "lonely single document")],
                               "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("idx_one"))
    stats = spimi.build_index(spark, df, d, n_shards=4, id_col="doc_id",
                              content_col="text")
    assert stats["n_docs"] == 1
    hits = wand.topk(spark, d, [(0, "lonely"), (1, "absent_term")], k=3).collect()
    assert len(hits) == 1 and hits[0]["docid"] == 7


def test_query_with_duplicate_terms_stable(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_dupq"))
    spimi.build_index(spark, documents, d, n_shards=4, id_col="doc_id",
                      content_col="text")
    a = wand.topk(spark, d, [(0, "spark spark SPARK spark")], k=5).collect()
    b = wand.topk(spark, d, [(0, "spark")], k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
