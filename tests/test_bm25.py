"""Exact BM25 scorer vs the pure-Python oracle — rank-identical top-k.

This is the engine's core correctness gate (BASELINE row 11): same docids,
same order, scores equal at the rounded precision.
"""

from __future__ import annotations

from gazetteer_spark.analyzer import postings_arrow, postings_sql
from gazetteer_spark.bm25 import corpus_stats, doc_stats, score_queries, term_stats
from gazetteer_spark.oracle import OracleIndex

QUERIES = [
    (0, "spark join merge"),
    (1, "window"),
    (2, "customer filter group sort"),
    (3, "zzz_not_here"),
    (4, "the"),
    (5, "batch stream vector"),
]


def _oracle(documents):
    docs = [(r["doc_id"], r["text"]) for r in documents.select("doc_id", "text").collect()]
    return OracleIndex(docs)


def test_postings_paths_agree(spark, documents):
    a = postings_sql(documents, "doc_id", "text")
    b = postings_arrow(documents, "doc_id", "text")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_doc_and_term_stats_match_oracle(spark, documents):
    oracle = _oracle(documents)
    postings = postings_sql(documents, "doc_id", "text")
    ds = {r["docid"]: r["doclen"] for r in doc_stats(postings).collect()}
    assert ds == oracle.doclen
    ts = {r["term"]: r["df"] for r in term_stats(postings).collect()}
    assert ts == {t: len(p) for t, p in oracle.postings.items()}
    cs = corpus_stats(doc_stats(postings)).collect()[0]
    assert cs["n_docs"] == oracle.n_docs
    assert abs(cs["avgdl"] - oracle.avgdl) < 1e-9


def test_salted_term_stats_equal_unsalted(spark, documents):
    postings = postings_sql(documents, "doc_id", "text")
    plain = term_stats(postings, salted=False)
    salted = term_stats(postings, salted=True, salt_buckets=16)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_topk_rank_identical_vs_oracle(spark, documents):
    oracle = _oracle(documents)
    postings = postings_arrow(documents, "doc_id", "text")
    ds = doc_stats(postings)
    got = (
        score_queries(spark, postings, ds, QUERIES, k=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = oracle.topk_batch(QUERIES, k=10)
    got_t = [(r["query_id"], r["rank"], r["docid"]) for r in got]
    want_t = [(q, r, d) for q, r, d, _ in want]
    assert got_t == want_t
    for (gq, gr, gd), (_, _, _, ws), row in zip(got_t, want, got):
        assert abs(row["score"] - ws) < 1e-9, (gq, gr, gd)


def test_oov_query_returns_empty(spark, documents):
    postings = postings_sql(documents, "doc_id", "text")
    ds = doc_stats(postings)
    res = score_queries(spark, postings, ds, [(0, "zzz_not_here qqq_xyz")], k=10)
    assert res.count() == 0
