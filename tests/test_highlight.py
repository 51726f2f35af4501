"""Snippet windows from the positional layout (index/highlight.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.analyzer import py_tokenize
from gazetteer_spark.index import highlight, spimi, termindex

QUERIES = [(0, "spark join merge"), (1, "the window"),
           (2, "customer filter group sort"), (3, "zz_absent")]
W = 8


@pytest.fixture(scope="module")
def served(spark, documents, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_hl"))
    spimi.build_index(spark, documents.filter(F.col("doc_id") < 350), idx,
                      n_shards=4, id_col="doc_id", content_col="text",
                      positions=True, doclens=True)
    lay = str(tmp_path_factory.mktemp("lay_hl"))
    termindex.build_term_layout(spark, idx, lay, n_buckets=8,
                                positions=True)
    return idx, lay


def _brute(spark, documents, lay, queries, k, window):
    """Recompute windows from raw text: anchor at matched positions,
    max distinct query terms in [p, p+W-1], ties → earliest."""
    texts = {r["doc_id"]: r["text"] for r in
             documents.filter(F.col("doc_id") < 350).collect()}
    hits = termindex.bm25_topk(spark, lay, queries, k=k).collect()
    want = set()
    for r in hits:
        qts = set(py_tokenize(dict(queries)[r["query_id"]]))
        occ = [(i, t) for i, t in enumerate(py_tokenize(texts[r["docid"]]))
               if t in qts]
        best = (0, 0)
        for p, _ in occ:
            n = len({t for pp, t in occ if p <= pp <= p + window - 1})
            if n > best[0]:
                best = (n, p)
        want.add((r["query_id"], r["rank"], r["docid"], r["score"],
                  best[1], best[0]))
    return want


def test_highlight_matches_bruteforce(spark, documents, served):
    _, lay = served
    got = {(r["query_id"], r["rank"], r["docid"], r["score"],
            r["win_start"], r["n_terms"])
           for r in highlight.highlight_topk(
               spark, lay, QUERIES, k=10, window=W).collect()}
    want = _brute(spark, documents, lay, QUERIES, 10, W)
    assert got == want and got
    # the all-absent-terms query contributes no hits, and every multi-term
    # query has at least one window covering ≥ 2 distinct terms (sanity
    # that the data exercises clustering, not just single matches)
    assert not any(q == 3 for q, *_ in got)
    assert any(nt >= 2 for *_, nt in got)


def test_highlight_window_one_and_ties(spark, documents, served):
    """window=1: every window holds exactly 1 term → earliest matched
    position wins everywhere."""
    _, lay = served
    got = {(r["query_id"], r["docid"]): (r["win_start"], r["n_terms"])
           for r in highlight.highlight_topk(
               spark, lay, QUERIES[:2], k=5, window=1).collect()}
    want = {(q, d): (ws, nt) for q, _, d, _, ws, nt in
            _brute(spark, documents, lay, QUERIES[:2], 5, 1)}
    assert got == want and got
    assert all(nt == 1 for _, nt in got.values())


def test_snippet_text_matches_bruteforce(spark, documents, served):
    _, lay = served
    got = {(r["query_id"], r["docid"]): (r["win_start"], r["snippet"])
           for r in highlight.snippet_text(
               spark, lay, documents.filter(F.col("doc_id") < 350),
               QUERIES[:3], k=5, window=W, id_col="doc_id",
               content_col="text").collect()}
    texts = {r["doc_id"]: r["text"] for r in
             documents.filter(F.col("doc_id") < 350).collect()}
    want = {(q, d): (ws, " ".join(py_tokenize(texts[d])[ws:ws + W]))
            for q, _, d, _, ws, _ in
            _brute(spark, documents, lay, QUERIES[:3], 5, W)}
    assert got == want and got
    # every snippet contains at least one query term
    qts = {q: set(py_tokenize(t)) for q, t in QUERIES[:3]}
    assert all(set(s.split()) & qts[q] for (q, _), (_, s) in got.items())


def test_highlight_requires_positions_and_freshness(spark, documents,
                                                    served, tmp_path_factory):
    idx, lay = served
    # non-positional layout refuses
    flat = str(tmp_path_factory.mktemp("lay_hl_flat"))
    termindex.build_term_layout(spark, idx, flat, n_buckets=4)
    with pytest.raises(ValueError, match="positions"):
        highlight.highlight_topk(spark, flat, QUERIES, k=3)
    # stale layout refuses (new docs after layout build)
    idx2 = str(tmp_path_factory.mktemp("idx_hl2"))
    spimi.build_index(spark, documents.filter(F.col("doc_id") < 100), idx2,
                      n_shards=2, id_col="doc_id", content_col="text",
                      positions=True, doclens=True)
    lay2 = str(tmp_path_factory.mktemp("lay_hl2"))
    termindex.build_term_layout(spark, idx2, lay2, n_buckets=4,
                                positions=True)
    spimi.add_documents(
        spark, documents.filter((F.col("doc_id") >= 100)
                                & (F.col("doc_id") < 120)),
        idx2, id_col="doc_id", content_col="text")
    with pytest.raises(ValueError, match="stale"):
        highlight.highlight_topk(spark, lay2, QUERIES[:1], k=3)
    assert highlight.highlight_topk(spark, lay2, QUERIES[:1], k=3,
                                    allow_stale=True).count() > 0
