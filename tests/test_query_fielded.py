"""Fielded query front door (query.match_layout_fielded /
match_scan_fielded / search_fielded) + bm25f_topk(filter_by=...)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark import fielded, fuzzy as fz
from gazetteer_spark import query as Q
from gazetteer_spark.index import termindex

FIELDS = {"body": "text", "src": "source", "lang": "lang"}
BOOSTS = {"body": 1.0, "src": 2.0, "lang": 0.5}


# ---------------------------------------------------------------------------
# parser scoping (no Spark)
# ---------------------------------------------------------------------------

def test_parse_field_scopes():
    assert Q.parse("src:spark") == Q.Term("spark", field="src")
    assert Q.parse('body:"key order"') == Q.Phrase("key order", 0,
                                                   field="body")
    assert Q.parse('body:"a b c"~2') == Q.Phrase("a b c", 2, field="body")
    assert Q.parse("lang:en~1") == Q.Fuzzy("en", 1, field="lang")
    assert Q.parse("src:sr*") == Q.Prefix("sr", field="src")
    assert Q.parse("-src:x") == Q.Not(Q.Term("x", field="src"))
    # unscoped forms keep field=None (back-compat equality)
    assert Q.parse("spark") == Q.Term("spark")
    for bad in ["src:", ":x", "a:b:c"]:
        with pytest.raises(ValueError):
            Q.parse(bad)


def test_normalize_propagates_field():
    tok = lambda s: [w for w in s.lower().split() if w.isalnum()]
    assert Q._normalize(Q.Term("A B", field="f"), tok) == Q.And(
        (Q.Term("a", field="f"), Q.Term("b", field="f")))
    assert Q._normalize(Q.Phrase("a b", field="f"), tok) == Q._PhraseLeaf(
        ("a", "b"), field="f")
    assert Q._normalize(Q.Phrase("a !!", field="f"), tok) == Q.Term(
        "a", field="f")
    assert Q._normalize(Q.Phrase("a b", slop=2, field="f"), tok) == (
        Q._NearLeaf(("a", "b"), 2, field="f"))


def test_scoped_leaf_rejected_by_plain_compilers():
    with pytest.raises(ValueError, match="fielded compilers"):
        Q._require_unscoped({Q.Term("x", field="f"): 0})


# ---------------------------------------------------------------------------
# compilers (Spark)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def served(spark, documents, tmp_path_factory):
    """(index_dir, layout_dir, fuzzy_dir) — fielded, positional, v3."""
    idx = str(tmp_path_factory.mktemp("idx_fq"))
    fielded.build_fielded_index(spark, documents, idx, FIELDS, n_shards=4,
                                id_col="doc_id", positions=True,
                                doclens=True)
    lay = str(tmp_path_factory.mktemp("lay_fq"))
    termindex.build_term_layout(spark, idx, lay, n_buckets=8)
    fzd = str(tmp_path_factory.mktemp("fz_fq"))
    fz.build_fuzzy_layout(spark, idx, fzd)
    return idx, lay, fzd


QUERY_TABLE = [
    "src:src13 AND spark",
    "spark AND NOT lang:en",
    'body:"key order" OR lang:en',
    'body:"key order" AND NOT src:src13',
    "s* AND NOT lang:en",          # unscoped prefix = any field
    "src:sr* AND customer",        # scoped prefix
    "grup~1 AND src:src8",
    'body:"key order value"~3 AND customer',
    '"key order" AND NOT src:src13',   # unscoped phrase = OR over fields
    "(src:src13 OR src:src8) AND (customer OR filter)",
]


def _ids(df):
    return {r["docid"] for r in df.collect()}


def test_fielded_layout_matches_scan_table(spark, documents, served):
    _, lay, fzd = served
    for q in QUERY_TABLE:
        got = _ids(Q.match_layout_fielded(spark, lay, q, fuzzy_dir=fzd))
        want = _ids(Q.match_scan_fielded(documents, q, FIELDS,
                                         id_col="doc_id"))
        assert got == want, q
    assert _ids(Q.match_scan_fielded(documents, QUERY_TABLE[0], FIELDS,
                                     id_col="doc_id"))


def test_fielded_errors(spark, documents, served):
    _, lay, fzd = served
    with pytest.raises(ValueError, match="unknown field"):
        Q.match_layout_fielded(spark, lay, "nofield:x")
    with pytest.raises(ValueError, match="unknown field"):
        Q.match_scan_fielded(documents, "nofield:x", FIELDS,
                             id_col="doc_id")
    with pytest.raises(ValueError, match="match_layout"):
        Q.match_layout(spark, lay, "spark")  # fielded layout, plain entry
    with pytest.raises(ValueError, match="search_fielded"):
        Q.search(spark, lay, "spark")
    with pytest.raises(ValueError, match="fielded compilers"):
        Q.match_scan(documents, "src:spark", id_col="doc_id",
                     content_col="text")


def test_plain_layout_rejected_by_fielded_compilers(spark, documents,
                                                    served, tmp_path_factory):
    from gazetteer_spark.index import spimi

    idx = str(tmp_path_factory.mktemp("idx_fq_plain"))
    spimi.build_index(spark, documents.filter(F.col("doc_id") < 100), idx,
                      n_shards=2, id_col="doc_id", content_col="text")
    lay = str(tmp_path_factory.mktemp("lay_fq_plain"))
    termindex.build_term_layout(spark, idx, lay, n_buckets=4)
    with pytest.raises(ValueError, match="match_layout_fielded"):
        Q.match_layout(spark, lay, "src:spark")  # scoped leaf, plain layout
    with pytest.raises(ValueError, match="not a fielded layout"):
        Q.match_layout_fielded(spark, lay, "spark")
    with pytest.raises(ValueError, match="not a fielded layout"):
        Q.search_fielded(spark, lay, "spark")


def test_fielded_batch_equals_singles(spark, served):
    _, lay, fzd = served
    qs = list(enumerate(QUERY_TABLE[:6]))
    batch = {(r["query_id"], r["docid"]) for r in
             Q.match_layout_fielded_batch(spark, lay, qs,
                                          fuzzy_dir=fzd).collect()}
    singles = {(qid, r["docid"]) for qid, q in qs
               for r in Q.match_layout_fielded(spark, lay, q,
                                               fuzzy_dir=fzd).collect()}
    assert batch == singles and batch
    with pytest.raises(ValueError, match="duplicate query_id"):
        Q.match_layout_fielded_batch(spark, lay, [(0, "a"), (0, "b")])


def test_search_fielded_batch_equals_singles(spark, served):
    _, lay, _ = served
    qs = [(0, "spark AND (src:src13 OR src:src8)"),
          (1, "customer OR lang:en")]
    got = sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                 for r in Q.search_fielded_batch(spark, lay, qs,
                                                 boosts=BOOSTS,
                                                 k=10).collect())
    want = sorted((qid, r["rank"], r["docid"], r["score"])
                  for qid, q in qs
                  for r in Q.search_fielded(spark, lay, q, boosts=BOOSTS,
                                            k=10).collect())
    assert got == want and got
    with pytest.raises(ValueError, match="boosts"):
        Q.search_fielded_batch(spark, lay, [(0, "spark^2")], boosts=BOOSTS)


def test_filtered_bm25f_matches_bruteforce(spark, served):
    _, lay, _ = served
    queries = [(0, "spark join src13"), (1, "customer filter en")]
    filt = Q.match_layout_fielded(
        spark, lay, "(customer OR filter) AND NOT src:src13")
    allowed = _ids(filt)
    got = termindex.bm25f_topk(spark, lay, queries, boosts=BOOSTS, k=10,
                               filter_by=filt).collect()
    full = termindex.bm25f_topk(spark, lay, queries, boosts=BOOSTS,
                                k=10 ** 6).collect()
    want = []
    for qid in (0, 1):
        rows = sorted(((r["docid"], r["score"]) for r in full
                       if r["query_id"] == qid and r["docid"] in allowed),
                      key=lambda t: (-t[1], t[0]))
        want += [(qid, i + 1, d, s) for i, (d, s) in enumerate(rows[:10])]
    assert sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                  for r in got) == sorted(want)
    assert want


def test_filtered_bm25f_gated_still_exact(spark, served):
    """Forced candidate gate + filter: θ₀ from FILTERED cheap docs —
    results must equal the ungated filtered ranking."""
    _, lay, _ = served
    filt = Q.match_layout_fielded(spark, lay, "customer OR filter OR key")
    q = [(0, "dup the"), (1, "dup window en")]
    gated = termindex.bm25f_topk(spark, lay, q, boosts=BOOSTS, k=5,
                                 filter_by=filt, expensive_df=100).collect()
    plain = termindex.bm25f_topk(spark, lay, q, boosts=BOOSTS, k=5,
                                 filter_by=filt).collect()
    rows = lambda rs: sorted(
        (r["query_id"], r["rank"], r["docid"], r["score"]) for r in rs)
    assert rows(gated) == rows(plain) and gated


def test_search_fielded_equals_filtered_bm25f(spark, served):
    _, lay, fzd = served
    q = "spark AND (src:src13 OR src:src8)"
    got = Q.search_fielded(spark, lay, q, boosts=BOOSTS, k=10).collect()
    filt = Q.match_layout_fielded(spark, lay, q)
    want = termindex.bm25f_topk(spark, lay,
                                [(0, "spark src13 src8")], boosts=BOOSTS,
                                k=10, filter_by=filt).collect()
    assert got == want and got
    with pytest.raises(ValueError, match="positive term"):
        Q.search_fielded(spark, lay, 'body:"key order"')
    with pytest.raises(ValueError, match="boosts"):
        Q.search_fielded(spark, lay, "spark^2 AND src:src13")
