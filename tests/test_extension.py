"""Pluggable-analyzer extension seam (the reference's Groovy plugin surface,
`Options.java:132-160`, re-expressed as typed registration with version-bump
enforcement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.analyzer import (
    Analyzer,
    DEFAULT_ANALYZER,
    get_analyzer,
    register_analyzer,
)
from gazetteer_spark.index import spimi, wand


def _ws_tokens_expr(content):
    return F.array_remove(F.split(F.lower(content), r"\s+"), "")


def _ws_py_tokenize(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


WS = Analyzer(
    name="ws-lower-test", version="ws-v1",
    tokens_expr=_ws_tokens_expr, py_tokenize=_ws_py_tokenize,
)


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_analyzer(WS, replace=True)


def test_default_registered():
    assert get_analyzer("default") is DEFAULT_ANALYZER
    with pytest.raises(KeyError, match="not registered"):
        get_analyzer("no-such-analyzer")
    with pytest.raises(ValueError, match="already registered"):
        register_analyzer(DEFAULT_ANALYZER)


def test_custom_analyzer_end_to_end(spark, tmp_path_factory):
    """Whitespace analyzer keeps snake_case whole where the default splits;
    build, query, and version metadata all follow the registered analyzer."""
    docs = spark.createDataFrame(
        [
            (1, "alpha_beta gamma"),
            (2, "alpha beta gamma"),
            (3, "alpha_beta alpha_beta delta"),
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path_factory.mktemp("idx_ws"))
    spimi.build_index(spark, docs, d, n_shards=2, id_col="doc_id",
                      content_col="text", analyzer="ws-lower-test")
    stats = spimi.load_stats(d)
    assert stats["analyzer"] == "ws-lower-test"
    assert stats["analyzer_version"] == "ws-v1"
    terms = {r["term"] for r in spimi.load_termstats(spark, d).collect()}
    assert "alpha_beta" in terms       # default chain would split this
    assert "alpha" in terms            # from doc 2 only
    # query-side tokenization uses the index's analyzer automatically
    got = wand.topk(spark, d, [(0, "ALPHA_BETA")], k=3).collect()
    assert {r["docid"] for r in got} == {1, 3}
    assert got[0]["docid"] == 3        # tf=2 ranks first
    man = spimi.load_manifest(spark, d).collect()
    assert all(r["analyzer_version"] == "ws-v1" for r in man)


def test_version_bump_enforced(spark, tmp_path_factory):
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")],
                                 "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("idx_ws_bump"))
    spimi.build_index(spark, docs, d, n_shards=2, id_col="doc_id",
                      content_col="text", analyzer="ws-lower-test")
    # semantics change → version bump → incremental add must refuse
    register_analyzer(
        Analyzer(name="ws-lower-test", version="ws-v2",
                 tokens_expr=_ws_tokens_expr, py_tokenize=_ws_py_tokenize),
        replace=True,
    )
    try:
        extra = spark.createDataFrame([(3, "c d")], "doc_id long, text string")
        with pytest.raises(ValueError, match="version changed"):
            spimi.add_documents(spark, extra, d, id_col="doc_id",
                                content_col="text")
    finally:
        register_analyzer(WS, replace=True)


def test_unknown_analyzer_at_query_time(spark, tmp_path_factory):
    """An index whose analyzer is not registered in this process must fail
    loudly at query time, not silently mis-tokenize."""
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("idx_ws_gone"))
    register_analyzer(
        Analyzer(name="transient-test", version="t1",
                 tokens_expr=_ws_tokens_expr, py_tokenize=_ws_py_tokenize),
        replace=True,
    )
    spimi.build_index(spark, docs, d, n_shards=2, id_col="doc_id",
                      content_col="text", analyzer="transient-test")
    from gazetteer_spark.analyzer import _ANALYZERS

    del _ANALYZERS["transient-test"]
    with pytest.raises(KeyError, match="not registered"):
        wand.topk(spark, d, [(0, "x")], k=1).collect()
