"""Index-backed fuzzy/containment lookup: gram-over-dictionary candidates +
exact verify + posting fan-in; must equal the corpus-scan truth while never
reading the documents table.

Reference analog: bidirectional containment name matching
(`addresses/impl/NamesMatcherImpl.java:38-46`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark import fuzzy
from gazetteer_spark.analyzer import tokens_expr
from gazetteer_spark.index import spimi


@pytest.fixture(scope="module")
def layout(spark, documents, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fz_idx"))
    spimi.build_index(spark, documents, idx, n_shards=8, id_col="doc_id",
                      content_col="text")
    fz = str(tmp_path_factory.mktemp("fz_layout"))
    fuzzy.build_fuzzy_layout(spark, idx, fz, n_shards=4)
    return idx, fz


def _vocab(spark, idx):
    return {r["term"] for r in
            spark.read.parquet(f"{idx}/termstats").collect()}


def test_ngram_analyzer_jvm_python_agree(spark):
    rows = [("parseHTTPResponse one tiny ab xy9",),
            ("snake_case_words CamelCase 0xdeadbeef",)]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(fuzzy.NGRAM_ANALYZER.tokens_expr(F.col("text"))
                    .alias("g")).collect()
    for (r, (text,)) in zip(got, rows):
        assert r["g"] == fuzzy._py_ngram_tokenize(text), text


def test_fuzzy_terms_match_dictionary_scan(spark, layout):
    idx, fz = layout
    vocab = _vocab(spark, idx)
    for frag in ("par", "ust", "ord"):
        got = {r["term"] for r in
               fuzzy.fuzzy_terms(spark, fz, frag).collect()}
        want = {t for t in vocab if frag in t}
        assert got == want and got, frag


def test_fuzzy_terms_bidirectional(spark, layout):
    idx, fz = layout
    vocab = _vocab(spark, idx)
    frag = "smallest"
    got = {r["term"] for r in
           fuzzy.fuzzy_terms(spark, fz, frag, bidirectional=True).collect()}
    want = {t for t in vocab if frag in t or t in frag}
    assert got == want
    assert "small" in got  # contained-in-fragment direction


def test_short_fragment_falls_back_to_dictionary_scan(spark, layout):
    idx, fz = layout
    vocab = _vocab(spark, idx)
    got = {r["term"] for r in fuzzy.fuzzy_terms(spark, fz, "th").collect()}
    assert got == {t for t in vocab if "th" in t}


def test_fuzzy_docs_equal_corpus_scan(spark, documents, layout):
    idx, fz = layout
    df = fuzzy.fuzzy_docs(spark, fz, idx, "par")
    got = {r["docid"] for r in df.collect()}
    want = {
        r["doc_id"] for r in documents.select(
            "doc_id", F.explode(tokens_expr(F.col("text"))).alias("t")
        ).filter(F.col("t").contains("par")).select("doc_id").distinct()
        .collect()
    }
    assert got == want and got
    # the whole plan reads index/dictionary files only — never the corpus
    assert not any("documents" in f for f in df.inputFiles())


def test_fuzzy_docs_respects_tombstones(spark, documents, layout,
                                        tmp_path_factory):
    idx, fz = layout
    victim = sorted(
        r["docid"] for r in
        fuzzy.fuzzy_docs(spark, fz, idx, "par").collect()
    )[0]
    d2 = str(tmp_path_factory.mktemp("fz_idx_del"))
    spimi.build_index(spark, documents, d2, n_shards=8, id_col="doc_id",
                      content_col="text")
    spimi.delete_documents(spark, [victim], d2)
    got = {r["docid"] for r in
           fuzzy.fuzzy_docs(spark, fz, d2, "par").collect()}
    assert victim not in got


def test_suggest_terms_bruteforce(spark, layout):
    """Did-you-mean equals a dictionary brute force: terms within
    max_edits ranked (dist, df desc, term), top n."""
    idx, fz = layout
    vocab = {r["term"]: r["df"] for r in
             spark.read.parquet(f"{idx}/termstats").collect()}

    def dist(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    for word, me, n in [("windoww", 2, 5), ("grup", 1, 3)]:
        got = [(r["term"], r["df"], r["dist"]) for r in
               fuzzy.suggest_terms(spark, fz, word, n=n,
                                   max_edits=me).collect()]
        cands = sorted(
            ((dist(t, word), -df, t) for t, df in vocab.items()
             if dist(t, word) <= me))
        want = [(t, -ndf, d) for d, ndf, t in cands[:n]]
        assert got == want and got, word
    with pytest.raises(ValueError, match="single-token"):
        fuzzy.suggest_terms(spark, fz, "a b")


def test_fuzzy_gram_scan_pruned(spark, layout):
    """The gram-index scan is pruned to the fragment's grams (In(term, …)
    reaches the parquet scan) — a fragment touches its grams' posting
    rows, not the whole gram index."""
    idx, fz = layout
    df = fuzzy.fuzzy_terms(spark, fz, "parse")  # grams: par, ars, rse
    plan = df._jdf.queryExecution().executedPlan().toString()
    gram_scans = [ln for ln in plan.splitlines()
                  if "FileScan parquet" in ln and "gramidx/segments" in ln]
    assert gram_scans and all(
        ("In(term, [" in ln) or (" IN (" in ln) for ln in gram_scans), plan


def test_fuzzy_over_fielded_index(spark, documents, tmp_path_factory):
    """Fuzzy layout built from a FIELDED index: the dictionary is the
    distinct BASE terms; doc fan-in expands a match to every field's
    composite postings — result equals a corpus scan over ALL fields."""
    from gazetteer_spark import fielded

    fields = {"body": "text", "src": "source"}
    fidx = str(tmp_path_factory.mktemp("fz_fidx"))
    fielded.build_fielded_index(spark, documents, fidx, fields, n_shards=4,
                                id_col="doc_id")
    fz = str(tmp_path_factory.mktemp("fz_flayout"))
    fuzzy.build_fuzzy_layout(spark, fidx, fz, n_shards=2)

    frag = "par"
    got = {r["docid"] for r in fuzzy.fuzzy_docs(spark, fz, fidx, frag).collect()}
    want = set()
    for col in fields.values():
        want |= {
            r["doc_id"] for r in documents.select(
                "doc_id", F.explode(tokens_expr(F.col(col))).alias("t")
            ).filter(F.col("t").contains(frag)).select("doc_id").distinct()
            .collect()
        }
    assert got == want and got
    # dictionary holds base terms only (no composite separator)
    assert not any("\x1f" in r["term"] for r in
                   spark.read.parquet(f"{fz}/terms").collect())


def test_fuzzy_layout_staleness(spark, documents, tmp_path_factory):
    """A new POSTING generation stales the layout (its vocabulary is
    missing from the gram index) → ValueError unless allow_stale; a
    dels-only generation does not; rebuilding clears it."""
    idx = str(tmp_path_factory.mktemp("fz_stale_idx"))
    spimi.build_index(spark, documents.limit(50), idx, n_shards=4,
                      id_col="doc_id", content_col="text")
    fz = str(tmp_path_factory.mktemp("fz_stale_layout"))
    fuzzy.build_fuzzy_layout(spark, idx, fz, n_shards=2)
    base = {r["docid"] for r in fuzzy.fuzzy_docs(spark, fz, idx, "par").collect()}
    assert base

    # dels-only generation: layout still serves
    victim = sorted(base)[0]
    spimi.delete_documents(spark, [victim], idx)
    got = {r["docid"] for r in fuzzy.fuzzy_docs(spark, fz, idx, "par").collect()}
    assert got == base - {victim}

    # posting generation: stale → raises; allow_stale serves (old recall)
    extra = documents.limit(60).subtract(documents.limit(50))
    spimi.add_documents(spark, extra, idx, id_col="doc_id", content_col="text")
    with pytest.raises(ValueError, match="STALE"):
        fuzzy.fuzzy_docs(spark, fz, idx, "par")
    assert fuzzy.fuzzy_docs(spark, fz, idx, "par",
                            allow_stale=True).count() >= len(got)

    # rebuild: fresh layout sees the new generation's vocabulary
    fz2 = str(tmp_path_factory.mktemp("fz_stale_layout2"))
    fuzzy.build_fuzzy_layout(spark, idx, fz2, n_shards=2)
    assert fuzzy.fuzzy_docs(spark, fz2, idx, "par").count() >= len(got)

def _brute_edit_terms(vocab, w, k):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    return {t for t in vocab if lev(t, w) <= k}


def test_fuzzy_terms_edit_matches_brute_force(spark, tmp_path_factory):
    """Edit-distance term lookup over a dictionary WITH real neighbors:
    gram-bound candidates + levenshtein verify must equal brute force —
    both through the gram path (long words) and the dictionary-scan
    fallback (short words where the bound is powerless)."""
    docs = spark.createDataFrame(
        [(1, "windows window windoww handler handlers"),
         (2, "wind winnow handle candle"),
         (3, "alpha alpah beta betta gamma")],
        "doc_id long, text string",
    )
    idx = str(tmp_path_factory.mktemp("fz_edit_idx"))
    spimi.build_index(spark, docs, idx, n_shards=2, id_col="doc_id",
                      content_col="text")
    fz = str(tmp_path_factory.mktemp("fz_edit_layout"))
    fuzzy.build_fuzzy_layout(spark, idx, fz, n_shards=2)
    vocab = _vocab(spark, idx)
    # long words take the gram-candidate path (min_shared >= 1)
    for w, k in [("window", 1), ("handler", 1), ("windows", 2)]:
        got = {r["term"] for r in
               fuzzy.fuzzy_terms_edit(spark, fz, w, max_edits=k).collect()}
        assert got == _brute_edit_terms(vocab, w, k) and got, (w, k)
    # short word: D_w - k*n < 1 → dictionary-scan fallback
    got = {r["term"] for r in
           fuzzy.fuzzy_terms_edit(spark, fz, "beta", max_edits=1).collect()}
    assert got == _brute_edit_terms(vocab, "beta", 1)
    assert "betta" in got


def test_fuzzy_docs_edit_equals_corpus_scan(spark, documents, layout):
    """fuzzy_docs(max_edits=1) for a misspelled word must equal the
    corpus-scan truth (docs holding any term within one edit)."""
    idx, fz = layout
    got = {r["docid"] for r in
           fuzzy.fuzzy_docs(spark, fz, idx, "windoww",
                            max_edits=1).collect()}
    toks = documents.select(
        F.col("doc_id").alias("docid"),
        F.explode(tokens_expr(F.col("text"))).alias("term"),
    )
    want = {r["docid"] for r in
            toks.filter(F.levenshtein(F.col("term"), F.lit("windoww")) <= 1)
            .select("docid").distinct().collect()}
    assert got == want and got
