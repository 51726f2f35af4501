"""Capture .explain('formatted') for the bench/serving paths touched in
round 6 → plans/<tag>/<name>.txt. Run from any tree:

    python tools/capture_plans.py <repo_tree> <out_dir>

Uses a scratch index/layout on /dev/shm (same shapes as bench.py) so the
plans show the real scan/exchange/join structure.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

tree = os.path.abspath(sys.argv[1])
out_dir = os.path.abspath(sys.argv[2])
sys.path.insert(0, tree)

from gazetteer_spark.analyzer import postings_sql  # noqa: E402
from gazetteer_spark.bm25 import doc_stats, score_queries  # noqa: E402
from gazetteer_spark.index import phrase, spimi, termindex, wand  # noqa: E402
from gazetteer_spark.session import get_spark  # noqa: E402

QUERIES = [
    (0, "spark join merge"),
    (1, "window"),
    (2, "customer filter group sort"),
    (3, "batch stream vector"),
    (4, "the"),
    (5, "hash aggregate scan"),
]


def main():
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_capture", cores=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    work = tempfile.mkdtemp(prefix="gz_plans_", dir="/dev/shm")
    try:
        idx = f"{work}/idx"
        spimi.build_index(spark, docs, idx, n_shards=8, id_col="doc_id",
                          content_col="text", positions=True, doclens=True)
        play = f"{work}/play"
        termindex.build_term_layout(spark, idx, play, n_buckets=8,
                                    positions=True)

        def cap(name, df):
            with open(f"{out_dir}/{name}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print("captured", name)

        postings = postings_sql(docs, "doc_id", "text")
        cap("ft_tokens", postings)
        cap("ft_bm25_topk_exact", score_queries(
            spark, postings, doc_stats(postings), QUERIES, k=10))
        cap("ft_wand_topk", wand.topk(spark, idx, QUERIES, k=10))
        cap("ft_bm25_via_termindex", termindex.bm25_topk(
            spark, play, QUERIES, k=10))
        cap("ft_phrase_via_termlayout", termindex.phrase_match(
            spark, play, [(0, "key order"), (1, "sort by")]))
        cap("ft_phrase_via_index", phrase.phrase_match_batch(
            spark, idx, [(0, "key order")]))
        from gazetteer_spark import query as querymod

        cap("ft_bool_expr_via_layout", querymod.match_layout(
            spark, play, '(customer AND filter AND NOT group) OR "key order"'))
        cap("ft_search_ranked", querymod.search(
            spark, play, "spark AND (join OR merge)", k=10))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
