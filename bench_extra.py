"""Side benchmarks for optimization work (round 6) — NOT the driver bench.

Per guide §1.4: isolates each bench.py metric's sub-phases (jobs, stages)
with noop-sink / collect timing so changes can be attributed. Prints one
JSON line per phase. bench.py itself is FROZEN; numbers here are cited in
OPTIMIZATION_r06.md only.

Usage: python bench_extra.py [phase ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

OUT: dict[str, float] = {}


def t(name: str, fn, n: int = 3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    OUT[name] = round(best, 3)
    print(f"  {name}: {best:.3f}s", file=sys.stderr)
    return best


def main():
    phases = set(sys.argv[1:]) or {"build", "wand", "exact", "layout",
                                   "phrase", "frontdoor"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("gazetteer_bench_extra", cores=int(cpus))
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    work = tempfile.mkdtemp(prefix="gz_bx_", dir="/dev/shm")
    try:
        idx = f"{work}/idx"
        pos_idx = f"{work}/pidx"
        lay = f"{work}/lay"
        play = f"{work}/play"

        if "build" in phases:
            sc.setJobDescription("bx: map stage only (postings noop)")
            p = spimi._postings_source(docs, "doc_id", "text", False)
            t("build.map_noop", lambda: p.write.format("noop")
              .mode("overwrite").save())
            sc.setJobDescription("bx: full build")

            def full_build():
                d = f"{work}/b{time.time_ns()}"
                spimi.build_index(spark, docs, d, n_shards=int(cpus),
                                  id_col="doc_id", content_col="text",
                                  doclens=True)
                shutil.rmtree(d, ignore_errors=True)
            t("build.full", full_build)

            def gen_only():
                d = f"{work}/g{time.time_ns()}"
                os.makedirs(d, exist_ok=True)
                with open(f"{d}/build.json", "w") as f:
                    json.dump({"x": 1}, f)
                ps = spimi._postings_source(docs, "doc_id", "text", False) \
                    .withColumn("shard",
                                spimi.shard_expr(__import__("pyspark.sql.functions", fromlist=["col"]).col("docid"), int(cpus)))
                spimi._write_generation(spark, ps, d, list(range(int(cpus))),
                                        0, with_doclens=True)
                shutil.rmtree(d, ignore_errors=True)
            t("build.write_gen_only", gen_only)

        # persistent index for query phases
        spimi.build_index(spark, docs, idx, n_shards=int(cpus),
                          id_col="doc_id", content_col="text", doclens=True)
        spimi.build_index(spark, docs, pos_idx, n_shards=int(cpus),
                          id_col="doc_id", content_col="text", positions=True)

        if "wand" in phases:
            sc.setJobDescription("bx: committed_segments count")
            t("wand.committed_count",
              lambda: spimi.committed_segments(spark, idx).count())
            wand.topk(spark, idx, QUERIES[:1], k=10).collect()
            sc.setJobDescription("bx: wand batch")
            t("wand.batch", lambda: wand.topk(spark, idx, QUERIES,
                                              k=10).collect())
            t("wand.single", lambda: wand.topk(spark, idx, QUERIES[:1],
                                               k=10).collect())

        if "exact" in phases:
            postings = postings_sql(docs, "doc_id", "text")
            ds = doc_stats(postings)
            sc.setJobDescription("bx: postings noop (tokenize cost)")
            t("exact.tokenize_noop", lambda: postings.write.format("noop")
              .mode("overwrite").save())
            sc.setJobDescription("bx: exact batch")
            score_queries(spark, postings, ds, QUERIES, k=10).collect()
            t("exact.batch", lambda: score_queries(
                spark, postings, ds, QUERIES, k=10).collect())
            t("exact.tokens_agg",
              lambda: postings.groupBy("term").count().count())

        if "layout" in phases:
            sc.setJobDescription("bx: layout build")
            t("layout.build", lambda: termindex.build_term_layout(
                spark, idx, lay, n_buckets=int(cpus)), n=2)
            sc.setJobDescription("bx: layout bm25 cold")
            t("layout.bm25_cold", lambda: termindex.bm25_topk(
                spark, lay, QUERIES, k=10).collect())
            r = termindex.TermLayoutReader(spark, lay)
            r.topk(QUERIES, k=10).collect()
            sc.setJobDescription("bx: layout bm25 warm")
            t("layout.bm25_warm", lambda: r.topk(QUERIES, k=10).collect(),
              n=4)
            r.close()

        if "phrase" in phases:
            sc.setJobDescription("bx: doc-sharded phrase batch")
            phrase.phrase_match_batch(spark, pos_idx,
                                      [(0, "key order")]).collect()

            def pbatch():
                phrase.phrase_match_batch(
                    spark, pos_idx,
                    [(0, "key order"), (1, "sort by"), (2, "group by")],
                ).collect()
                phrase.near_match_n_batch(
                    spark, pos_idx,
                    [(0, ["key", "order"]), (1, ["sort", "by"])], k=4,
                ).collect()
            t("phrase.batch", pbatch)
            sc.setJobDescription("bx: pos layout build")
            t("phrase.pos_layout_build", lambda: termindex.build_term_layout(
                spark, pos_idx, play, n_buckets=int(cpus), positions=True),
              n=2)
            termindex.phrase_match(spark, play, [(0, "key order")]).collect()
            sc.setJobDescription("bx: layout phrase batch")
            t("phrase.layout_batch", lambda: termindex.phrase_match(
                spark, play,
                [(0, "key order"), (1, "sort by"), (2, "group by")],
            ).collect())

        if "frontdoor" in phases:
            if not os.path.isdir(play):
                termindex.build_term_layout(spark, pos_idx, play,
                                            n_buckets=int(cpus),
                                            positions=True)
            from gazetteer_spark import query as querymod

            querymod.match_layout(spark, play,
                                  "customer AND filter").collect()
            sc.setJobDescription("bx: frontdoor match only")
            t("frontdoor.match", lambda: querymod.match_layout(
                spark, play,
                '(customer AND filter AND NOT group) OR "key order"',
            ).collect())
            sc.setJobDescription("bx: frontdoor search only")
            t("frontdoor.search", lambda: querymod.search(
                spark, play, "spark AND (join OR merge)", k=10).collect())
            frontdoor_qs = [
                (0, '(customer AND filter AND NOT group) OR "key order"'),
                (1, "spark AND (join OR merge)"),
                (2, "window AND NOT group"),
            ]
            frd = termindex.TermLayoutReader(spark, play)
            frd.search(frontdoor_qs[:1], k=10).collect()
            sc.setJobDescription("bx: frontdoor warm")
            t("frontdoor.warm", lambda: frd.search(frontdoor_qs,
                                                   k=10).collect(), n=4)
            frd.close()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
