"""Benchmark harness — one JSON line on stdout.

Runs the engine's headline operations at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- index_build:   full SPIMI segment build over documents (files/sec)
- wand_batch:    block-max top-k for the 6-query batch (one job)
- query_p50:     per-query top-k latency, p50 over the batch run singly
- exact_batch:   exact (non-index) DataFrame BM25 for the same batch
- tokens_agg:    analyzer+postings aggregation throughput

Scaling-efficiency evidence (N vs 4N parallelism) lives in
tools/bench_scaling.py → BENCH.md, since it needs two JVMs.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gazetteer_spark.bm25 import doc_stats, score_queries  # noqa: E402
from gazetteer_spark.analyzer import postings_sql  # noqa: E402
from gazetteer_spark.index import spimi, wand  # noqa: E402
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("gazetteer_bench", cores=int(cpus))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    timings: dict[str, float] = {}

    # min-of-N for every sub-minute metric: the shared VM shows ±25% (up to
    # 4×) run-to-run swings from host CPU steal (BENCH.md control tables);
    # the min is the honest steady-state figure, the same methodology the
    # 100k build has used since round 2. First runs additionally pay
    # JIT/codegen warm-up.
    idx_dir = tempfile.mkdtemp(prefix="gz_bench_idx_")
    try:
        build_runs = []
        for i in range(2):
            d = f"{idx_dir}/b{i}"
            t0 = time.time()
            spimi.build_index(spark, docs, d, n_shards=int(cpus),
                              id_col="doc_id", content_col="text")
            build_runs.append(time.time() - t0)
            if i == 0:
                keep = d  # queries below run against the first build
            else:
                shutil.rmtree(d, ignore_errors=True)
        timings["index_build"] = min(build_runs)
        files_per_sec = n_docs / timings["index_build"]

        # warm (JIT/code cache) then measure the batch as one job
        wand.topk(spark, keep, QUERIES[:1], k=10).collect()
        wb = []
        for _ in range(3):
            t0 = time.time()
            wand.topk(spark, keep, QUERIES, k=10).collect()
            wb.append(time.time() - t0)
        timings["wand_batch"] = min(wb)

        # per-query MIN across passes, then the median across queries: a
        # steal burst during one pass can't poison the metric as long as
        # each query sees ONE quiet measurement somewhere
        lat_by_q = [[] for _ in QUERIES]
        for _ in range(2):
            for i, q in enumerate(QUERIES):
                t0 = time.time()
                wand.topk(spark, keep, [q], k=10).collect()
                lat_by_q[i].append(time.time() - t0)
        timings["query_p50"] = statistics.median(min(v) for v in lat_by_q)

        # warm serving path: segments + termstats pinned in memory, term-df
        # driver cache populated by a first pass — steady-state latency
        reader = wand.IndexReader(spark, keep)
        for q in QUERIES:
            reader.topk([q], k=10).collect()
        warm_by_q = [[] for _ in QUERIES]
        for _ in range(3):
            for i, q in enumerate(QUERIES):
                t0 = time.time()
                reader.topk([q], k=10).collect()
                warm_by_q[i].append(time.time() - t0)
        timings["query_p50_warm"] = statistics.median(
            min(v) for v in warm_by_q)
        reader.close()

        postings = postings_sql(docs, "doc_id", "text")
        ds = doc_stats(postings)
        eb = []
        for _ in range(3):
            t0 = time.time()
            score_queries(spark, postings, ds, QUERIES, k=10).collect()
            eb.append(time.time() - t0)
        timings["exact_batch"] = min(eb)

        ta = []
        for _ in range(2):
            t0 = time.time()
            postings.groupBy("term").count().count()
            ta.append(time.time() - t0)
        timings["tokens_agg"] = min(ta)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # positional layout (v2) build + batched phrase/NEAR serving — the
    # round-3 serving path: N positional queries in ONE pruned scan/job
    from gazetteer_spark.index import phrase

    pos_dir = tempfile.mkdtemp(prefix="gz_bench_pos_")
    try:
        t0 = time.time()
        spimi.build_index(spark, docs, pos_dir, n_shards=int(cpus),
                          id_col="doc_id", content_col="text",
                          positions=True)
        timings["index_build_pos"] = time.time() - t0
        phrase.phrase_match_batch(spark, pos_dir, [(0, "key order")]).collect()
        pb = []
        for _ in range(2):
            t0 = time.time()
            phrase.phrase_match_batch(
                spark, pos_dir,
                [(0, "key order"), (1, "sort by"), (2, "group by")],
            ).collect()
            phrase.near_match_n_batch(
                spark, pos_dir, [(0, ["key", "order"]), (1, ["sort", "by"])],
                k=4,
            ).collect()
            pb.append(time.time() - t0)
        timings["phrase_batch"] = min(pb)
    finally:
        shutil.rmtree(pos_dir, ignore_errors=True)

    # credible build throughput needs enough work to amortize fixed costs:
    # 100k synthetic source files (~5 KB each), warm workers
    from gazetteer_spark.corpus import source_files
    from gazetteer_spark.docs import docid_expr

    n_big = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="gz_bench_big_", dir=base)
    try:
        src = source_files(spark, n_big).withColumn(
            "docid", docid_expr("repo", "path", "commit")
        )
        src.write.mode("overwrite").parquet(f"{work}/source")
        big = spark.read.parquet(f"{work}/source")
        big.count()
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "512")  # > n_shards
        # five runs, min reported: the first big build in a process pays
        # JIT/codegen warm-up and every run is exposed to host-contention
        # spikes (observed up to 10× run-to-run swings on the shared VM —
        # 70.5 → 7.5 s within one invocation; a quiet run measures
        # 5.8-7.9 s at 100k). The min is the honest steady-state figure
        # (BENCH.md records the control experiments).
        runs = []
        for i in range(5):
            t0 = time.time()
            spimi.build_index(spark, big, f"{work}/idx{i}", n_shards=128)
            runs.append(time.time() - t0)
            shutil.rmtree(f"{work}/idx{i}", ignore_errors=True)
        timings["index_build_100k"] = min(runs)
        big_runs = [round(r, 3) for r in runs]
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        files_per_sec_big = n_big / timings["index_build_100k"]
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 top-k wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "n_docs": n_docs,
                "files_per_sec": round(files_per_sec, 1),
                "files_per_sec_100k": round(files_per_sec_big, 1),
                "index_build_100k_runs": big_runs,
                "query_p50_sec": round(timings["query_p50"], 3),
                "query_p50_warm_sec": round(timings["query_p50_warm"], 3),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
