"""Decompose the 100k-doc build (bench.py's index_build_100k) into phases.

Phases timed separately (min-of-N each, labeled jobs):
  map_noop        tokenize + Arrow fold, noop sink (no shuffle)
  shuffle_noop    postings + shard column through the group shuffle into
                  the assembly applyInArrow, noop sink (no parquet write)
  full_build      spimi.build_index end to end
  write_gen       _write_generation only (segments + manifest commit)
  refresh         _refresh_derived only (termstats + stats.json)

Side tool only — bench.py is frozen; numbers go to OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gazetteer_spark.corpus import source_files  # noqa: E402
from gazetteer_spark.docs import docid_expr  # noqa: E402
from gazetteer_spark.index import spimi  # noqa: E402
from gazetteer_spark.session import get_spark  # noqa: E402


def t(name, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {name}: {dt:.3f}s", flush=True)
    print(f"{name} MIN: {best:.3f}s", flush=True)
    return best


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_big = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))
    spark = get_spark("bx_100k", cores=int(cpus))
    sc = spark.sparkContext
    work = tempfile.mkdtemp(prefix="gz_bx100k_", dir="/dev/shm")
    try:
        src = source_files(spark, n_big).withColumn(
            "docid", docid_expr("repo", "path", "commit")
        )
        src.write.mode("overwrite").parquet(f"{work}/source")
        big = spark.read.parquet(f"{work}/source")
        big.count()
        spark.conf.set("spark.sql.shuffle.partitions", "512")

        sc.setJobDescription("bx100k: map_noop")
        p = spimi._postings_source(big, "docid", "content", False)
        t("map_noop", lambda: p.write.format("noop").mode("overwrite").save())

        sc.setJobDescription("bx100k: shuffle_noop")
        pa_ = p.withColumn("shard", spimi.shard_expr(F.col("docid"), 128))
        pend = f"{work}/pend"

        def shuffle_noop():
            seg = pa_.groupBy("shard").applyInArrow(
                lambda tbl: spimi._build_shard_arrow(tbl, pending_dir=None,
                                                     with_doclens=False),
                spimi.SEGMENT_SCHEMA,
            )
            with spimi.group_parallelism(spark, 128):
                seg.write.format("noop").mode("overwrite").save()

        t("shuffle_noop", shuffle_noop)

        sc.setJobDescription("bx100k: full_build")
        bi = {"i": 0}

        def full_build():
            d = f"{work}/idx{bi['i']}"
            spimi.build_index(spark, big, d, n_shards=128)
            bi["i"] += 1
            return d

        t0 = time.time()
        keep = full_build()
        print(f"  full_build(first): {time.time()-t0:.3f}s", flush=True)
        t("full_build", lambda: shutil.rmtree(full_build(),
                                              ignore_errors=True), n=3)

        sc.setJobDescription("bx100k: write_gen only")
        with open(f"{keep}/build.json") as f:
            import json
            params = json.load(f)

        def write_gen():
            d = f"{work}/wg"
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d)
            with open(f"{d}/build.json", "w") as f:
                json.dump(params, f)
            spimi._write_generation(
                spark, pa_, d, list(range(128)), generation=0)

        t("write_gen", write_gen)

        sc.setJobDescription("bx100k: refresh only")
        t("refresh", lambda: spimi._refresh_derived(spark, keep, params))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
