"""One-process interleaved A/B of the reduce stage (shard assembly + write)
at 100k docs: pandas applyInPandas vs arrow applyInArrow, plus parquet
codec variants. min-of-N reported; run in a quiet window only."""

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

N = int(os.environ.get("EXP_FILES", "100000"))
TRIALS = int(os.environ.get("EXP_TRIALS", "3"))
SHARDS = 128


def main():
    spark = get_spark("exp_reduce", cores=32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    work = tempfile.mkdtemp(prefix="gz_exp_", dir="/dev/shm")
    try:
        src = source_files(spark, N).withColumn(
            "docid", docid_expr("repo", "path", "commit"))
        src.write.mode("overwrite").parquet(f"{work}/source")
        big = spark.read.parquet(f"{work}/source")
        big.count()

        postings = spimi._postings_source(big, "docid", "content", False) \
            .withColumn("shard", spimi.shard_expr(F.col("docid"), SHARDS))

        def run(tag, fn):
            out = f"{work}/idx_{tag}"
            pend = f"{out}/pending"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            fn(out, pend)
            dt = time.time() - t0
            shutil.rmtree(out, ignore_errors=True)
            return dt

        def pandas_path(out, pend):
            seg = postings.groupBy("shard").applyInPandas(
                lambda pdf: spimi._build_shard(pdf, pending_dir=pend),
                spimi.SEGMENT_SCHEMA)
            seg.write.mode("overwrite").parquet(out + "/seg")

        def arrow_path(out, pend):
            seg = postings.groupBy("shard").applyInArrow(
                lambda t: spimi._build_shard_arrow(t, pending_dir=pend),
                spimi.SEGMENT_SCHEMA)
            seg.write.mode("overwrite").parquet(out + "/seg")

        def arrow_zstd(out, pend):
            seg = postings.groupBy("shard").applyInArrow(
                lambda t: spimi._build_shard_arrow(t, pending_dir=pend),
                spimi.SEGMENT_SCHEMA)
            seg.write.mode("overwrite").option("compression", "zstd") \
               .parquet(out + "/seg")

        variants = {"pandas": pandas_path, "arrow": arrow_path,
                    "arrow_zstd": arrow_zstd}
        results = {k: [] for k in variants}
        # warm-up once (JIT, codegen) on the arrow path
        run("warm", arrow_path)
        for t in range(TRIALS):
            for name, fn in variants.items():
                results[name].append(round(run(name, fn), 2))
        for name, rs in results.items():
            print(f"{name}: min={min(rs)} all={rs}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
