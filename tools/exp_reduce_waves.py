"""A/B: AQE-coalesced reduce (groupBy alone → ~cores tasks, ragged waves)
vs explicit repartition(n_shards, shard) → 256 fine-grained tasks.
Pinned local[2] and local[8], interleaved, min-of-N. Quiet window only.

Usage: python tools/exp_reduce_waves.py [n_files] [n_shards] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gazetteer_spark.session import get_spark
from gazetteer_spark.index import spimi

cores = int(sys.argv[1]); post = sys.argv[2]; out = sys.argv[3]
n_shards = int(sys.argv[4]); mode = sys.argv[5]
spark = get_spark("exp_waves", cores=cores, shuffle_partitions=4 * n_shards)
postings = spark.read.parquet(post)
postings.count()

def run(tag, src):
    o = out + "_" + tag
    shutil.rmtree(o, ignore_errors=True)
    t0 = time.time()
    seg = src.groupBy("shard").applyInArrow(
        lambda t: spimi._build_shard_arrow(t, pending_dir=o + "/pending"),
        spimi.SEGMENT_SCHEMA,
    ).withColumn("gen", F.lit(0))
    seg.write.mode("append").partitionBy("gen", "shard").parquet(o + "/segments")
    dt = time.time() - t0
    shutil.rmtree(o, ignore_errors=True)
    return dt

# warm (JIT) with a small slice
run("warm", postings.limit(200000))
res = {{}}
res["aqe"] = run("aqe", postings)
res["repart"] = run("repart", postings.repartition(n_shards, F.col("shard")))
print("WAVES " + json.dumps({{"cores": cores, **res}}))
"""


def main(n_files: int = 400_000, n_shards: int = 256, trials: int = 2):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="gz_waves_", dir=base)
    post = f"{work}/postings"
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import functions as F\n"
        "from gazetteer_spark.session import get_spark\n"
        "from gazetteer_spark.corpus import source_files\n"
        "from gazetteer_spark.docs import docid_expr\n"
        "from gazetteer_spark.index import spimi\n"
        "spark = get_spark('gen')\n"
        "df = source_files(spark, %d).withColumn('docid', docid_expr('repo','path','commit'))\n"
        "p = spimi._postings_source(df, 'docid', 'content', False)\n"
        "p = p.withColumn('shard', spimi.shard_expr(F.col('docid'), %d))\n"
        "p.write.mode('overwrite').parquet(%r)\n"
        % (REPO, n_files, n_shards, post)
    )
    print(f"generating postings -> {work}", file=sys.stderr)
    subprocess.run([sys.executable, "-c", gen], check=True,
                   capture_output=True, text=True)
    snippet = SNIPPET.format(repo=REPO)
    best: dict[tuple[int, str], float] = {}
    try:
        for t in range(trials):
            for cores in (2, 8):
                cmd = [sys.executable, "-c", snippet, str(cores), post,
                       f"{work}/idx{cores}", str(n_shards), "both"]
                if which("taskset"):
                    cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   check=True)
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("WAVES")][-1]
                rec = json.loads(line[6:])
                print(f"trial {t} {line}", file=sys.stderr)
                for k in ("aqe", "repart"):
                    key = (cores, k)
                    best[key] = min(best.get(key, 1e9), rec[k])
        out = {
            "best": {f"{c}_{k}": round(v, 2) for (c, k), v in best.items()},
            "eff_aqe": round(best[(2, "aqe")] / best[(8, "aqe")] / 4, 3),
            "eff_repart": round(
                best[(2, "repart")] / best[(8, "repart")] / 4, 3),
        }
        print(json.dumps(out))
    finally:
        import shutil as _sh

        _sh.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
