"""Diagnose the reduce stage's scaling residual at pinned local[N]:
is the 2->8 efficiency loss a SERIAL TAIL (wall >> sum(task time)/N) or
PER-TASK SLOWDOWN (aggregate task time grows with N — memory-bandwidth
contention on this single-socket box)?

Runs the reduce (pre-materialized postings -> groupBy(shard).applyInArrow
-> partitioned write) once per level in its own pinned JVM and reports,
from the Spark REST status API, per-stage executorRunTime vs wall.

Usage: python tools/diag_reduce_stage.py [n_files] [n_shards]
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
import json, shutil, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gazetteer_spark.session import get_spark
from gazetteer_spark.index import spimi

cores = int(sys.argv[1]); post = sys.argv[2]; out = sys.argv[3]
n_shards = int(sys.argv[4])
spark = get_spark("diag_reduce", cores=cores,
                  shuffle_partitions=4 * n_shards,
                  extra_conf={{"spark.ui.enabled": "true"}})
postings = spark.read.parquet(post)
postings.count()  # warm
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
seg = postings.groupBy("shard").applyInArrow(
    lambda t: spimi._build_shard_arrow(t, pending_dir=out + "/pending"),
    spimi.SEGMENT_SCHEMA,
).withColumn("gen", F.lit(0))
seg.write.mode("append").partitionBy("gen", "shard").parquet(out + "/segments")
wall = time.time() - t0

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.load(urllib.request.urlopen(
    f"{{ui}}/api/v1/applications/{{app}}/stages?status=complete"))
rows = [
    {{
        "stage": s["stageId"], "name": s["name"].split(" at ")[0],
        "tasks": s["numCompleteTasks"],
        "run_sec": round(s["executorRunTime"] / 1000, 2),
        "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 2),
        "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        "out_mb": round(s.get("outputBytes", 0) / 1e6, 1),
    }}
    for s in stages
]
shutil.rmtree(out, ignore_errors=True)
print("DIAG " + json.dumps({{"cores": cores, "wall": round(wall, 2),
                             "stages": rows}}))
"""


def main(n_files: int = 400_000, n_shards: int = 256):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="gz_diag_", dir=base)
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
    try:
        for cores in (2, 8):
            cmd = [sys.executable, "-c", snippet, str(cores), post,
                   f"{work}/idx{cores}", str(n_shards)]
            if which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            r = subprocess.run(cmd, capture_output=True, text=True, check=True)
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("DIAG")][-1]
            print(line)
    finally:
        import shutil as _sh

        _sh.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
