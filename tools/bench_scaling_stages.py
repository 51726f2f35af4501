"""Stage-resolved scaling at pinned local[N] vs local[4N]: isolates the
REDUCE stage (shuffle + arrow shard assembly + partitioned parquet write)
from the map stage (JVM tokenizer + Arrow tf-fold).

Method: materialize the map output (docid, term, tf, shard) to /dev/shm
parquet once, then time, per level, (a) the map stage alone
(postings_source → noop count) and (b) the reduce stage alone (read the
materialized postings → groupBy(shard).applyInArrow → partitioned write).
Each level runs in its own JVM, pinned with taskset to exactly N CPUs;
interleaved trials, best-of kept.

Usage: python tools/bench_scaling_stages.py [n_files] [n_shards] [trials]
Appends a table to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from shutil import which as shutil_which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gazetteer_spark.session import get_spark
from gazetteer_spark.index import spimi

cores = int(sys.argv[1]); src = sys.argv[2]; post = sys.argv[3]
out = sys.argv[4]; n_shards = int(sys.argv[5])
spark = get_spark("scaling_stage", cores=cores, shuffle_partitions=4 * n_shards)
docs = spark.read.parquet(src)
docs.count()  # warm listing/JIT
spimi._postings_source(docs.limit(32 * cores), "docid", "content", False).count()

# map stage: tokenizer + Arrow tf-fold, no shuffle consumed
t0 = time.time()
spimi._postings_source(docs, "docid", "content", False).write.format("noop") \\
    .mode("overwrite").save()
map_sec = time.time() - t0

# reduce stage: pre-materialized postings -> shard shuffle -> arrow
# assembly -> partitioned parquet write (manifest side files included)
postings = spark.read.parquet(post)
postings.count()  # warm
shutil.rmtree(out, ignore_errors=True)
pend = out + "/pending"
t0 = time.time()
seg = postings.groupBy("shard").applyInArrow(
    lambda t: spimi._build_shard_arrow(t, pending_dir=pend),
    spimi.SEGMENT_SCHEMA,
).withColumn("gen", F.lit(0))
seg.write.mode("append").partitionBy("gen", "shard").parquet(out + "/segments")
reduce_sec = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cores": cores, "map_sec": map_sec, "reduce_sec": reduce_sec}}))
"""


def main(n_files: int = 400_000, n_shards: int = 256, n_trials: int = 3,
         n_lo: int = 2, n_hi: int = 8):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="gz_scaling_st_", dir=base)
    src, post = f"{work}/source", f"{work}/postings"
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import functions as F\n"
        "from gazetteer_spark.session import get_spark\n"
        "from gazetteer_spark.corpus import source_files\n"
        "from gazetteer_spark.docs import docid_expr\n"
        "from gazetteer_spark.index import spimi\n"
        "spark = get_spark('gen')\n"
        "df = source_files(spark, %d).withColumn('docid', docid_expr('repo','path','commit'))\n"
        "df.write.mode('overwrite').parquet(%r)\n"
        "p = spimi._postings_source(spark.read.parquet(%r), 'docid', 'content', False)\n"
        "p = p.withColumn('shard', spimi.shard_expr(F.col('docid'), %d))\n"
        "p.write.mode('overwrite').parquet(%r)\n"
        % (REPO, n_files, src, src, n_shards, post)
    )
    print(f"generating {n_files} files + map output → {work}", file=sys.stderr)
    subprocess.run([sys.executable, "-c", gen], check=True)

    import shutil as _sh

    have_taskset = shutil_which("taskset")
    snippet = RUN_SNIPPET.format(repo=REPO)
    best: dict[int, dict] = {}
    for trial in range(n_trials):
        for cores in (n_lo, n_hi):
            out = f"{work}/idx_{cores}_{trial}"
            cmd = [sys.executable, "-c", snippet, str(cores), src, post,
                   out, str(n_shards)]
            if have_taskset:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            r = subprocess.run(cmd, capture_output=True, text=True, check=True)
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
            rec = json.loads(line)
            print(f"local[{cores}] trial {trial}: {line}", file=sys.stderr)
            for key in ("map_sec", "reduce_sec"):
                if cores not in best:
                    best[cores] = dict(rec)
                elif rec[key] < best[cores][key]:
                    best[cores][key] = rec[key]
    ratio = n_hi // n_lo
    eff = {
        key: round(
            (n_files / best[n_hi][key]) / (n_files / best[n_lo][key]) / ratio, 3
        )
        for key in ("map_sec", "reduce_sec")
    }
    summary = {
        "n_files": n_files, "n_shards": n_shards,
        "map_sec": {c: round(best[c]["map_sec"], 2) for c in best},
        "reduce_sec": {c: round(best[c]["reduce_sec"], 2) for c in best},
        "map_efficiency": eff["map_sec"],
        "reduce_efficiency": eff["reduce_sec"],
    }
    print(json.dumps(summary))
    _sh.rmtree(work, ignore_errors=True)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Stage-resolved scaling (pinned {n_lo}→{n_hi}, "
            f"{n_files} files, arrow assembly)\n\n"
            "| stage | local[%d] sec | local[%d] sec | efficiency |\n"
            "|---|---|---|---|\n" % (n_lo, n_hi)
            + "| map (tokenizer + Arrow tf-fold) | %.2f | %.2f | %.3f |\n"
            % (best[n_lo]["map_sec"], best[n_hi]["map_sec"], eff["map_sec"])
            + "| reduce (shuffle + arrow assembly + partitioned write) "
            "| %.2f | %.2f | %.3f |\n"
            % (best[n_lo]["reduce_sec"], best[n_hi]["reduce_sec"],
               eff["reduce_sec"])
        )
    return 0


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    sys.exit(main(*args))
