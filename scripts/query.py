"""spark-submit entry point: block-max BM25 top-k queries against an index.

Usage:
  spark-submit --py-files gazetteer_spark.zip scripts/query.py \
      --index /path/to/index --query "parse http response" [--k 10]
  # or a batch file with one query per line:
  ... --queries-file queries.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# robust without --py-files: resolve the package from the repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from gazetteer_spark.index import wand

    if args.query:
        queries = [(0, args.query)]
    elif args.queries_file:
        with open(args.queries_file) as f:
            queries = [(i, ln.strip()) for i, ln in enumerate(f) if ln.strip()]
    else:
        raise SystemExit("need --query or --queries-file")

    spark = SparkSession.builder.appName("gazetteer_query").getOrCreate()
    t0 = time.time()
    rows = wand.topk(spark, args.index, queries, k=args.k).collect()
    dt = time.time() - t0
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            {"rank": r["rank"], "docid": r["docid"], "score": r["score"]}
        )
    print(json.dumps({"sec": round(dt, 3), "results": out}))


if __name__ == "__main__":
    sys.exit(main())
