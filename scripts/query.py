"""spark-submit entry point: queries against an index.

Usage:
  spark-submit --py-files gazetteer_spark.zip scripts/query.py \
      --index /path/to/index --query "parse http response" [--k 10]
  # or a batch file with one query per line:
  ... --queries-file queries.txt
  # retrieval modes:
  ...   --mode or       disjunctive block-max BM25 top-k (default)
  ...   --mode and      conjunctive: docs holding EVERY term, BM25-ranked
  ...   --mode phrase   exact adjacent-token phrase (positional index)
  ...   --mode phrase-topk   phrase matches RANKED by BM25 (positional)
  ...   --mode near --near-k 3   two terms within k tokens (positional)
  ...   --mode near-n [--ordered] --near-k 3   N terms within k (positional)
  ...   --mode fielded --boosts body=1,src=2    BM25F over a fielded index
  ...   --mode fielded-phrase --field body   exact phrase WITHIN one field
  ...                                        (fielded index, positions=True)
  ...   --mode fielded-near --field body --near-k 3   NEAR/k within a field
  ...   --mode fuzzy --fuzzy-layout DIR   containment lookup (query = one
  ...                                     fragment; gram index + verify)
  ...   --mode fuzzy-edit --fuzzy-layout DIR [--max-edits 1]   typo-tolerant
  ...                                     lookup (Levenshtein over dictionary)
  ...   --mode layout-bm25 --term-layout DIR   BM25 top-k served from the
  ...                                     term-partitioned layout (bucket-
  ...                                     pruned point-query path)
  ...   --mode layout-and --term-layout DIR    conjunctive (every term) +
  ...                                     BM25 rank from the same layout
  ...   --mode layout-bm25f --term-layout DIR --boosts body=1,src=2
  ...                                     BM25F from a FIELDED term layout
  ...                                     (doclens=True source)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# robust without --py-files: resolve the package from the repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_boosts(spec: str | None) -> dict[str, float]:
    boosts: dict[str, float] = {}
    if spec:
        for kv in spec.split(","):
            name, val = kv.split("=")
            boosts[name] = float(val)
    return boosts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and", "phrase", "phrase-topk",
                                       "near", "near-n", "fielded",
                                       "fielded-phrase", "fielded-near",
                                       "fuzzy", "fuzzy-edit", "layout-bm25",
                                       "layout-and", "layout-bm25f"],
                    default="or")
    ap.add_argument("--field", default=None,
                    help="fielded-phrase / fielded-near: the field to match in")
    ap.add_argument("--near-k", type=int, default=3,
                    help="token distance for --mode near/near-n")
    ap.add_argument("--ordered", action="store_true",
                    help="near-n: require terms in order (chained gaps ≤ k)")
    ap.add_argument("--boosts", default=None,
                    help="fielded: per-field boosts, e.g. body=1,src=2")
    ap.add_argument("--fuzzy-layout", default=None,
                    help="fuzzy: gram-over-dictionary layout dir "
                         "(build with scripts/build_index.py --fuzzy-from)")
    ap.add_argument("--max-edits", type=int, default=1,
                    help="fuzzy-edit: Levenshtein distance bound")
    ap.add_argument("--term-layout", default=None,
                    help="layout-bm25: term-partitioned layout dir (build "
                         "with scripts/build_index.py --term-layout-from)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from gazetteer_spark.index import phrase, wand

    if args.query:
        queries = [(0, args.query)]
    elif args.queries_file:
        with open(args.queries_file) as f:
            queries = [(i, ln.strip()) for i, ln in enumerate(f) if ln.strip()]
    else:
        raise SystemExit("need --query or --queries-file")

    spark = SparkSession.builder.appName("gazetteer_query").getOrCreate()
    t0 = time.time()
    out: dict = {}
    if args.mode in ("or", "and"):
        fn = wand.topk if args.mode == "or" else wand.topk_and
        for r in fn(spark, args.index, queries, k=args.k).collect():
            out.setdefault(r["query_id"], []).append(
                {"rank": r["rank"], "docid": r["docid"], "score": r["score"]}
            )
    elif args.mode == "phrase":
        # batched: ONE scan + one job for the whole query file
        for r in phrase.phrase_match_batch(spark, args.index, queries).collect():
            out.setdefault(r["query_id"], []).append(
                {"docid": r["docid"], "n_occurrences": r["n_occurrences"]})
    elif args.mode == "phrase-topk":
        for r in (phrase.phrase_topk_batch(spark, args.index, queries,
                                           k=args.k)
                  .orderBy("query_id", "rank").collect()):
            out.setdefault(r["query_id"], []).append(
                {"rank": r["rank"], "docid": r["docid"], "score": r["score"]})
    elif args.mode == "near":
        for qid, text in queries:
            parts = text.split()
            if len(parts) != 2:
                raise SystemExit("--mode near expects exactly two terms per query")
            rows = phrase.near_match(
                spark, args.index, parts[0], parts[1], k=args.near_k
            ).collect()
            out[qid] = [{"docid": r["docid"], "n_pairs": r["n_pairs"]}
                        for r in rows]
    elif args.mode == "near-n":
        nq = [(qid, text.split()) for qid, text in queries]
        for r in phrase.near_match_n_batch(
            spark, args.index, nq, k=args.near_k, ordered=args.ordered,
        ).collect():
            out.setdefault(r["query_id"], []).append(
                {"docid": r["docid"], "n_anchors": r["n_anchors"]})
    elif args.mode == "fielded":
        from gazetteer_spark import fielded

        boosts = _parse_boosts(args.boosts)
        for r in fielded.fielded_topk(spark, args.index, queries,
                                      boosts=boosts, k=args.k).collect():
            out.setdefault(r["query_id"], []).append(
                {"rank": r["rank"], "docid": r["docid"], "score": r["score"]}
            )
    elif args.mode in ("fielded-phrase", "fielded-near"):
        from gazetteer_spark import fielded

        if not args.field:
            raise SystemExit(f"--mode {args.mode} needs --field")
        for qid, text in queries:
            if args.mode == "fielded-phrase":
                rows = fielded.fielded_phrase_match(
                    spark, args.index, args.field, text
                ).collect()
                out[qid] = [{"docid": r["docid"],
                             "n_occurrences": r["n_occurrences"]}
                            for r in rows]
            else:
                parts = text.split()
                if len(parts) != 2:
                    raise SystemExit(
                        "--mode fielded-near expects exactly two terms")
                rows = fielded.fielded_near_match(
                    spark, args.index, args.field, parts[0], parts[1],
                    k=args.near_k,
                ).collect()
                out[qid] = [{"docid": r["docid"], "n_pairs": r["n_pairs"]}
                            for r in rows]
    elif args.mode in ("layout-bm25", "layout-and", "layout-bm25f"):
        from gazetteer_spark.index import termindex

        if not args.term_layout:
            raise SystemExit(f"--mode {args.mode} needs --term-layout")
        if args.mode == "layout-bm25f":
            boosts = _parse_boosts(args.boosts)
            fn = lambda s, d, q, k: termindex.bm25f_topk(  # noqa: E731
                s, d, q, boosts=boosts, k=k)
        else:
            fn = (termindex.bm25_topk if args.mode == "layout-bm25"
                  else termindex.bm25_and_topk)
        for r in fn(spark, args.term_layout, queries, k=args.k).collect():
            out.setdefault(r["query_id"], []).append(
                {"rank": r["rank"], "docid": r["docid"], "score": r["score"]}
            )
    else:  # fuzzy / fuzzy-edit
        from gazetteer_spark import fuzzy

        if not args.fuzzy_layout:
            raise SystemExit(f"--mode {args.mode} needs --fuzzy-layout")
        edits = args.max_edits if args.mode == "fuzzy-edit" else None
        for qid, text in queries:
            rows = fuzzy.fuzzy_docs(
                spark, args.fuzzy_layout, args.index, text, max_edits=edits
            ).collect()
            out[qid] = [{"docid": r["docid"]} for r in rows]
    dt = time.time() - t0
    print(json.dumps({"mode": args.mode, "sec": round(dt, 3), "results": out}))


if __name__ == "__main__":
    sys.exit(main())
