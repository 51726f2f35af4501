"""Term-partitioned secondary layout: analytical term scans + index-backed
boolean retrieval.

The primary index is DOC-sharded (spimi.py) — ideal for scoring, wrong for
term-centric analytics (a term's postings are spread over every shard and
generation). This module materializes the orthogonal layout the backlog
calls the "salted term-hash merge as a materialized table": one row per
term holding its fully-merged posting list, hash-partitioned into
``bucket = xxhash64(term) % n_buckets`` parquet partitions.

Scale shape: the build is ONE shuffle of already-compressed posting bytes
(grouped by term-hash bucket, NOT by raw term — the per-bucket reducer
handles many terms vectorized, so a hot term never owns a reduce task by
itself beyond its own bytes); merge is decode → concat → argsort → re-encode
in numpy. Readers prune by partition (bucket) AND parquet min/max on term,
so a lookup of k terms touches ≤ k buckets' row groups.

Tombstones: committed 'dels' generations are applied during the merge
(df/cf recomputed from surviving postings), so the layout is an exact
snapshot of the visible corpus at build time.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import DelIndex, decode_postings, encode_postings

TERM_LAYOUT_SCHEMA = "bucket int, term string, df long, cf long, postings binary"


def term_bucket_expr(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """One bucket's segment rows → one merged row per term. Tombstones are
    generation-ordered (a del masks only older generations — see
    codec.DelIndex), so re-added docids keep their newest postings."""
    bucket = int(pdf["bucket"].iloc[0])
    dels = DelIndex.from_pdf(pdf)

    posts = pdf[pdf["kind"] == "post"]
    out_rows = []
    for term, grp in posts.groupby("term", sort=True):
        parts = []
        for r in grp.itertuples():  # mask per generation, then merge
            ids, tfs = decode_postings(r.postings)
            if dels:
                keep = dels.keep_mask(int(r.gen), ids)
                ids, tfs = ids[keep], tfs[keep]
            parts.append((ids, tfs))
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts]).astype(np.int64)
        if len(parts) > 1:
            order = np.argsort(ids, kind="stable")  # survivors stay disjoint
            ids, tfs = ids[order], tfs[order]
        if len(ids) == 0:
            continue
        buf, _ = encode_postings(ids, tfs)
        out_rows.append((bucket, term, int(len(ids)), int(tfs.sum()), buf))
    out = pd.DataFrame(
        out_rows, columns=["bucket", "term", "df", "cf", "postings"]
    )
    if not out_rows:  # bucket held only dels rows / fully-tombstoned terms
        out = out.astype({"bucket": "int32", "df": "int64", "cf": "int64"})
    return out


def build_term_layout(
    spark: SparkSession, index_dir: str, out_dir: str, n_buckets: int = 64
) -> None:
    """Materialize the term-partitioned layout from COMMITTED segments."""
    from .spimi import committed_segments

    with open(f"{index_dir}/build.json") as f:
        params = json.load(f)
    seg = committed_segments(spark, index_dir)
    rows = seg.filter(F.col("kind").isin(["post", "dels"])).select(
        term_bucket_expr(F.col("term"), n_buckets).alias("bucket"),
        "kind", "term", "postings", "gen",
    )
    # dels rows have term NULL → xxhash64(NULL) bucket; they must reach EVERY
    # bucket (any term may hold deleted docids): explode them across buckets
    dels = rows.filter(F.col("kind") == "dels").drop("bucket")
    dels_all = dels.crossJoin(
        spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    posts = rows.filter(F.col("kind") == "post")
    allrows = posts.unionByName(
        dels_all.select("bucket", "kind", "term", "postings", "gen")
    )
    merged = allrows.groupBy("bucket").applyInPandas(
        _merge_bucket, TERM_LAYOUT_SCHEMA
    )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{out_dir}/terms"
    )
    meta = {"n_buckets": n_buckets, "source_index": os.path.abspath(index_dir),
            "analyzer": params.get("analyzer", "default"),
            "analyzer_version": params["analyzer_version"]}
    tmp = f"{out_dir}/.layout.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{out_dir}/layout.json")


def _load_meta(layout_dir: str) -> dict:
    with open(f"{layout_dir}/layout.json") as f:
        return json.load(f)


def _buckets_for(spark: SparkSession, terms: list[str], n_buckets: int) -> list[int]:
    """Bucket ids of the query terms — one tiny local job (xxhash64 has no
    Python twin; this is driver-side metadata, never data)."""
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(term_bucket_expr(F.col("term"), n_buckets).alias("b")).collect()
    return sorted({r["b"] for r in rows})


def term_postings(
    spark: SparkSession, layout_dir: str, terms: list[str]
) -> DataFrame:
    """(term, docid, tf) for the given terms — partition-pruned (bucket) and
    min/max-pruned (term) scan of the merged layout, decoded Arrow-batched."""
    meta = _load_meta(layout_dir)
    buckets = _buckets_for(spark, terms, meta["n_buckets"])
    rows = (
        spark.read.parquet(f"{layout_dir}/terms")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "postings")
    )

    def decode(iterator):
        for pdf in iterator:
            frames = []
            for r in pdf.itertuples():
                ids, tfs = decode_postings(r.postings)
                frames.append(pd.DataFrame(
                    {"term": r.term, "docid": ids, "tf": tfs.astype(np.int32)}
                ))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame({"term": pd.Series([], dtype="str"),
                                      "docid": pd.Series([], dtype="int64"),
                                      "tf": pd.Series([], dtype="int32")}))

    return rows.mapInPandas(decode, "term string, docid long, tf int")


def boolean_and(
    spark: SparkSession, layout_dir: str, query: str
) -> DataFrame:
    """(docid): conjunctive retrieval served from the term layout — docs
    containing EVERY analyzed query term."""
    from ..analyzer import get_analyzer

    meta = _load_meta(layout_dir)
    tokenize = get_analyzer(meta["analyzer"]).py_tokenize
    terms = sorted(set(tokenize(query)))
    if not terms:
        raise ValueError("empty query after analysis")
    tp = term_postings(spark, layout_dir, terms)
    return (
        tp.groupBy("docid")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("docid")
    )
