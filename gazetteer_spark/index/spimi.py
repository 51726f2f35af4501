"""SPIMI-style doc-sharded segment build with checkpoint/resume manifests.

Physical layout under ``out_dir``:

- ``segments/``  parquet partitioned by ``shard``; rows are either
  ``kind='post'`` (one per term: df, cf, varbyte postings, block-max meta)
  or ``kind='docs'`` (one per shard: packed docids + doclens).
- ``termstats/`` parquet: global (term, df, cf) — salted two-level reduce.
- ``stats.json`` corpus stats: n_docs, avgdl, n_shards, analyzer_version.
- ``manifest/``  parquet: one row per committed shard with row/byte metrics
  and an order-insensitive content checksum (the reference's ``mtainf``
  dataset-hash idea, `GazetteerOutWriter.java:1099-1108`) plus lineage.

Scale shape: ONE wide shuffle (postings → shard) + one narrow shuffle
(doc meta → shard) + one tiny shuffle (term stats). Doc-sharding means
hot terms spread uniformly over shards (hash(docid)), so the wide shuffle
is skew-free by construction; the term-stats reduce is where hot-term skew
lives and is handled by the salted reduce (SURVEY §7.3).

Resume: planned = all shards; committed = manifest; todo = anti-join —
the reference's diff/`--append` machinery re-expressed
(`diff/Diff.java:132-235`, `split/Split.java:34-74`). Rebuilding only the
missing shards yields byte-identical logical content (checksums compared in
tests) because docids, shard routing, and in-shard ordering derive from
data, never from execution order.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B, K1
from ..analyzer import postings_arrow
from .codec import block_meta, encode_postings

ANALYZER_VERSION = "tok-v1"  # bump when analyzer semantics change

SEGMENT_SCHEMA = (
    "shard int, kind string, term string, df int, cf long, "
    "postings binary, blockmeta binary"
)


def shard_expr(docid_col, n_shards: int):
    return F.pmod(F.xxhash64(docid_col), F.lit(n_shards)).cast("int")


def _build_shard(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """One shard's postings (docid, term, tf) → segment rows. Runs inside
    applyInPandas: numpy array-at-a-time, Python loop only over the shard's
    vocabulary (each iteration vectorized over that term's postings)."""
    shard = int(pdf["shard"].iloc[0])
    # doclen per doc: every posting of a doc is in its shard (doc-sharded)
    dl = pdf.groupby("docid", sort=True)["tf"].sum()
    doc_ids = dl.index.to_numpy(dtype=np.int64)
    doc_lens = dl.to_numpy(dtype=np.int64)

    srt = pdf.sort_values(["term", "docid"], kind="mergesort")
    terms = srt["term"].to_numpy()
    docids = srt["docid"].to_numpy(dtype=np.int64)
    tfs = srt["tf"].to_numpy(dtype=np.int64)
    # tfnorm with the exact scoring float ops (block-max bound is exact-safe)
    dlen = doc_lens[np.searchsorted(doc_ids, docids)]
    tfnorm = (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dlen / avgdl))

    bounds = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(terms)]])
    rows = []
    for s, e in zip(starts, ends):
        ids, fs, tn = docids[s:e], tfs[s:e], tfnorm[s:e]
        rows.append(
            (
                shard, "post", terms[s], int(e - s), int(fs.sum()),
                encode_postings(ids, fs), block_meta(ids, tn),
            )
        )
    # docmeta row: packed (docid, doclen) for query-time doclen lookup
    rows.append(
        (
            shard, "docs", None, int(len(doc_ids)), int(doc_lens.sum()),
            encode_postings(doc_ids, doc_lens), b"",
        )
    )
    return pd.DataFrame(
        rows, columns=["shard", "kind", "term", "df", "cf", "postings", "blockmeta"]
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 32,
    id_col: str = "docid",
    content_col: str = "content",
    resume: bool = False,
    batch_shards: int | None = None,
) -> dict:
    """Build (or resume) the index. Returns the stats dict."""
    os.makedirs(out_dir, exist_ok=True)
    stats_path = f"{out_dir}/stats.json"
    seg_path = f"{out_dir}/segments"
    man_path = f"{out_dir}/manifest"

    committed: set[int] = set()
    if resume and os.path.exists(man_path) and os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
        if stats["n_shards"] != n_shards or stats["analyzer_version"] != ANALYZER_VERSION:
            raise ValueError("resume with incompatible build parameters")
        committed = {
            r["shard"]
            for r in spark.read.parquet(man_path).select("shard").collect()
        }
    else:
        # corpus stats pass: no shuffle (map + global agg)
        from ..analyzer import doclen_expr

        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(doclen_expr(F.col(content_col))).alias("avgdl"),
        ).collect()[0]
        stats = {
            "n_docs": int(row["n"]),
            "avgdl": float(row["avgdl"]),
            "n_shards": n_shards,
            "analyzer_version": ANALYZER_VERSION,
            "k1": K1,
            "b": B,
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f)

    todo = sorted(set(range(n_shards)) - committed)
    if todo:
        avgdl = stats["avgdl"]
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        postings_all = postings_arrow(docs, id_col, content_col).withColumn(
            "shard", shard_expr(F.col("docid"), n_shards)
        )
        batches = (
            [todo]
            if batch_shards is None
            else [todo[i : i + batch_shards] for i in range(0, len(todo), batch_shards)]
        )
        for batch in batches:
            p = postings_all
            if len(batch) < n_shards:
                p = p.filter(F.col("shard").isin(batch))
            segments = (
                p.repartition(len(batch), "shard")
                .groupBy("shard")
                .applyInPandas(lambda pdf: _build_shard(pdf, avgdl), SEGMENT_SCHEMA)
            )
            # segments land first; the manifest partition is the commit point
            segments.write.mode("overwrite").partitionBy("shard").parquet(seg_path)
            _commit_manifest(spark, out_dir, batch)

    # global term stats — derived from committed segments (cheap relative to
    # the build; always reflects what is on disk). Salt not needed here:
    # per-shard df/cf are already one row per (shard, term), so the groupBy
    # input is pre-reduced — this IS the two-level (salted-by-doc-shard)
    # reduce, with shard as the salt.
    seg = spark.read.parquet(seg_path)
    ts = (
        seg.filter(F.col("kind") == "post")
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").alias("cf"))
    )
    ts.write.mode("overwrite").parquet(f"{out_dir}/termstats")
    return stats


def _commit_manifest(spark: SparkSession, out_dir: str, shards: list[int]) -> None:
    """Write manifest rows for ``shards`` from their WRITTEN segment data —
    metrics + order-insensitive checksum + lineage."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    seg = spark.read.parquet(f"{out_dir}/segments").filter(F.col("shard").isin(shards))
    man = (
        seg.groupBy("shard")
        .agg(
            F.sum(F.when(F.col("kind") == "post", 1).otherwise(0)).alias("n_terms"),
            F.sum(F.when(F.col("kind") == "post", F.col("df"))).alias("n_postings"),
            F.max(F.when(F.col("kind") == "docs", F.col("df"))).alias("n_docs"),
            F.sum(F.length("postings") + F.length("blockmeta")).alias("n_bytes"),
            # order-insensitive checksum; bit_xor never overflows (ANSI mode)
            F.bit_xor(
                F.xxhash64("kind", "term", "df", "cf", "postings", "blockmeta")
            ).alias("checksum"),
        )
        .withColumn("analyzer_version", F.lit(ANALYZER_VERSION))
        .withColumn("status", F.lit("committed"))
    )
    man.write.mode("overwrite").partitionBy("shard").parquet(f"{out_dir}/manifest")


def load_termstats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/termstats")


def load_stats(out_dir: str) -> dict:
    with open(f"{out_dir}/stats.json") as f:
        return json.load(f)


def load_segments(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/segments")


def load_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/manifest")
