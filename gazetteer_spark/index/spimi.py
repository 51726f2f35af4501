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

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B, K1
from ..analyzer import postings_arrow
from .codec import block_meta_grouped, encode_postings, encode_postings_grouped

ANALYZER_VERSION = "tok-v1"  # bump when analyzer semantics change

SEGMENT_SCHEMA = (
    "shard int, kind string, term string, df int, cf long, "
    "postings binary, blockmeta binary"
)


def shard_expr(docid_col, n_shards: int):
    return F.pmod(F.xxhash64(docid_col), F.lit(n_shards)).cast("int")


def _build_shard(pdf: pd.DataFrame, pending_dir: str | None = None) -> pd.DataFrame:
    """One shard's postings (docid, term, tf) → segment rows. Runs inside
    applyInPandas: numpy array-at-a-time, Python loop only over the shard's
    vocabulary (each iteration vectorized over that term's postings)."""
    shard = int(pdf["shard"].iloc[0])
    raw_ids = pdf["docid"].to_numpy(dtype=np.int64)
    raw_tfs = pdf["tf"].to_numpy(dtype=np.int64)
    raw_terms = pdf["term"].to_numpy()

    # doclen per doc: every posting of a doc is in its shard (doc-sharded)
    doc_order = np.argsort(raw_ids, kind="stable")
    sorted_ids = raw_ids[doc_order]
    doc_bounds = np.nonzero(sorted_ids[1:] != sorted_ids[:-1])[0] + 1
    doc_starts = np.concatenate([[0], doc_bounds])
    doc_ids = sorted_ids[doc_starts]
    doc_lens = np.add.reduceat(raw_tfs[doc_order], doc_starts)

    # sort by (term, docid): terms via stable argsort on the object array
    order = np.lexsort((raw_ids, raw_terms))
    terms = raw_terms[order]
    docids = raw_ids[order]
    tfs = raw_tfs[order]
    dlen = doc_lens[np.searchsorted(doc_ids, docids)]

    bounds = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    ends = np.concatenate([bounds, [len(terms)]]).astype(np.int64)

    posts = encode_postings_grouped(docids, tfs, starts, ends)
    metas = block_meta_grouped(docids, tfs, dlen, starts, ends)
    dfs = (ends - starts).astype(np.int64)
    cfs = np.add.reduceat(tfs, starts)
    rows = [
        (shard, "post", terms[s], int(df), int(cf), p, m)
        for s, df, cf, p, m in zip(starts, dfs, cfs, posts, metas)
    ]
    # docmeta row: packed (docid, doclen) for query-time doclen lookup
    docs_row = (
        shard, "docs", None, int(len(doc_ids)), int(doc_lens.sum()),
        encode_postings(doc_ids, doc_lens), b"",
    )
    rows.append(docs_row)

    # shard manifest computed here, while the data is in memory — avoids a
    # second full read+hash of the postings bytes. Checksum = sha256 over
    # rows in term-sorted order (deterministic: in-shard order derives from
    # data). The metrics land as a tiny side file under manifest_pending/ —
    # the Iceberg pattern: tasks write data + metadata files, the driver
    # commit promotes metadata. Rewrites on task retry are byte-identical
    # (content is a pure function of the shard's data), so this is safe.
    h = hashlib.sha256()
    n_bytes = 0
    for r in rows:
        h.update((r[2] or "").encode())
        h.update(r[5])
        h.update(r[6])
        n_bytes += len(r[5]) + len(r[6])
    metrics = {
        "shard": shard,
        "n_terms": len(rows) - 1,
        "n_postings": int(tfs.size),
        "n_docs": int(len(doc_ids)),
        "sum_doclen": int(doc_lens.sum()),
        "n_bytes": n_bytes,
        "checksum": h.hexdigest(),
    }
    if pending_dir is not None:
        os.makedirs(pending_dir, exist_ok=True)
        tmp = f"{pending_dir}/.shard_{shard}.tmp"
        with open(tmp, "w") as f:
            json.dump(metrics, f, sort_keys=True)
        os.replace(tmp, f"{pending_dir}/shard_{shard}.json")
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
    """Build (or resume) the index. Returns the stats dict.

    Single-pass: the block-max metadata is avgdl-free (codec.block_meta), so
    no corpus-stats pre-pass is needed — corpus stats are aggregated from the
    committed manifest afterwards.
    """
    os.makedirs(out_dir, exist_ok=True)
    build_path = f"{out_dir}/build.json"
    seg_path = f"{out_dir}/segments"
    man_path = f"{out_dir}/manifest"
    params = {"n_shards": n_shards, "analyzer_version": ANALYZER_VERSION,
              "k1": K1, "b": B}

    committed: set[int] = set()
    if resume and os.path.exists(man_path) and os.path.exists(build_path):
        with open(build_path) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError("resume with incompatible build parameters")
        import pyarrow.parquet as pq

        committed = set(
            pq.read_table(man_path, columns=["shard"])["shard"].to_pylist()
        )
    else:
        with open(build_path, "w") as f:
            json.dump(params, f)

    todo = sorted(set(range(n_shards)) - committed)
    if todo:
        # pre-clean uncommitted shard dirs (a killed run may have written
        # segment data whose manifest commit never landed)
        for s in todo:
            d = f"{seg_path}/shard={s}"
            if os.path.exists(d):
                shutil.rmtree(d)
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
            # groupBy itself shuffles on the group key — an explicit
            # repartition would be a second, redundant shuffle. With
            # shuffle.partitions > n_shards the hash collisions that would
            # otherwise double-load some reduce tasks spread out, and AQE
            # coalesces the empties. Append mode: shard dirs are disjoint
            # across batches, so no overwrite machinery (listing + per-dir
            # renames on the driver) is paid.
            pending = f"{out_dir}/manifest_pending"

            def build_with_pending(pdf: pd.DataFrame) -> pd.DataFrame:
                return _build_shard(pdf, pending_dir=pending)

            segments = p.groupBy("shard").applyInPandas(
                build_with_pending, SEGMENT_SCHEMA
            )
            segments.write.mode("append").partitionBy("shard").parquet(seg_path)
            # segments land first; the manifest row is the commit point
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

    # corpus stats from the committed manifest (n_docs, avgdl) — driver-side
    import pyarrow.parquet as pq

    mt = pq.read_table(f"{out_dir}/manifest", columns=["n_docs", "sum_doclen"])
    n = sum(mt["n_docs"].to_pylist())
    total_len = sum(mt["sum_doclen"].to_pylist())
    stats = {
        "n_docs": int(n),
        "avgdl": float(total_len) / float(n) if n else 0.0,
        **params,
    }
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(stats, f)
    return stats


def _commit_manifest(spark: SparkSession, out_dir: str, shards: list[int]) -> None:
    """Promote the pending per-task metadata files of ``shards`` to the
    manifest table — the durable commit point. Pure driver-side metadata
    I/O (the Iceberg commit pattern): no Spark job, no data-file reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    recs = []
    for s in shards:
        with open(f"{out_dir}/manifest_pending/shard_{s}.json") as f:
            m = json.load(f)
        assert m["shard"] == s
        m["analyzer_version"] = ANALYZER_VERSION
        m["status"] = "committed"
        recs.append(m)
    table = pa.Table.from_pylist(recs)
    os.makedirs(f"{out_dir}/manifest", exist_ok=True)
    # one small file per commit batch; committed shard sets are disjoint
    tmp = f"{out_dir}/manifest/.batch_{min(shards)}_{max(shards)}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{out_dir}/manifest/batch_{min(shards)}_{max(shards)}.parquet")


def load_termstats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/termstats")


def load_stats(out_dir: str) -> dict:
    with open(f"{out_dir}/stats.json") as f:
        return json.load(f)


def load_segments(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/segments")


def load_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/manifest")
