"""Training-data pipeline ops: context chunking, deterministic dataset
splits, balanced per-group sampling.

The reference's export stage slices and routes its corpus deterministically
(split by pre-sorted key ranges, `split/Split.java`; per-type out handlers,
`join/out_handlers/`); a 100-TB LLM data pipeline needs the same moves over
documents: cut each doc into fixed-token-budget training chunks, assign
every doc a stable train/val/test split, and draw balanced per-group
samples. All three are pure JVM expression chains (no UDFs, no joins, no
driver state): chunking is a sequence+explode fan-out, split assignment and
sampling keys are the engine's md5→int64 bridge (deterministic across
runs, partitions, and engines — the same bridge the dedup family uses, so
DuckDB oracles reproduce them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..analyzer import doclen_expr

# md5→int64 bridge (see CLAUDE.md): top 60 bits of md5 as a positive long.
# DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT


def _hash_key(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def chunk_spans(
    docs: DataFrame, id_col: str, content_col: str,
    size: int = 512, overlap: int = 64,
) -> DataFrame:
    """(docid, chunk_id, start_tok, n_tok): fixed-size token windows with
    overlap — the standard context-window chunking for LLM training data.

    Chunk i starts at ``i * (size - overlap)`` (0-based token offsets) and
    runs ``min(size, doclen - start)`` tokens; every document emits at
    least one chunk (empty docs emit one zero-length chunk so no row is
    silently dropped). Token counts use the frozen analyzer, so the DuckDB
    oracle reproduces the spans exactly. Pure JVM: one doclen expression +
    one sequence/posexplode fan-out — at 100 TB this is a map-only plan."""
    if size <= overlap:
        raise ValueError("size must exceed overlap")
    step = size - overlap
    # null content → 0 tokens (one empty chunk), not a dropped row
    dl = F.coalesce(doclen_expr(F.col(content_col)), F.lit(0))
    # number of chunks: 1 + ceil(max(doclen - size, 0) / step), via
    # integer arithmetic: 1 + floor((max(dl - size, 0) + step - 1) / step)
    extra = F.greatest(dl - F.lit(size), F.lit(0))
    n_chunks = (F.lit(1)
                + F.floor((extra + F.lit(step - 1)) / F.lit(step))).cast("int")
    return (
        docs.select(
            F.col(id_col).alias("docid"),
            dl.alias("doclen"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_id", "_i"),
        )
        .select(
            "docid",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            (F.col("chunk_id") * step).cast("int").alias("start_tok"),
            F.least(
                F.lit(size),
                F.col("doclen") - F.col("chunk_id") * step,
            ).cast("int").alias("n_tok"),
        )
    )


def dataset_split(
    docs: DataFrame, id_col: str,
    weights: dict[str, float] | None = None, buckets: int = 1000,
) -> DataFrame:
    """(docid, split): stable train/val/test assignment — hash the docid
    into ``buckets`` and carve contiguous ranges per split (weights in the
    given dict order, remainder to the last split). Deterministic across
    runs, engines, and partitionings: same doc → same split forever, which
    is the property leakage-free eval at corpus scale needs."""
    weights = weights or {"train": 0.95, "val": 0.025, "test": 0.025}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    b = F.pmod(_hash_key(F.col(id_col).cast("string")), F.lit(buckets))
    expr = None
    hi = 0
    names = list(weights)
    for name in names[:-1]:
        hi += int(round(weights[name] * buckets))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return docs.select(F.col(id_col).alias("docid"), expr.alias("split"))


def pack_sequences(
    docs: DataFrame, id_col: str, content_col: str,
    budget: int = 512, n_buckets: int = 16,
) -> DataFrame:
    """(docid, bucket, start_tok, pack_id, pack_offset): concat-and-pack
    sequence assignment — documents are concatenated in deterministic hash
    order WITHIN hash buckets and cut into fixed token-budget training
    sequences; each doc records its start offset in its bucket's token
    stream, the pack (sequence) its first token lands in, and the offset
    inside that pack.

    The standard LLM pretraining packing (concat-then-chunk): docs may
    straddle pack boundaries — compose with chunk_spans when intra-doc
    windows are wanted. Token counts use the frozen analyzer, ordering the
    md5 bridge, so the assignment is deterministic across runs, engines,
    and partitionings.

    Scale shape: a pack stream is inherently sequential, so the parallelism
    unit is the BUCKET — the running offset is a window cumsum per bucket
    (one shuffle on the bucket key, no global single-task sort). Size
    n_buckets so a bucket's token stream fits a reduce task comfortably
    (corpus_tokens / n_buckets ≈ 10^8-10^9 tokens at 100 TB → n_buckets in
    the 10^4-10^5 range); buckets are independent pack streams, exactly how
    a 1000-executor packing job would shard its output anyway."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = _hash_key(F.col(id_col).cast("string"))
    dl = F.coalesce(doclen_expr(F.col(content_col)), F.lit(0))
    base = docs.select(
        F.col(id_col).alias("docid"),
        F.pmod(key, F.lit(n_buckets)).cast("int").alias("bucket"),
        key.alias("_key"),
        dl.alias("_dl"),
    )
    w = (
        W.partitionBy("bucket")
        .orderBy(F.col("_key").asc(), F.col("docid").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("_dl").over(w), F.lit(0))
    return base.select(
        "docid", "bucket",
        start.cast("long").alias("start_tok"),
        F.floor(start / budget).cast("int").alias("pack_id"),
        F.pmod(start, F.lit(budget)).cast("int").alias("pack_offset"),
    )


def balanced_sample(
    docs: DataFrame, id_col: str, group_col: str, n_per_group: int,
) -> DataFrame:
    """(docid, group, sample_rank): up to ``n_per_group`` docs per group,
    chosen by deterministic hash order (md5 bridge, docid tiebreak) — the
    balanced per-class subsample (per language, per source, per label)
    that keeps skewed corpora from drowning small groups. One window over
    the group partitioning — a single shuffle on the group key; groups are
    bounded by n_per_group on output, so the result is driver-safe.

    Scale shape: the row_number ≤ n filter triggers Catalyst's
    WindowGroupLimit pushdown — a PARTIAL group-limit below the exchange
    keeps at most n rows per (input partition, group), so shuffle volume is
    ≤ partitions × groups × n and the post-shuffle sort per group runs over
    those bounded survivors, never a giant group's full row set
    (plan-pinned in tests/test_plans.py)."""
    key = _hash_key(F.col(id_col).cast("string"))
    win = W.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.select(
            F.col(id_col).alias("docid"),
            F.col(group_col).alias("group"),
            F.row_number().over(win).cast("int").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= n_per_group)
    )
