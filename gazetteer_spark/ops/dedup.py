"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hash math uses the md5→int64 construction (first 15 hex digits of md5 as
a 60-bit integer) so DuckDB oracles can reproduce values bit-for-bit; the
reference's analog is its deterministic canonical-JSON md5 row hashing
(`utils/JSONHash.java:23-69`) and UNIQUE-mode dedup via 64-bit row hashes
(`GazetteerOutWriter.java:215-218,353-362`).

Scale notes: exact dedup and LSH bucketing are plain groupBy/self-join on
hash keys — skew-free (hash keys), broadcast-free. The verify stage of
MinHash/Jaccard joins only CANDIDATE pairs (band-collided), the classic
candidate-then-verify shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import shingles_expr, tokens_expr
from . import HASH_PRIME

# deterministic MinHash coefficients (seeded, frozen; must match oracle SQL)
N_HASHES = 16
MINHASH_A = [(7 + 13 * i * i + 29 * i) % HASH_PRIME or 1 for i in range(1, N_HASHES + 1)]
MINHASH_B = [(11 + 31 * i + 17 * i * i * i) % HASH_PRIME for i in range(1, N_HASHES + 1)]
N_BANDS = 4  # 4 bands × 4 rows


def md5int_expr(col):
    """First 15 hex digits of md5 as int64 — identical in DuckDB via
    CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, canonical, cluster_size): exact duplicates by content hash;
    canonical = min docid of the cluster (deterministic winner, the
    reference's idempotent min-centroid choice, JoinSliceRunable.java:454-468)."""
    h = df.select(
        F.col(id_col).alias("docid"), F.sha2(F.col(content_col), 256).alias("chash")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("chash")
    return (
        h.withColumn("canonical", F.min("docid").over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select("docid", "canonical", "cluster_size")
    )


def shingle_rows(df: DataFrame, id_col: str, content_col: str, n: int = 3) -> DataFrame:
    """(docid, shingle) distinct n-token shingles per doc."""
    return df.select(
        F.col(id_col).alias("docid"),
        F.explode(
            F.array_distinct(shingles_expr(tokens_expr(F.col(content_col)), n))
        ).alias("shingle"),
    )


def minhash_signatures(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, sig_0..sig_15): MinHash over 3-token shingle md5-hashes."""
    sh = shingle_rows(df, id_col, content_col).withColumn(
        "h", F.pmod(md5int_expr(F.col("shingle")), F.lit(HASH_PRIME))
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(HASH_PRIME))).alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy("docid").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """(docid_a, docid_b) pairs sharing at least one LSH band (4 bands × 4 rows)."""
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            sigs.select(
                "docid",
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col(c) for c in cols]).alias("key"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionAll(x)
    a = allb.alias("a")
    bb = allb.alias("b")
    return (
        a.join(bb, ["band", "key"])
        .filter(F.col("a.docid") < F.col("b.docid"))
        .select(
            F.col("a.docid").alias("docid_a"), F.col("b.docid").alias("docid_b")
        )
        .distinct()
    )


MAX_SHINGLE_DF = 1000


def jaccard_pairs(
    df: DataFrame, id_col: str, content_col: str,
    threshold: float = 0.8, candidates: DataFrame | None = None,
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """(docid_a, docid_b, jaccard): exact shingle-set Jaccard for all pairs
    (or only ``candidates``) meeting the threshold. jaccard rounded to 6dp
    for stable oracle comparison.

    Hot-shingle cap: shingles appearing in more than ``max_df`` docs are
    dropped BEFORE the pair join (standard near-dup practice — a shingle in
    m docs emits m² pair rows, the quadratic skew-killer at corpus scale).
    Set sizes (the Jaccard denominator) still count every shingle, so the
    cap can only UNDER-estimate similarity of pairs that shared a hot
    shingle — the documented recall trade-off. max_df=None disables.

    Candidate gate pushdown: when ``candidates`` is given, the candidate
    DOCIDS semi-join onto the shingle rows on BOTH sides BEFORE the pair
    join (shrinking the heavy join itself to candidate docs only); the
    exact pair-level semi-join still runs after aggregation, since two
    docids each in some candidate pair need not form a candidate PAIR."""
    sh = shingle_rows(df, id_col, content_col)
    sizes = sh.groupBy("docid").agg(F.count(F.lit(1)).alias("nsh"))
    shc = sh
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_sh"))
            .filter(F.col("df_sh") > max_df)
            .select("shingle")
        )
        # hot list is tiny by construction → broadcast anti-join
        shc = sh.join(F.broadcast(hot), "shingle", "left_anti")
    if candidates is not None:
        cand_docids = (
            candidates.select(F.col("docid_a").alias("docid"))
            .unionAll(candidates.select(F.col("docid_b").alias("docid")))
            .distinct()
        )
        shc = shc.join(cand_docids, "docid", "left_semi")
    a = shc.alias("a")
    b = shc.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.docid") < F.col("b.docid"))
        .groupBy(F.col("a.docid").alias("docid_a"), F.col("b.docid").alias("docid_b"))
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["docid_a", "docid_b"], "left_semi")
    sa = sizes.select(F.col("docid").alias("docid_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("docid").alias("docid_b"), F.col("nsh").alias("nb"))
    return (
        inter.join(sa, "docid_a")
        .join(sb, "docid_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("ninter") / (F.col("na") + F.col("nb") - F.col("ninter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("docid_a", "docid_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, content_col: str, threshold: float = 0.8
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verify. Candidates
    are persisted: the verify stage references them twice (docid gate pushed
    below the pair join + the exact pair-level semi), and recomputing the
    LSH band join would double the candidate-generation cost.

    Cache lifetime is scoped to the RETURNED handle only: the candidate
    DataFrame rides on it as ``_lsh_candidates`` — callers that materialize
    the result should ``out._lsh_candidates.unpersist()`` to release
    executor memory eagerly; otherwise Spark's ContextCleaner frees the
    cache when the handle is garbage-collected. No module-global lifetime:
    an earlier call's lazily-consumed result can never have its cache
    yanked by a later call, and concurrent callers are safe."""
    cands = lsh_candidate_pairs(
        minhash_signatures(df, id_col, content_col)
    ).persist()
    out = jaccard_pairs(df, id_col, content_col, threshold, candidates=cands)
    out._lsh_candidates = cands
    return out


SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, simhash): 32-bit SimHash over tf-weighted term hashes."""
    t = df.select(
        F.col(id_col).alias("docid"),
        F.explode(tokens_expr(F.col(content_col))).alias("term"),
    )
    tf = t.groupBy("docid", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("h", F.pmod(md5int_expr(F.col("term")), F.lit(1 << 32)))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    v = tf.groupBy("docid").agg(*votes)
    acc = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return v.select("docid", acc.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, content_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """(docid_a, docid_b, hamming ≤ max): banded SimHash near-dup pairs.

    Candidate generation: split the 32-bit hash into 4 bytes; any pair
    within hamming ≤ 3 shares at least one exact byte (pigeonhole)."""
    s = simhash(df, id_col, content_col)
    bands = []
    for b in range(4):
        bands.append(
            s.select(
                "docid", "simhash",
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias("key"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionAll(x)
    a, bb = allb.alias("a"), allb.alias("b")
    pairs = (
        a.join(bb, ["band", "key"])
        .filter(F.col("a.docid") < F.col("b.docid"))
        .select(
            F.col("a.docid").alias("docid_a"),
            F.col("b.docid").alias("docid_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("docid_a", "docid_b", "hamming")
    )
