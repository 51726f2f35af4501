"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k, the correctness baseline.
  Dot products via JVM higher-order functions (zip_with + aggregate), no
  Python in the loop; rank pinned by (sim desc, id asc) like every other
  top-k in the engine.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane (sign) LSH
  buckets as candidate generation, exact cosine on the probed bucket only.
  Deterministic hyperplanes (seeded), so results are reproducible and the
  oracle can re-express the same plan in SQL.

At 10^12 rows the exact path is a full scan per query (map + top-k — no
shuffle beyond the k-row merge); the LSH path prunes the scan to
~1/2^planes of the data per probe. An IVF variant would swap the bucket
expression for a broadcast-centroid argmin — same skeleton.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

LSH_SEED = 42
N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_expr(a, b):
    """Cosine over double-cast arrays: float32 inputs are promoted BEFORE
    any arithmetic so DuckDB (embedding::DOUBLE[]) reproduces the math."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame, query_id: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", round_to: int = 6,
) -> DataFrame:
    """(rank, vec_id, sim): exact top-k cosine neighbors of row ``query_id``
    (the query itself excluded)."""
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(F.col(vec_col), F.col("qvec")), round_to).alias("sim"),
        )
    )
    w = W.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "sim")
    )


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (frozen by seed)."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)]


def bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id: bit b set iff dot(vec, plane_b) > 0."""
    acc = F.lit(0)
    vec = vec_col.cast("array<double>")
    for b, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        acc = acc + F.when(_dot(vec, plane) > 0, F.lit(1 << b)).otherwise(0)
    return acc


def lsh_cosine_topk(
    emb: DataFrame, query_id: int, k: int = 10, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", round_to: int = 6,
) -> DataFrame:
    """(rank, vec_id, sim): approximate top-k — exact cosine within the
    query's LSH bucket only."""
    planes = hyperplanes(dim)
    bucketed = emb.withColumn("bucket", bucket_expr(F.col(vec_col), planes))
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    scored = (
        bucketed.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != query_id))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(F.col(vec_col), F.col("qvec")), round_to).alias("sim"),
        )
    )
    w = W.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "sim")
    )


def cosine_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding", round_to: int = 6,
) -> DataFrame:
    """(id_a, id_b, sim): embedding-cosine near-duplicate pairs.

    Exact all-pairs formulation (the correctness baseline; at corpus scale
    candidate generation switches to the hyperplane-LSH buckets of
    :func:`lsh_cosine_topk` / IVF — same verify stage). The self-join is a
    broadcast of the smaller projection; sim rounded for oracle compare."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), round_to).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def pairwise_label_centroids(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, centroid array, n): per-label mean vector — zip_with-free
    aggregation via posexplode + groupBy(label, pos), demonstrating
    vector aggregation without UDFs."""
    pos = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    per_dim = pos.groupBy("label", "pos").agg(
        F.avg("val").alias("mean"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean"))
            ).alias("pm"),
            F.max("n").alias("n"),
        )
        .select(
            "label",
            F.transform(F.col("pm"), lambda s: F.round(s["mean"], 6)).alias("centroid"),
            "n",
        )
    )
