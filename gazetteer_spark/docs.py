"""Document registry: deterministic docids, sha256 invariant, doc lengths.

Reference parity: gazetteer derives deterministic feature ids from content
(`striper/GeoJsonWriter.java:174-185` — ftype + Hilbert hash + osm id) and
hashes each canonicalized row (`utils/JSONHash.java:23-69`, applied at
`GeoJsonWriter.addMD5:346-350`). Our docid is a 64-bit hash of the natural
key, and the per-row invariant is ``sha256(content)`` equality against the
source table (BASELINE input_hint).

Determinism matters for resume: docids must not depend on partition
execution order (SURVEY §7.3 hard-part 3), so they derive from data, never
from ``monotonically_increasing_id``/zipWithIndex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzer import doclen_expr

SOURCE_KEY = ("repo", "path", "commit")


def docid_expr(*key_cols: str):
    """64-bit deterministic docid = xxhash64 over the natural key.

    xxhash64 is a Spark built-in (JVM-side, codegen'd). At 10^12 docs the
    birthday bound gives a small collision probability — callers that care
    run :func:`assert_no_docid_collisions` once per build (a cheap
    groupBy-count over the registry) and, on collision, extend the key with
    a salt column. Sandbox scales never collide.
    """
    return F.xxhash64(*[F.col(c) for c in key_cols])


def build_doc_registry(
    source: DataFrame,
    key_cols: tuple[str, ...] = SOURCE_KEY,
    content_col: str = "content",
) -> DataFrame:
    """source → (docid, *key, sha256, doclen) — no shuffle, pure map stage."""
    return source.select(
        docid_expr(*key_cols).alias("docid"),
        *[F.col(c) for c in key_cols],
        F.sha2(F.col(content_col), 256).alias("sha256"),
        doclen_expr(F.col(content_col)).alias("doclen"),
    )


def assert_no_docid_collisions(registry: DataFrame) -> None:
    dup = registry.groupBy("docid").count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("docid collision detected — extend the natural key")


def sha_invariant_violations(source: DataFrame, registry: DataFrame,
                             key_cols: tuple[str, ...] = SOURCE_KEY,
                             content_col: str = "content") -> int:
    """Rows whose registry sha256 disagrees with a fresh hash of the source.

    This is the engine's analog of gazetteer's canonical-JSON md5 round-trip
    checks (`diff/Diff.java:40-71` --only-key-length self-check).
    """
    fresh = source.select(
        *[F.col(c) for c in key_cols], F.sha2(F.col(content_col), 256).alias("sha_fresh")
    )
    joined = registry.join(fresh, list(key_cols), "inner")
    return joined.filter(F.col("sha256") != F.col("sha_fresh")).count()
