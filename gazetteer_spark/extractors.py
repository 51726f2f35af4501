"""Typed export-extractor surface over engine artifacts (P12 depth).

The reference ships a library of named, typed CSV column extractors
(`out/FeatureValueExctractorImpl.java:25-247` — keyword → typed value over
the feature being written). This is the engine's analog: named extractors
over the three export surfaces — documents, the index's term statistics,
and the index manifest — each a pure Column factory, composable into a
`select` and routed to any sink via :func:`gazetteer_spark.sources.write_table`.

Everything is JVM-expression-level (no UDFs): an export of 10^12 documents
is a scan + project, pushdown-friendly (unused source columns are pruned
because extractors reference only what they need).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyzer import tokens_expr


@dataclass(frozen=True)
class Extractor:
    """A named typed column over an export surface."""

    name: str
    dtype: str  # Spark SQL type the column is cast to (the export contract)
    make: Callable[..., Column]


def _doc_tokens(content_col: str) -> Column:
    return tokens_expr(F.col(content_col))


DOC_EXTRACTORS: dict[str, Extractor] = {
    e.name: e
    for e in [
        Extractor("docid", "long", lambda i, c: F.col(i)),
        Extractor("content_sha256", "string", lambda i, c: F.sha2(F.col(c), 256)),
        Extractor("n_chars", "int", lambda i, c: F.length(F.col(c))),
        Extractor("n_tokens", "int", lambda i, c: F.size(_doc_tokens(c))),
        Extractor(
            "n_distinct_terms", "int",
            lambda i, c: F.size(F.array_distinct(_doc_tokens(c))),
        ),
        Extractor(
            "avg_token_len", "double",
            lambda i, c: F.round(
                F.when(
                    F.size(_doc_tokens(c)) > 0,
                    F.aggregate(
                        F.transform(_doc_tokens(c), F.length),
                        F.lit(0),
                        lambda a, x: a + x,
                    ).cast("double") / F.size(_doc_tokens(c)),
                ).otherwise(0.0),
                6,
            ),
        ),
    ]
}

TERM_EXTRACTORS: dict[str, Extractor] = {
    e.name: e
    for e in [
        Extractor("term", "string", lambda n: F.col("term")),
        Extractor("df", "long", lambda n: F.col("df")),
        Extractor("cf", "long", lambda n: F.col("cf")),
        Extractor(
            "idf", "double",
            lambda n: F.round(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                6,
            ),
        ),
    ]
}

SHARD_EXTRACTORS: dict[str, Extractor] = {
    e.name: e
    for e in [
        Extractor("generation", "int", lambda: F.col("generation")),
        Extractor("shard", "int", lambda: F.col("shard")),
        Extractor("n_terms", "long", lambda: F.col("n_terms")),
        Extractor("n_postings", "long", lambda: F.col("n_postings")),
        Extractor("n_docs", "long", lambda: F.col("n_docs")),
        Extractor("n_bytes", "long", lambda: F.col("n_bytes")),
        Extractor(
            "bytes_per_posting", "double",
            lambda: F.round(
                F.when(
                    F.col("n_postings") > 0,
                    F.col("n_bytes").cast("double") / F.col("n_postings"),
                ).otherwise(0.0),
                6,
            ),
        ),
        Extractor("checksum", "string", lambda: F.col("checksum")),
    ]
}


def _resolve(registry: dict[str, Extractor], fields: list[str], *args) -> list[Column]:
    unknown = [f for f in fields if f not in registry]
    if unknown:
        raise KeyError(
            f"unknown extractor(s) {unknown!r}; available: {sorted(registry)}"
        )
    return [
        registry[f].make(*args).cast(registry[f].dtype).alias(f) for f in fields
    ]


def extract_documents(
    docs: DataFrame, fields: list[str],
    id_col: str = "docid", content_col: str = "content",
) -> DataFrame:
    """Typed projection over a documents table."""
    return docs.select(*_resolve(DOC_EXTRACTORS, fields, id_col, content_col))


def extract_terms(
    spark: SparkSession, index_dir: str, fields: list[str]
) -> DataFrame:
    """Typed projection over the index's global term statistics (idf uses
    the committed corpus doc count)."""
    from .index.spimi import load_stats, load_termstats

    n_docs = load_stats(index_dir)["n_docs"]
    return load_termstats(spark, index_dir).select(
        *_resolve(TERM_EXTRACTORS, fields, n_docs)
    )


def extract_shards(
    spark: SparkSession, index_dir: str, fields: list[str]
) -> DataFrame:
    """Typed projection over the committed manifest (per-(gen, shard)
    build metrics — the ops/debugging export)."""
    from .index.spimi import load_manifest

    return load_manifest(spark, index_dir).select(
        *_resolve(SHARD_EXTRACTORS, fields)
    )
