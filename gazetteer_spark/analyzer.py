"""Analyzer chain: canonical tokenization for the full-text engine.

Reference parity: this plays the role of gazetteer's name/address
normalizer chain — Lucene ASCII folding + lowercase
(`addresses/AddressesUtils.java:24-31`), bidirectional containment matching
(`addresses/impl/NamesMatcherImpl.java:38-46`) and the address-scheme
explode that fans one property map into N rows
(`addresses/impl/AddressesSchemesParserImpl.java:25-154`). For source code
the analogous normalization is camelCase/snake_case identifier splitting.

Canonical semantics (FROZEN — all three implementations must agree, and the
DuckDB oracle SQL in __spark_entry__ re-expresses the same chain):

1. acronym boundary:  ``([A-Z]+)([A-Z][a-z])`` → ``$1 $2``   (HTTPServer → HTTP Server)
2. camel boundary:    ``([a-z0-9])([A-Z])``    → ``$1 $2``   (parseHttp → parse Http)
3. lowercase
4. split on ``[^a-z0-9]+`` (this also handles snake_case, punctuation, whitespace)
5. drop empty tokens

Three implementations:
- :func:`tokens_expr` — pure JVM Column expression (whole-stage codegen,
  zero Python in the hot path). Used by oracle-checkable queries.
- :func:`analyze_pdf` — Arrow-vectorized pandas UDF returning per-row
  ``array<struct<term,tf>>`` (one shuffle saved vs explode+groupBy; this is
  the index-build hot path mandated by BASELINE input_hint: vectorized
  pandas/Arrow UDFs, no per-row Python UDFs).
- :func:`py_tokenize` — pure-Python, used by the oracle scorer in
  :mod:`gazetteer_spark.oracle` and by golden-file tests.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Frozen regex pieces (keep in sync with oracle_sql in __spark_entry__.py).
ACRONYM_PAT = r"([A-Z]+)([A-Z][a-z])"
CAMEL_PAT = r"([a-z0-9])([A-Z])"
SPLIT_PAT = r"[^a-z0-9]+"

_ACRONYM_RE = re.compile(ACRONYM_PAT)
_CAMEL_RE = re.compile(CAMEL_PAT)
_SPLIT_RE = re.compile(SPLIT_PAT)


# ---------------------------------------------------------------------------
# JVM-native path (whole-stage codegen)
# ---------------------------------------------------------------------------

def tokens_expr(content: Column) -> Column:
    """``array<string>`` of analyzed tokens, fully JVM-side."""
    decamel = F.regexp_replace(
        F.regexp_replace(content, ACRONYM_PAT, r"$1 $2"), CAMEL_PAT, r"$1 $2"
    )
    arr = F.split(F.lower(decamel), SPLIT_PAT)
    return F.array_remove(arr, "")


def term_rows(df, id_col: str = "docid", content_col: str = "content"):
    """(docid, term) one row per token occurrence — JVM explode.

    Downstream ``groupBy(docid, term).count()`` benefits from Catalyst's
    partial (map-side) aggregation, so the shuffle carries distinct
    (docid, term, tf) triples, not raw token occurrences.
    """
    return df.select(
        F.col(id_col).alias("docid"),
        F.explode(tokens_expr(F.col(content_col))).alias("term"),
    )


def postings_sql(df, id_col: str = "docid", content_col: str = "content"):
    """(docid, term, tf) via the JVM path. One shuffle (partial-agg combined)."""
    return (
        term_rows(df, id_col, content_col)
        .groupBy("docid", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def doclen_expr(content: Column) -> Column:
    """Document length (token count) without materializing term rows."""
    return F.size(tokens_expr(content)).cast("int")


# ---------------------------------------------------------------------------
# Arrow path (index-build hot path)
# ---------------------------------------------------------------------------

_TERMTF = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


def py_tokenize(text: str) -> list[str]:
    """Pure-Python canonical tokenizer (oracle / golden tests)."""
    if not text:
        return []
    s = _CAMEL_RE.sub(r"\1 \2", _ACRONYM_RE.sub(r"\1 \2", text))
    return [t for t in _SPLIT_RE.split(s.lower()) if t]


def py_term_counts(text: str) -> dict[str, int]:
    return dict(Counter(py_tokenize(text)))


@pandas_udf(_TERMTF)
def analyze_pdf(content: pd.Series) -> pd.Series:
    """Arrow-batched analyzer: content → [(term, tf)…], tf counted in-row.

    Saves the (docid, term)-occurrence shuffle entirely: the only shuffle
    left in the index build is the doc-shard repartition. Batches arrive as
    Arrow arrays; the per-batch loop is over documents, not characters, and
    regex/Counter work happens in C.
    """
    acro, camel, split = _ACRONYM_RE, _CAMEL_RE, _SPLIT_RE

    def one(text):
        if not text:
            return []
        s = camel.sub(r"\1 \2", acro.sub(r"\1 \2", text)).lower()
        c = Counter(t for t in split.split(s) if t)
        return [(t, int(n)) for t, n in c.items()]

    return content.map(one)


@pandas_udf(_TERMTF)
def count_tokens_pdf(tokens: pd.Series) -> pd.Series:
    """Token array → [(term, tf)…]. The HYBRID hot path's Python half:
    the frozen regex chain runs JVM-side (tokens_expr, whole-stage codegen)
    and Python only Counter-folds the already-split tokens — ~1.3× faster
    end-to-end than regexing in Python (analyze_pdf), with the identical
    one-shuffle plan. Semantics equality is property-tested.

    NULL content tokenizes to a NULL array JVM-side, which Arrow delivers
    as None — guard it (a null row must not kill the build)."""
    def one(ts):
        if ts is None:
            return []
        c = Counter(ts)
        return [(t, int(n)) for t, n in c.items()]

    return tokens.map(one)


def _fold_tokens_arrow(positions: bool):
    """Batch-vectorized (docid, toks) → postings fold for mapInArrow.

    The previous fold (count_tokens_pdf / position_tokens_pdf) ran one
    Python Counter per DOCUMENT and materialized one Python tuple per
    POSTING inside an array<struct> return value — tens of millions of
    small allocations at 100k docs, ~3 s of the build's map stage
    (measured; guide §4.2: hand whole batches to vectorized native
    code). This fold never touches per-posting Python objects: tokens
    flatten zero-copy, Arrow dictionary-encodes them C-side, and the
    per-(doc, term) counts come from one np.unique over packed
    ``row_idx * V + code`` keys. Output rows are exactly the old fold's
    (same tf counts; positions ascending per term) — property-tested
    against the JVM/pandas twins."""
    import numpy as np

    def fold(batches):
        import pyarrow as pa

        import pyarrow.compute as pc

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            docid = b.column("docid")
            toks = b.column("toks")
            lengths = pc.fill_null(pc.list_value_length(toks), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = toks.flatten()  # skips null lists; lengths align (0)
            total = int(lengths.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            d = flat.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            V = len(d.dictionary)
            packed = row_idx * V + codes
            if not positions:
                uniq, counts = np.unique(packed, return_counts=True)
                yield pa.record_batch(
                    [
                        docid.take(pa.array(uniq // V)),
                        d.dictionary.take(pa.array(uniq % V)),
                        pa.array(counts.astype(np.int32)),
                    ],
                    names=["docid", "term", "tf"],
                )
                continue
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            pos = (np.arange(total, dtype=np.int64)
                   - np.repeat(starts, lengths))
            order = np.argsort(packed, kind="stable")  # pos stays ascending
            sp = packed[order]
            bounds = np.nonzero(sp[1:] != sp[:-1])[0] + 1
            g_starts = np.concatenate([[0], bounds]).astype(np.int64)
            uniq = sp[g_starts]
            counts = np.diff(np.concatenate([g_starts, [len(sp)]]))
            offsets = np.zeros(len(counts) + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            pos_list = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(pos[order].astype(np.int32))
            )
            yield pa.record_batch(
                [
                    docid.take(pa.array(uniq // V)),
                    d.dictionary.take(pa.array(uniq % V)),
                    pa.array(counts.astype(np.int32)),
                    pos_list,
                ],
                names=["docid", "term", "tf", "pos"],
            )

    return fold


def postings_arrow(df, id_col: str = "docid", content_col: str = "content",
                   tokens_fn=None):
    """(docid, term, tf) — zero-shuffle token counting: JVM tokenizer +
    vectorized Arrow fold (see _fold_tokens_arrow). ``tokens_fn`` swaps
    in a registered analyzer's Column tokenizer (default: the frozen
    chain). The toks projection is separate so only (docid, toks) cross
    the Python boundary (guide §4.1 column control)."""
    tk = tokens_fn or tokens_expr
    toked = df.select(
        F.col(id_col).alias("docid"), tk(F.col(content_col)).alias("toks")
    )
    id_type = toked.schema["docid"].dataType.simpleString()
    return toked.mapInArrow(
        _fold_tokens_arrow(positions=False),
        f"docid {id_type}, term string, tf int",
    )


# ---------------------------------------------------------------------------
# analyzer registry (extension seam)
# ---------------------------------------------------------------------------

TOKENIZER_VERSION = "tok-v1"  # the default chain's frozen version


@dataclass(frozen=True)
class Analyzer:
    """A pluggable analyzer: the reference's Groovy plugin surface
    (`Options.java:132-160`, `join/out_handlers/HandlerOptions.java:1-122`)
    re-expressed as a typed registration — an analyzer supplies BOTH sides
    of the contract:

    - ``tokens_expr``: Column → Column(array<string>) — the JVM build/scan
      tokenizer (runs in whole-stage codegen);
    - ``py_tokenize``: str → list[str] — the query/oracle tokenizer, which
      MUST agree with the JVM side (property-test yours like
      tests/test_analyzer.py does for the default).

    ``version`` is recorded in build.json at index build; every later
    add/query resolves the analyzer by name and refuses a version mismatch
    — the bump-enforcement seam the frozen default already obeys."""

    name: str
    version: str
    tokens_expr: "Callable[[Column], Column]"
    py_tokenize: "Callable[[str], list[str]]"


_ANALYZERS: dict[str, Analyzer] = {}


def register_analyzer(analyzer: Analyzer, replace: bool = False) -> None:
    if analyzer.name in _ANALYZERS and not replace:
        raise ValueError(f"analyzer {analyzer.name!r} already registered")
    _ANALYZERS[analyzer.name] = analyzer


def get_analyzer(name: str) -> Analyzer:
    if name not in _ANALYZERS:
        raise KeyError(
            f"analyzer {name!r} is not registered in this process — "
            "register_analyzer() it before opening the index"
        )
    return _ANALYZERS[name]


DEFAULT_ANALYZER = Analyzer(
    name="default", version=TOKENIZER_VERSION,
    tokens_expr=tokens_expr, py_tokenize=py_tokenize,
)
register_analyzer(DEFAULT_ANALYZER)


_TERMTFPOS = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("pos", T.ArrayType(T.IntegerType(), False), False),
        ]
    )
)


@pandas_udf(_TERMTFPOS)
def analyze_positions_pdf(content: pd.Series) -> pd.Series:
    """Arrow-batched positional analyzer: content → [(term, tf, [pos…])…].

    Identical FROZEN tokenizer chain as :func:`analyze_pdf`; additionally
    records each occurrence's 0-based token index (ascending per term) —
    the layout-v2 positions stream that serves index-backed phrase and
    proximity queries."""
    acro, camel, split = _ACRONYM_RE, _CAMEL_RE, _SPLIT_RE

    def one(text):
        if not text:
            return []
        s = camel.sub(r"\1 \2", acro.sub(r"\1 \2", text)).lower()
        d: dict[str, list[int]] = {}
        i = 0
        for t in split.split(s):
            if t:
                d.setdefault(t, []).append(i)
                i += 1
        return [(t, len(ps), ps) for t, ps in d.items()]

    return content.map(one)


@pandas_udf(_TERMTFPOS)
def position_tokens_pdf(tokens: pd.Series) -> pd.Series:
    """Token array → [(term, tf, [pos…])…] — the hybrid positional half
    (JVM tokenizer upstream; Python only enumerates occurrences). NULL
    content arrives as None — guard it."""
    def one(ts):
        if ts is None:
            return []
        d: dict[str, list[int]] = {}
        for i, t in enumerate(ts):
            d.setdefault(t, []).append(i)
        return [(t, len(ps), ps) for t, ps in d.items()]

    return tokens.map(one)


def postings_positions_arrow(df, id_col: str = "docid", content_col: str = "content",
                             tokens_fn=None):
    """(docid, term, tf, pos array<int>) — JVM tokenizer + vectorized
    Arrow position fold (see _fold_tokens_arrow)."""
    tk = tokens_fn or tokens_expr
    toked = df.select(
        F.col(id_col).alias("docid"), tk(F.col(content_col)).alias("toks")
    )
    id_type = toked.schema["docid"].dataType.simpleString()
    return toked.mapInArrow(
        _fold_tokens_arrow(positions=True),
        f"docid {id_type}, term string, tf int, pos array<int>",
    )


def ngram_tokens_expr(content: Column, n: int = 3) -> Column:
    """Character n-grams of each analyzed token (identifier n-grams — the
    fuzzy-matching analog of the reference's name normalizer variants).

    Tokens shorter than n are emitted whole, so every token contributes at
    least one gram. Fully JVM-side: flatten(transform(tokens, …substr…)).
    """
    toks = tokens_expr(content)

    def grams(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(t) - (n - 1))
        return F.when(
            F.length(t) >= n, F.transform(idx, lambda i: F.substring(t, i, n))
        ).otherwise(F.array(t))

    return F.flatten(F.transform(toks, grams))


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """n-token shingles (space-joined) from a token array, JVM-side.

    Used by n-gram Jaccard dedup; empty array when the doc has < n tokens.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    made = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )
    # Spark's sequence(1, x) is DESCENDING for x < 1 — guard short docs.
    return F.when(F.size(tokens) >= n, made).otherwise(
        F.array().cast(T.ArrayType(T.StringType()))
    )
