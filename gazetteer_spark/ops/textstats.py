"""Text analysis: language-ID heuristic, quality scoring, token counting,
document fingerprinting.

The language heuristic is the stopword-hit flavor of gazetteer's
`name:xx` language detection (`AddressesParserImpl.getLangs:257-320`):
count distinct marker-word hits per language, argmax with deterministic
tie-break. All operators are single-pass JVM expression chains (no shuffle
except the trivial final aggregations callers add).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_expr
from .dedup import md5int_expr
from . import HASH_PRIME

# tiny per-language marker sets (frozen; heuristic, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "con", "por"],
}


def lang_scores(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, lang_guess, score): marker-hit language ID, ties → lexicographic."""
    toks = F.array_distinct(tokens_expr(F.col(content_col)))
    cols = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.select(F.col(id_col).alias("docid"), *[c.alias(f"n_{l}") for l, c in cols.items()])
    best = F.greatest(*[F.col(f"n_{l}") for l in LANG_MARKERS])
    guess = F.lit("unknown")
    # reversed lexicographic fold so earlier langs win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when(
            (F.col(f"n_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return out.select("docid", guess.alias("lang_guess"), best.cast("int").alias("score"))


def quality_scores(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, n_tokens, avg_token_len, punct_ratio, upper_ratio, quality).

    The quality score is a frozen linear heuristic of length/punct/case
    ratios (the shape of C4/Gopher-style rules), rounded for oracle
    comparison."""
    c = F.col(content_col)
    toks = tokens_expr(c)
    n_tokens = F.size(toks)
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_len = F.when(n_tokens > 0, total_tok_chars / n_tokens).otherwise(F.lit(0.0))
    strlen = F.greatest(F.length(c), F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", "")) / strlen
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", "")) / strlen
    quality = (
        F.when(n_tokens >= 10, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_len >= 3) & (avg_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(upper < 0.3, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("docid"),
        n_tokens.cast("int").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(upper, 6).alias("upper_ratio"),
        F.round(quality, 2).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, ws_tokens, bpe_ish_tokens, chars): whitespace count plus a
    BPE-ish estimate (word-piece regex: runs of letters/digits or single
    non-space symbols)."""
    c = F.col(content_col)
    ws = F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))
    bpe = F.size(
        F.filter(
            F.split(F.regexp_replace(c, r"([^A-Za-z0-9\s])", r" $1 "), r"\s+"),
            lambda t: t != "",
        )
    )
    return df.select(
        F.col(id_col).alias("docid"),
        ws.cast("int").alias("ws_tokens"),
        bpe.cast("int").alias("bpe_ish_tokens"),
        F.length(c).cast("int").alias("chars"),
    )


def fingerprints(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(docid, fingerprint): order-insensitive 63-bit content fingerprint =
    sum of md5-derived term hashes over DISTINCT terms, mod 2^31-1 —
    the mtainf dataset-hash idea at row granularity."""
    toks = F.array_distinct(tokens_expr(F.col(content_col)))
    term_h = F.transform(toks, lambda t: F.pmod(md5int_expr(t), F.lit(HASH_PRIME)))
    fp = F.pmod(
        F.aggregate(term_h, F.lit(0).cast("long"), lambda a, x: a + x),
        F.lit(HASH_PRIME),
    )
    return df.select(F.col(id_col).alias("docid"), fp.alias("fingerprint"))
