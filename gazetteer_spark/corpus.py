"""Deterministic synthetic source-code corpus (FIXTURES.md §1-2).

Shape per BASELINE input_hint: (repo, path, commit, lang, content).
Seeded, pure-function deterministic — content depends only on (seed, i).
Hot-term skew is built in: per-language keywords in ~every file,
mid-frequency identifiers in ~10%, ``uniq_{i}`` in exactly one file —
exercising the salted-merge path the same way real code corpora do.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

SEED = 42
LANGS = ["python", "java", "js", "go"]
KEYWORDS = {
    "python": ["def", "return", "import", "class", "self"],
    "java": ["public", "return", "import", "class", "void"],
    "js": ["function", "return", "import", "const", "let"],
    "go": ["func", "return", "import", "package", "struct"],
}

# fixed 512-word identifier vocabulary (deterministic)
_VOCAB_ROOTS = [
    "parse", "build", "index", "segment", "merge", "query", "score", "token",
    "shard", "batch", "stream", "buffer", "cache", "hash", "sort", "scan",
    "read", "write", "flush", "commit", "snapshot", "manifest", "posting",
    "term", "doc", "field", "block", "codec", "delta", "byte", "bit", "page",
]
VOCAB = [
    f"{a}_{b}" if i % 2 else f"{a}{b.capitalize()}"
    for i, (a, b) in enumerate(
        (a, b) for a in _VOCAB_ROOTS for b in _VOCAB_ROOTS[:16]
    )
]  # 512 mixed snake_case / camelCase identifiers


def _commit_of(repo: str, path: str, seed: int = SEED) -> str:
    return hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()


def make_file(i: int, seed: int = SEED) -> tuple[str, str, str, str, str]:
    """Deterministic row i of the synthetic table."""
    rng = random.Random((seed << 32) | i)
    repo = f"org{i % 3}/repo{i % 97}"
    lang = LANGS[rng.randrange(4)]
    ext = {"python": "py", "java": "java", "js": "js", "go": "go"}[lang]
    path = f"src/pkg{i % 17}/module_{i}.{ext}"
    commit = _commit_of(repo, path, seed)

    lines = []
    kws = KEYWORDS[lang]
    n_funcs = 5 + rng.randrange(8)
    for f_i in range(n_funcs):
        name = VOCAB[rng.randrange(len(VOCAB))]
        arg = VOCAB[rng.randrange(len(VOCAB))]
        lines.append(f"{kws[0]} {name}({arg}):")
        body_len = 8 + rng.randrange(14)
        for _ in range(body_len):
            # mid-frequency terms: ~10% of files share each
            ident = VOCAB[(i // 10 + rng.randrange(40)) % len(VOCAB)]
            lines.append(f"    {ident} = {kws[1]} {VOCAB[rng.randrange(len(VOCAB))]}")
        lines.append(f"    {kws[1]} {name}")
    lines.append(f"# {kws[2]} uniq_{i}")  # exactly-once rare term
    return repo, path, commit, lang, "\n".join(lines)


def source_files(spark: SparkSession, n_files: int, seed: int = SEED,
                 partitions: int | None = None) -> DataFrame:
    """Distributed generation: the per-row function runs inside mapInPandas-free
    Spark range + UDF-less python via parallelize of indices (generation is
    test-scale only; the engine itself never generates data)."""
    # enough input splits that a 32-core build is never file-bound
    parts = partitions or max(64, n_files // 2000)
    rdd = spark.sparkContext.parallelize(range(n_files), parts).map(
        lambda i: make_file(i, seed)
    )
    return spark.createDataFrame(
        rdd, "repo string, path string, commit string, lang string, content string"
    )


def reference_queries(n_files: int) -> list[tuple[int, str]]:
    """The 32-query reference set (FIXTURES.md §2): rare / hot / conjunction /
    camelCase / snake_case / out-of-vocabulary."""
    qs: list[str] = []
    qs += [f"uniq_{i}" for i in (0, 7, n_files - 1)]            # single rare
    qs += ["return", "import"]                                   # single hot
    qs += [
        "parse_index buildSegment", "mergeQuery score_token",
        "shard_batch streamBuffer cache_hash", "sortScan read_write",
        "flushCommit snapshot_manifest", "posting_term docField",
        "block_codec deltaByte", "bitPage parse_segment",
    ]                                                            # conjunctions
    qs += ["parseIndex", "buildSegment", "mergeQuery", "scoreToken"]  # camel
    qs += ["parse_index", "build_segment", "merge_query", "score_token"]  # snake
    qs += ["zzz_not_in_corpus", "qqqq wwww"]                     # OOV → empty
    qs += [
        "def return import", "class self", "function const",
        "package struct", "public void", "index merge commit",
        "segment posting block", "cache buffer flush", "doc term field",
    ]
    return list(enumerate(qs[:32]))
