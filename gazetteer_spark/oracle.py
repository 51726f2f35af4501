"""Pure-Python reference engine (the oracle).

The correctness bar from BASELINE.json: the Spark engine's top-k docids and
BM25 scores must be rank-identical to this implementation on the reference
query set — the same way gazetteer pins expected hit ordering in its
deterministic tie-break (`join/JoinSliceRunable.java:848-875`).

Intentionally simple: dict-of-dicts postings, float64 arithmetic, terms
summed in sorted-term order (SURVEY §7.3 hard-part 1: fixed summation order).
"""

from __future__ import annotations

import math
from collections import defaultdict

from . import B, K1
from .analyzer import py_term_counts, py_tokenize


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: [(docid, content)] — docids are caller-assigned."""
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        for docid, content in docs:
            counts = py_term_counts(content)
            self.doclen[docid] = sum(counts.values())
            for term, tf in counts.items():
                self.postings[term][docid] = tf
        self.n_docs = len(self.doclen)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_one(self, docid: int, terms: list[str]) -> float:
        dl = self.doclen[docid]
        norm = K1 * (1.0 - B + B * dl / self.avgdl)
        s = 0.0
        for t in sorted(set(terms)):
            tf = self.postings.get(t, {}).get(docid)
            if tf:
                s += self.idf(t) * (tf * (K1 + 1.0)) / (tf + norm)
        return s

    def topk(self, query: str, k: int = 10, round_to: int | None = 4,
             exclude: frozenset[int] = frozenset()):
        """[(rank, docid, score)] pinned by (score desc, docid asc).

        ``exclude`` models tombstoned docs (Lucene-like: stats unchanged,
        docs simply stop matching)."""
        terms = sorted(set(py_tokenize(query)))
        candidates: set[int] = set()
        for t in terms:
            candidates.update(self.postings.get(t, ()))
        candidates -= exclude
        scored = []
        for d in candidates:
            s = self.score_one(d, terms)
            scored.append((round(s, round_to) if round_to is not None else s, d))
        scored.sort(key=lambda p: (-p[0], p[1]))
        return [(i + 1, d, s) for i, (s, d) in enumerate(scored[:k])]

    def topk_batch(self, queries: list[tuple[int, str]], k: int = 10):
        """[(query_id, rank, docid, score)] for a batch."""
        out = []
        for qid, text in queries:
            for rank, docid, score in self.topk(text, k):
                out.append((qid, rank, docid, score))
        return out
