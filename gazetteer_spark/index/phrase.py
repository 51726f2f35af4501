"""Index-backed phrase (adjacent-token) matching over layout-v2 segments.

The reference treats containment/phrase matching as a first-class query
primitive (`addresses/impl/NamesMatcherImpl.java:38-46` — token-sequence
containment between names); round-1 served it by re-tokenizing the whole
corpus per phrase. This module serves it from the POSITIONS stream instead:

per (shard, phrase): decode only the phrase terms' postings + positions,
intersect docid sets, then intersect position sets shifted by slot offset —
``doc matches iff ∃p: p ∈ pos(t0), p+1 ∈ pos(t1), …``. All-numpy: the
per-slot position sets are packed into int64 keys ``rank(doc) * 2^21 +
(pos - slot)`` and intersected with ``np.intersect1d``; occurrence counts
fall out of the surviving keys.

Scale shape: identical to WAND — the segment scan prunes by parquet
min/max on term + the ``kind`` dictionary filter; per-shard work touches
only the phrase terms' bytes; the only shuffle is the (docid, count) union
(≤ matching docs). No full-corpus rescan, no driver-side data.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import get_analyzer
from .codec import decode_positions, decode_postings, gather_runs

# positions are in-document token indexes; 2^21 (2M tokens/doc) leaves
# 2^42 doc ranks per shard — both far beyond any real segment
MAXPOS = 1 << 21


def _merge_term_generations(bufs: list[tuple[bytes, bytes]]):
    """[(postings, positions)…] per generation → (ids, tfs, flat_positions)
    merged into global docid order (generations' docid sets are disjoint)."""
    decoded = [decode_postings(p) for p, _ in bufs]
    ids = np.concatenate([d[0] for d in decoded])
    tfs = np.concatenate([d[1] for d in decoded]).astype(np.int64)
    flat = np.concatenate(
        [decode_positions(q, d[1]) for (_, q), d in zip(bufs, decoded)]
    )
    if len(decoded) > 1:
        order = np.argsort(ids, kind="stable")
        flat = gather_runs(flat, tfs, order)
        ids, tfs = ids[order], tfs[order]
    return ids, tfs, flat


def _phrase_shard(pdf: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
    """One shard's relevant segment rows → (docid, n_occurrences)."""
    empty = pd.DataFrame({"docid": pd.Series([], dtype="int64"),
                          "n_occurrences": pd.Series([], dtype="int64")})
    per_term: dict[str, list[tuple[bytes, bytes]]] = {}
    for r in pdf[pdf["kind"] == "post"].itertuples():
        per_term.setdefault(r.term, []).append((r.postings, r.positions))
    distinct = sorted(set(terms))
    if any(t not in per_term for t in distinct):
        return empty  # conjunctive: a missing term empties this shard

    merged = {t: _merge_term_generations(per_term[t]) for t in distinct}

    # doc-level tombstones
    del_parts = [decode_postings(b)[0]
                 for b in pdf[pdf["kind"] == "dels"]["postings"]]
    dels = (np.unique(np.concatenate(del_parts))
            if del_parts else np.zeros(0, np.int64))

    # candidate docs: present in EVERY distinct term, not deleted
    common = merged[distinct[0]][0]
    for t in distinct[1:]:
        common = np.intersect1d(common, merged[t][0], assume_unique=True)
    if len(dels) and len(common):
        pos = np.searchsorted(dels, common)
        hit = (pos < len(dels)) & (dels[np.minimum(pos, len(dels) - 1)] == common)
        common = common[~hit]
    if len(common) == 0:
        return empty

    # per-slot packed (doc-rank, shifted-position) keys, intersected
    def slot_keys(term: str, slot: int) -> np.ndarray:
        ids, tfs, flat = merged[term]
        idx = np.searchsorted(common, ids)
        keep = (idx < len(common)) & (common[np.minimum(idx, len(common) - 1)] == ids)
        ranks = np.repeat(idx[keep], tfs[keep])
        pos = flat[np.repeat(keep, tfs)]
        shifted = pos - slot
        ok = shifted >= 0
        return ranks[ok] * MAXPOS + shifted[ok]

    matched = slot_keys(terms[0], 0)
    for i, t in enumerate(terms[1:], start=1):
        if len(matched) == 0:
            return empty
        matched = np.intersect1d(matched, slot_keys(t, i), assume_unique=True)
    if len(matched) == 0:
        return empty
    ranks, counts = np.unique(matched // MAXPOS, return_counts=True)
    return pd.DataFrame(
        {"docid": common[ranks].astype(np.int64),
         "n_occurrences": counts.astype(np.int64)}
    )


def _near_shard(pdf: pd.DataFrame, term_a: str, term_b: str, k: int) -> pd.DataFrame:
    """One shard → (docid, n_pairs): occurrence pairs of (term_a, term_b)
    within token distance ≤ k, counted fully vectorized via packed keys."""
    empty = pd.DataFrame({"docid": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64")})
    per_term: dict[str, list[tuple[bytes, bytes]]] = {}
    for r in pdf[pdf["kind"] == "post"].itertuples():
        per_term.setdefault(r.term, []).append((r.postings, r.positions))
    if term_a not in per_term or term_b not in per_term:
        return empty
    ma = _merge_term_generations(per_term[term_a])
    mb = _merge_term_generations(per_term[term_b])

    del_parts = [decode_postings(b)[0]
                 for b in pdf[pdf["kind"] == "dels"]["postings"]]
    dels = (np.unique(np.concatenate(del_parts))
            if del_parts else np.zeros(0, np.int64))

    common = np.intersect1d(ma[0], mb[0], assume_unique=True)
    if len(dels) and len(common):
        pos = np.searchsorted(dels, common)
        hit = (pos < len(dels)) & (dels[np.minimum(pos, len(dels) - 1)] == common)
        common = common[~hit]
    if len(common) == 0:
        return empty

    def packed(m):
        ids, tfs, flat = m
        idx = np.searchsorted(common, ids)
        keep = (idx < len(common)) & (common[np.minimum(idx, len(common) - 1)] == ids)
        ranks = np.repeat(idx[keep], tfs[keep])
        pos = flat[np.repeat(keep, tfs)]
        return ranks, ranks * MAXPOS + pos  # keys globally sorted

    ranks_a, keys_a = packed(ma)
    _, keys_b = packed(mb)
    # per a-occurrence: b-occurrences in the same doc within ±k (window
    # clamped inside the doc's key range, so it never leaks across docs)
    base = ranks_a * MAXPOS
    lo = np.maximum(keys_a - k, base)
    hi = np.minimum(keys_a + k, base + MAXPOS - 1)
    counts = (np.searchsorted(keys_b, hi, side="right")
              - np.searchsorted(keys_b, lo, side="left"))
    n_pairs = np.bincount(ranks_a, weights=counts, minlength=len(common))
    nz = np.nonzero(n_pairs)[0]
    if len(nz) == 0:
        return empty
    return pd.DataFrame({"docid": common[nz].astype(np.int64),
                         "n_pairs": n_pairs[nz].astype(np.int64)})


def near_match(
    spark: SparkSession, index_dir: str, term_a: str, term_b: str, k: int = 3
) -> DataFrame:
    """(docid, n_pairs): documents where analyzed terms a and b co-occur
    within token distance ≤ k, with the pair count — a proximity (NEAR/k)
    query served from the positional index. Same scan shape as
    :func:`phrase_match`."""
    from .spimi import committed_segments

    with open(f"{index_dir}/build.json") as f:
        params = json.load(f)
    if not params.get("positions"):
        raise ValueError(
            "index was built without positions (layout v1); "
            "rebuild with build_index(..., positions=True) for NEAR queries"
        )
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    ta, tb = (tokenize(term_a) or [""])[0], (tokenize(term_b) or [""])[0]
    if not ta or not tb or ta == tb:
        raise ValueError("NEAR needs two distinct non-empty analyzed terms")

    seg = committed_segments(spark, index_dir)
    relevant = seg.filter(
        ((F.col("kind") == "post") & F.col("term").isin([ta, tb]))
        | (F.col("kind") == "dels")
    )
    return relevant.groupBy("shard").applyInPandas(
        lambda pdf: _near_shard(pdf, ta, tb, k),
        "docid long, n_pairs long",
    )


def phrase_match(
    spark: SparkSession, index_dir: str, phrase: str
) -> DataFrame:
    """(docid, n_occurrences): documents containing the exact token phrase,
    with occurrence counts — served entirely from the positional index."""
    from .spimi import committed_segments

    with open(f"{index_dir}/build.json") as f:
        params = json.load(f)
    if not params.get("positions"):
        raise ValueError(
            "index was built without positions (layout v1); "
            "rebuild with build_index(..., positions=True) for phrase queries"
        )
    terms = get_analyzer(params.get("analyzer", "default")).py_tokenize(phrase)
    if not terms:
        raise ValueError("empty phrase after analysis")

    seg = committed_segments(spark, index_dir)
    relevant = seg.filter(
        ((F.col("kind") == "post") & F.col("term").isin(sorted(set(terms))))
        | (F.col("kind") == "dels")
    )
    return relevant.groupBy("shard").applyInPandas(
        lambda pdf: _phrase_shard(pdf, terms),
        "docid long, n_occurrences long",
    )
