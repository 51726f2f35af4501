"""Index-backed phrase (adjacent-token) and NEAR/k proximity matching over
layout-v2 segments.

The reference treats containment/phrase matching as a first-class query
primitive (`addresses/impl/NamesMatcherImpl.java:38-46` — token-sequence
containment between names); round-1 served it by re-tokenizing the whole
corpus per phrase. This module serves it from the POSITIONS stream with
BLOCK-SELECTIVE decode:

1. intersect the phrase terms' docid sets RAREST-FIRST: the rarest term is
   decoded fully, every other term decodes only the posting blocks whose
   block-max docid range can contain surviving candidates (the same skip
   machinery WAND uses for scores, applied to conjunction);
2. for the final candidates, decode positions ONLY for those blocks
   (the positions blob embeds per-block byte offsets — codec layout);
3. adjacency/proximity is an all-numpy intersection of packed int64 keys
   ``rank(doc) * 2^21 + (pos - slot)``.

A phrase containing "the" therefore touches ~|candidates|/128-rounded
blocks of "the"'s postings and positions, not its full df.

Scale shape: identical to WAND — the segment scan prunes by parquet
min/max on term + the ``kind`` dictionary filter; the only shuffle is the
(docid, count) union. No full-corpus rescan, no driver-side data.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import get_analyzer
from .codec import (
    MAXPOS,  # noqa: F401 — packed-key base; guarded at encode time in codec
    DelIndex,
    decode_block_meta,
    decode_blocks,
    decode_positions,
    decode_positions_blocks,
    decode_postings,
    gather_runs,
)

_EMPTY = (
    np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
)


class _Seg:
    """One committed generation of one term's postings in this shard."""

    __slots__ = ("pbuf", "posbuf", "blast", "bends", "gen")


def _term_handles(pdf: pd.DataFrame):
    """→ ({term: [segment handles]}, {term: total df}) — metadata only,
    no posting bytes decoded."""
    per_term: dict[str, list[_Seg]] = {}
    df_tot: dict[str, int] = {}
    gens = pdf["gen"] if "gen" in pdf.columns else None
    for r in pdf[pdf["kind"] == "post"].itertuples():
        s = _Seg()
        s.pbuf, s.posbuf = r.postings, r.positions
        s.gen = int(r.gen) if gens is not None else 0
        s.blast, _, _, s.bends = decode_block_meta(r.blockmeta)
        per_term.setdefault(r.term, []).append(s)
        df_tot[r.term] = df_tot.get(r.term, 0) + int(r.df)
    return per_term, df_tot


def _blocks_holding(seg: _Seg, cand: np.ndarray) -> np.ndarray:
    """Sorted unique block indexes whose docid range may contain ``cand``."""
    bi = np.searchsorted(seg.blast, cand, side="left")
    return np.unique(bi[bi < len(seg.blast)])


def _intersect_candidates(
    per_term: dict[str, list[_Seg]], order: list[str],
    dels: DelIndex | None = None,
) -> np.ndarray:
    """Conjunctive docid intersection, rarest term first; later terms decode
    only blocks that can still hold survivors. Tombstones are applied PER
    SEGMENT GENERATION (a del masks only older generations), so a docid
    deleted and later re-added intersects through its new generation's
    postings only — and the per-generation parts stay docid-disjoint."""
    cand: np.ndarray | None = None
    for t in order:
        parts = []
        for s in per_term[t]:
            if cand is None:
                ids = decode_postings(s.pbuf)[0]
            else:
                bi = _blocks_holding(s, cand)
                if len(bi) == 0:
                    continue
                ids = decode_blocks(s.pbuf, s.bends, bi)[0]
            if dels:
                ids = ids[dels.keep_mask(s.gen, ids)]
            parts.append(ids)
        ids = np.concatenate(parts) if parts else np.zeros(0, np.int64)
        cand = ids if cand is None else np.intersect1d(cand, ids, assume_unique=True)
        if len(cand) == 0:
            return cand
    return np.sort(cand)


def _term_positions(segs: list[_Seg], cand: np.ndarray,
                    dels: DelIndex | None = None):
    """(ids, tfs, flat positions) for one term, restricted to blocks holding
    ``cand``, merged across generations into docid order. Tombstoned
    postings (per-generation mask) are dropped so a re-added docid never
    sees its dead predecessor's positions."""
    per = []
    for s in segs:
        bi = _blocks_holding(s, cand)
        if len(bi) == 0:
            continue
        ids, tfs = decode_blocks(s.pbuf, s.bends, bi)
        flat = decode_positions_blocks(s.posbuf, bi, tfs)
        if dels:
            keep = dels.keep_mask(s.gen, ids)
            if not keep.all():
                flat = flat[np.repeat(keep, tfs)]
                ids, tfs = ids[keep], tfs[keep]
        if len(ids) == 0:
            continue
        per.append((ids, tfs.astype(np.int64), flat))
    if not per:
        return _EMPTY
    ids = np.concatenate([p[0] for p in per])
    tfs = np.concatenate([p[1] for p in per])
    flat = np.concatenate([p[2] for p in per])
    if len(per) > 1:  # generations' docid sets are disjoint
        order = np.argsort(ids, kind="stable")
        flat = gather_runs(flat, tfs, order)
        ids, tfs = ids[order], tfs[order]
    return ids, tfs, flat


def _packed_keys(ids, tfs, flat, common: np.ndarray, slot: int):
    """int64 keys rank(doc)*MAXPOS + (pos - slot) for postings of docs in
    ``common`` (sorted); negatives dropped."""
    idx = np.searchsorted(common, ids)
    keep = (idx < len(common)) & (common[np.minimum(idx, len(common) - 1)] == ids)
    ranks = np.repeat(idx[keep], tfs[keep])
    pos = flat[np.repeat(keep, tfs)]
    shifted = pos - slot
    ok = shifted >= 0
    return ranks[ok] * MAXPOS + shifted[ok]


def _phrase_shard(pdf: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
    """One shard's relevant segment rows → (docid, n_occurrences)."""
    empty = pd.DataFrame({"docid": pd.Series([], dtype="int64"),
                          "n_occurrences": pd.Series([], dtype="int64")})
    per_term, df_tot = _term_handles(pdf)
    distinct = sorted(set(terms))
    if any(t not in per_term for t in distinct):
        return empty  # conjunctive: a missing term empties this shard

    dels = DelIndex.from_pdf(pdf)
    order = sorted(distinct, key=lambda t: (df_tot[t], t))
    common = _intersect_candidates(per_term, order, dels)
    if len(common) == 0:
        return empty

    decoded = {t: _term_positions(per_term[t], common, dels) for t in distinct}
    matched = _packed_keys(*decoded[terms[0]], common, 0)
    for i, t in enumerate(terms[1:], start=1):
        if len(matched) == 0:
            return empty
        matched = np.intersect1d(
            matched, _packed_keys(*decoded[t], common, i), assume_unique=True
        )
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
    per_term, df_tot = _term_handles(pdf)
    if term_a not in per_term or term_b not in per_term:
        return empty
    dels = DelIndex.from_pdf(pdf)
    order = sorted([term_a, term_b], key=lambda t: (df_tot[t], t))
    common = _intersect_candidates(per_term, order, dels)
    if len(common) == 0:
        return empty

    ids_a, tfs_a, flat_a = _term_positions(per_term[term_a], common, dels)
    ids_b, tfs_b, flat_b = _term_positions(per_term[term_b], common, dels)

    idx = np.searchsorted(common, ids_a)
    keep = (idx < len(common)) & (common[np.minimum(idx, len(common) - 1)] == ids_a)
    ranks_a = np.repeat(idx[keep], tfs_a[keep])
    pos_a = flat_a[np.repeat(keep, tfs_a)]
    keys_a = ranks_a * MAXPOS + pos_a
    keys_b = _packed_keys(ids_b, tfs_b, flat_b, common, 0)
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


def _near_n_shard(
    pdf: pd.DataFrame, terms: list[str], k: int, ordered: bool
) -> pd.DataFrame:
    """One shard → (docid, n_anchors): N-term proximity.

    Unordered: an anchor = an occurrence of terms[0] with, for EVERY other
    term, at least one occurrence within token distance ≤ k of the anchor.
    Ordered: an anchor = an occurrence p₁ of terms[0] starting a chain
    p₁ < p₂ < … < p_N with each gap ≤ k (terms in the given order) —
    computed by backward reachability (filter term i's occurrences to those
    with a reachable term-i+1 occurrence in (p, p+k]), all searchsorted."""
    empty = pd.DataFrame({"docid": pd.Series([], dtype="int64"),
                          "n_anchors": pd.Series([], dtype="int64")})
    per_term, df_tot = _term_handles(pdf)
    distinct = sorted(set(terms))
    if any(t not in per_term for t in distinct):
        return empty
    dels = DelIndex.from_pdf(pdf)
    order = sorted(distinct, key=lambda t: (df_tot[t], t))
    common = _intersect_candidates(per_term, order, dels)
    if len(common) == 0:
        return empty
    keys = {
        t: _packed_keys(*_term_positions(per_term[t], common, dels), common, 0)
        for t in distinct
    }
    anchors = keys[terms[0]]
    if len(anchors) == 0:
        return empty
    base = (anchors // MAXPOS) * MAXPOS
    if not ordered:
        ok = np.ones(len(anchors), dtype=bool)
        for t in terms[1:]:
            other = keys[t]
            lo = np.maximum(anchors - k, base)
            hi = np.minimum(anchors + k, base + MAXPOS - 1)
            cnt = (np.searchsorted(other, hi, side="right")
                   - np.searchsorted(other, lo, side="left"))
            ok &= cnt > 0
        good = anchors[ok]
    else:
        reach = keys[terms[-1]]
        for t in reversed(terms[:-1]):
            cur = keys[t]
            cur_base = (cur // MAXPOS) * MAXPOS
            lo = cur + 1  # strictly increasing positions, same doc
            hi = np.minimum(cur + k, cur_base + MAXPOS - 1)
            cnt = (np.searchsorted(reach, hi, side="right")
                   - np.searchsorted(reach, lo, side="left"))
            reach = cur[cnt > 0]
            if len(reach) == 0:
                return empty
        good = reach
    if len(good) == 0:
        return empty
    ranks, counts = np.unique(good // MAXPOS, return_counts=True)
    return pd.DataFrame({"docid": common[ranks].astype(np.int64),
                         "n_anchors": counts.astype(np.int64)})


def _phrase_scored_shard(
    pdf: pd.DataFrame, terms: list[str],
    qweights: dict[str, float], avgdl: float,
    k: int, round_to: int | None, cap: int,
) -> pd.DataFrame:
    """One shard → phrase-matching docs scored by BM25 over the phrase's
    distinct terms (exact tf/doclen from the already-decoded blocks), with
    per-shard emission using the engine's rounded-bar + (score desc, docid
    asc) pinning — the same contract as wand._score_shard."""
    from .. import B, K1

    empty = pd.DataFrame(columns=["docid", "score"]).astype(
        {"docid": "int64", "score": "float64"})
    matched = _phrase_shard(pdf, terms)
    if matched.empty:
        return empty
    cand = matched["docid"].to_numpy(dtype=np.int64)  # sorted (common order)
    dels = DelIndex.from_pdf(pdf)
    per_term, _ = _term_handles(pdf)
    from .wand import _doc_meta

    all_ids, all_lens = _doc_meta(pdf[pdf["kind"] == "docs"])
    norm = K1 * (1.0 - B + B * all_lens.astype(np.float64) / avgdl)
    scores = np.zeros(len(cand))
    for t in sorted(set(terms)):
        idf = qweights[t]
        ids, tfs, _ = _term_positions(per_term[t], cand, dels)
        hit = np.searchsorted(cand, ids)
        ok = (hit < len(cand)) & (cand[np.minimum(hit, len(cand) - 1)] == ids)
        pos = np.searchsorted(all_ids, ids[ok])
        scores[hit[ok]] += idf * (tfs[ok] * (K1 + 1.0)) / (tfs[ok] + norm[pos])
    rounded = np.round(scores, round_to) if round_to is not None else scores
    if len(cand) > k:
        bar = np.partition(rounded, -k)[-k]
        sel = rounded >= bar
    else:
        sel = np.ones(len(cand), dtype=bool)
    ids_e, raw_e, rnd_e = cand[sel], scores[sel], rounded[sel]
    order_e = np.lexsort((ids_e, -rnd_e))[:cap]
    return pd.DataFrame({
        "docid": pd.Series(ids_e[order_e], dtype="int64"),
        "score": pd.Series(raw_e[order_e], dtype="float64"),
    })


def _positional_segments(spark: SparkSession, index_dir: str):
    """(build params, committed segment rows) — one build.json read."""
    from .spimi import committed_segments

    with open(f"{index_dir}/build.json") as f:
        params = json.load(f)
    if not params.get("positions"):
        raise ValueError(
            "index was built without positions (layout v1); "
            "rebuild with build_index(..., positions=True) for "
            "phrase/proximity queries"
        )
    return params, committed_segments(spark, index_dir)


def _relevant_rows(seg: DataFrame, terms: list[str]) -> DataFrame:
    return seg.filter(
        ((F.col("kind") == "post") & F.col("term").isin(sorted(set(terms))))
        | (F.col("kind") == "dels")
    )


def phrase_match(
    spark: SparkSession, index_dir: str, phrase: str
) -> DataFrame:
    """(docid, n_occurrences): documents containing the exact token phrase,
    with occurrence counts — served entirely from the positional index."""
    params, seg = _positional_segments(spark, index_dir)
    terms = get_analyzer(params.get("analyzer", "default")).py_tokenize(phrase)
    if not terms:
        raise ValueError("empty phrase after analysis")
    return _relevant_rows(seg, terms).groupBy("shard").applyInPandas(
        lambda pdf: _phrase_shard(pdf, terms),
        "docid long, n_occurrences long",
    )


def near_match(
    spark: SparkSession, index_dir: str, term_a: str, term_b: str, k: int = 3
) -> DataFrame:
    """(docid, n_pairs): documents where analyzed terms a and b co-occur
    within token distance ≤ k, with the pair count — a proximity (NEAR/k)
    query served from the positional index. Same scan shape as
    :func:`phrase_match`."""
    params, seg = _positional_segments(spark, index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    ta, tb = (tokenize(term_a) or [""])[0], (tokenize(term_b) or [""])[0]
    if not ta or not tb or ta == tb:
        raise ValueError("NEAR needs two distinct non-empty analyzed terms")
    return _relevant_rows(seg, [ta, tb]).groupBy("shard").applyInPandas(
        lambda pdf: _near_shard(pdf, ta, tb, k),
        "docid long, n_pairs long",
    )


def near_match_n(
    spark: SparkSession, index_dir: str, terms: list[str], k: int = 3,
    ordered: bool = False,
) -> DataFrame:
    """(docid, n_anchors): generalized N-term proximity from the positional
    index. Unordered: anchors (occurrences of terms[0]) with every other
    term within token distance ≤ k. Ordered: anchors starting a strictly-
    increasing chain through the terms with each gap ≤ k. Same scan shape
    as phrase_match (term-pruned segment scan, one shuffle of results)."""
    params, seg = _positional_segments(spark, index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    analyzed = [t for term in terms for t in tokenize(term)]
    if len(analyzed) < 2:
        raise ValueError("NEAR/n needs at least two analyzed terms")
    return _relevant_rows(seg, analyzed).groupBy("shard").applyInPandas(
        lambda pdf: _near_n_shard(pdf, analyzed, k, ordered),
        "docid long, n_anchors long",
    )


def phrase_match_batch(
    spark: SparkSession, index_dir: str, queries: list[tuple[int, str]]
) -> DataFrame:
    """(query_id, docid, n_occurrences): N phrase queries in ONE Spark job —
    one segment scan pruned to the UNION of all queries' terms, one shuffle.
    At serving scale the per-job scheduling cost (~0.5 s locally) dominates
    single phrase queries; batching amortizes it exactly like wand's
    topk_batch. Row-identical to per-query :func:`phrase_match`."""
    params, seg = _positional_segments(spark, index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    plans = [(int(qid), tokenize(text)) for qid, text in queries]
    if any(not ts for _, ts in plans):
        raise ValueError("empty phrase after analysis")
    all_terms = sorted({t for _, ts in plans for t in ts})

    def shard_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, ts in plans:
            out = _phrase_shard(pdf, ts)
            if not out.empty:
                out.insert(0, "query_id", np.int32(qid))
                frames.append(out)
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int32"),
                "docid": pd.Series([], dtype="int64"),
                "n_occurrences": pd.Series([], dtype="int64"),
            })
        return pd.concat(frames, ignore_index=True)

    return _relevant_rows(seg, all_terms).groupBy("shard").applyInPandas(
        shard_fn, "query_id int, docid long, n_occurrences long"
    )


def near_match_n_batch(
    spark: SparkSession, index_dir: str,
    queries: list[tuple[int, list[str]]], k: int = 3, ordered: bool = False,
) -> DataFrame:
    """(query_id, docid, n_anchors): N proximity queries in one job (same
    batching contract as :func:`phrase_match_batch`)."""
    params, seg = _positional_segments(spark, index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    plans = []
    for qid, terms in queries:
        analyzed = [t for term in terms for t in tokenize(term)]
        if len(analyzed) < 2:
            raise ValueError(f"NEAR/n query {qid} needs >= 2 analyzed terms")
        plans.append((int(qid), analyzed))
    all_terms = sorted({t for _, ts in plans for t in ts})

    def shard_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, ts in plans:
            out = _near_n_shard(pdf, ts, k, ordered)
            if not out.empty:
                out.insert(0, "query_id", np.int32(qid))
                frames.append(out)
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int32"),
                "docid": pd.Series([], dtype="int64"),
                "n_anchors": pd.Series([], dtype="int64"),
            })
        return pd.concat(frames, ignore_index=True)

    return _relevant_rows(seg, all_terms).groupBy("shard").applyInPandas(
        shard_fn, "query_id int, docid long, n_anchors long"
    )


def phrase_topk_batch(
    spark: SparkSession, index_dir: str, queries: list[tuple[int, str]],
    k: int = 10, round_to: int | None = 4, tie_cap: int = 4096,
) -> DataFrame:
    """(query_id, rank, docid, score): N RANKED phrase queries in one
    scoring job + one top-k window — the batch twin of :func:`phrase_topk`
    (rank-identical per query)."""
    from .spimi import load_stats
    from .wand import _idf, _lookup_dfs

    params, seg = _positional_segments(spark, index_dir)
    stats = load_stats(index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    plans = [(int(qid), tokenize(text)) for qid, text in queries]
    if any(not ts for _, ts in plans):
        raise ValueError("empty phrase after analysis")
    all_terms = sorted({t for _, ts in plans for t in ts})
    termstats = spark.read.parquet(f"{index_dir}/termstats")
    df_by_term = _lookup_dfs(termstats, all_terms)
    qweights = {t: _idf(stats["n_docs"], df_by_term[t])
                for t in all_terms if t in df_by_term}
    # a phrase with an unindexed term matches nothing (conjunctive)
    live = [(qid, ts) for qid, ts in plans
            if all(t in df_by_term for t in ts)]
    if not live:
        return spark.createDataFrame(
            [], "query_id int, rank int, docid long, score double")
    relevant = seg.filter(
        ((F.col("kind") == "post") & F.col("term").isin(all_terms))
        | (F.col("kind") == "docs")
        | (F.col("kind") == "dels")
    )

    def shard_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, ts in live:
            out = _phrase_scored_shard(
                pdf, ts, qweights, stats["avgdl"], k, round_to, tie_cap)
            if not out.empty:
                out.insert(0, "query_id", np.int32(qid))
                frames.append(out)
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int32"),
                "docid": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            })
        return pd.concat(frames, ignore_index=True)

    local = relevant.groupBy("shard").applyInPandas(
        shard_fn, "query_id int, docid long, score double"
    )
    from pyspark.sql import Window as W

    score = (F.round(F.col("score"), round_to) if round_to is not None
             else F.col("score"))
    win = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("docid").asc())
    return (
        local.select("query_id", "docid", score.alias("score"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "docid", "score")
    )


def phrase_topk(
    spark: SparkSession, index_dir: str, phrase: str, k: int = 10,
    round_to: int | None = 4, tie_cap: int = 4096,
) -> DataFrame:
    """(rank, docid, score): RANKED phrase — documents containing the exact
    token phrase, ordered by BM25 over the phrase's terms with the engine's
    (score desc, docid asc) pinning. The reference ranks its containment
    matches inside the candidate ladder (J7, `PoiAddrJoinBuilder.java:67-
    189`); this is that composition served from the positional index:
    phrase candidates and their tfs come from the same block-selective
    decode, doclens from the shard's docmeta, df/avgdl from the committed
    stats — one scoring job + the global top-k window."""
    from .spimi import load_stats
    from .wand import _idf, _lookup_dfs

    params, seg = _positional_segments(spark, index_dir)
    stats = load_stats(index_dir)
    tokenize = get_analyzer(params.get("analyzer", "default")).py_tokenize
    terms = tokenize(phrase)
    if not terms:
        raise ValueError("empty phrase after analysis")
    termstats = spark.read.parquet(f"{index_dir}/termstats")
    df_by_term = _lookup_dfs(termstats, sorted(set(terms)))
    if any(t not in df_by_term for t in terms):
        return spark.createDataFrame([], "rank int, docid long, score double")
    qweights = {t: _idf(stats["n_docs"], df_by_term[t]) for t in set(terms)}
    relevant = seg.filter(
        ((F.col("kind") == "post") & F.col("term").isin(sorted(set(terms))))
        | (F.col("kind") == "docs")
        | (F.col("kind") == "dels")
    )
    local = relevant.groupBy("shard").applyInPandas(
        lambda pdf: _phrase_scored_shard(
            pdf, terms, qweights, stats["avgdl"], k, round_to, tie_cap
        ),
        "docid long, score double",
    )
    from pyspark.sql import Window as W

    score = (F.round(F.col("score"), round_to) if round_to is not None
             else F.col("score"))
    win = W.orderBy(F.col("score").desc(), F.col("docid").asc())
    return (
        local.select("docid", score.alias("score"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("rank", "docid", "score")
    )
