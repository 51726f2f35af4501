"""Training-data pipeline operator tests (dedup / similarity / textstats /
multimodal) — exact oracles computed in plain Python/numpy on small data."""

from __future__ import annotations

import numpy as np
import pytest

from gazetteer_spark.analyzer import py_tokenize
from gazetteer_spark.ops import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup
        (3, "pack my box with five dozen liquor jugs"),
        (4, "sphinx of black quartz judge my vow"),
        (5, "the quick brown fox jumps over the lazy dog today"),    # near dup
        (6, "completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text, n=3):
    t = py_tokenize(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_exact_dedup(spark, docs):
    out = {r["docid"]: (r["canonical"], r["cluster_size"])
           for r in dedup.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[0] == (0, 2) and out[1] == (0, 2)
    assert out[2] == (2, 1)


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = {r["docid"]: tuple(r[f"sig_{i}"] for i in range(dedup.N_HASHES))
            for r in dedup.minhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]


def test_jaccard_pairs_match_python(spark, docs):
    got = {(r["docid_a"], r["docid_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(docs, "doc_id", "text", 0.3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for a in texts:
        for b in texts:
            if a < b:
                j = round(_jaccard(texts[a], texts[b]), 6)
                if j >= 0.3:
                    assert got.get((a, b)) == pytest.approx(j, abs=1e-6), (a, b)
                else:
                    assert (a, b) not in got


def test_jaccard_hot_shingle_cap_bounds_pairs(spark):
    """A shingle shared by every doc must not explode the pair join: with a
    df cap the skewed corpus yields ZERO candidate pairs (docs share only
    the hot shingle), instead of n²/2."""
    n = 200
    rows = [
        (i, f"alpha beta gamma uq{i}a uq{i}b uq{i}c uq{i}d uq{i}e")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.jaccard_pairs(df, "doc_id", "text", 0.01, max_df=10).collect()
    assert capped == []
    # and on an unskewed corpus the cap is a no-op vs the uncapped plan
    small = spark.createDataFrame(rows[:5], "doc_id long, text string")
    with_cap = {tuple(r) for r in
                dedup.jaccard_pairs(small, "doc_id", "text", 0.01, max_df=10).collect()}
    no_cap = {tuple(r) for r in
              dedup.jaccard_pairs(small, "doc_id", "text", 0.01, max_df=None).collect()}
    assert with_cap == no_cap


def test_minhash_dedup_finds_planted_dups(spark, docs):
    pairs = {(r["docid_a"], r["docid_b"])
             for r in dedup.minhash_dedup_pairs(docs, "doc_id", "text", 0.5).collect()}
    assert (0, 1) in pairs            # exact dup always survives LSH
    assert all(a < b for a, b in pairs)
    # verified stage guarantees no false positives vs exact jaccard
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for a, b in pairs:
        assert _jaccard(texts[a], texts[b]) >= 0.5


def test_simhash(spark, docs):
    h = {r["docid"]: r["simhash"] for r in
         dedup.simhash(docs, "doc_id", "text").collect()}
    assert h[0] == h[1]
    assert 0 <= h[0] < 2**32
    pairs = {(r["docid_a"], r["docid_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(docs, "doc_id", "text", 3).collect()}
    assert pairs[(0, 1)] == 0


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.cosine_topk(emb, query_id=0, k=10).orderBy("rank").collect()
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = sorted(
        (
            (round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6), -i)
            for i, v in vecs.items() if i != 0
        ),
        reverse=True,
    )[:10]
    want = [(-i, s) for s, i in sims]
    assert [(r["vec_id"], r["sim"]) for r in got] == [
        (i, pytest.approx(s, abs=2e-6)) for i, s in want
    ]


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.lsh_cosine_topk(emb, query_id=0, k=5).collect()
    assert 0 < len(got) <= 5
    assert all(r["vec_id"] != 0 for r in got)
    # determinism
    again = similarity.lsh_cosine_topk(emb, query_id=0, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_lsh_topk_multiprobe_recall(spark, sf_dir):
    """Multi-probe must fill k at sf-scale (single-bucket probing returned 1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.lsh_cosine_topk(emb, query_id=0, k=10).collect()
    assert len(got) == 10
    # probe-set recall vs exact: the true #1 neighbor usually shares the
    # bucket neighborhood; at minimum results must be a subset of exact sims
    exact = {r["vec_id"]: r["sim"]
             for r in similarity.cosine_topk(emb, query_id=0, k=500).collect()}
    for r in got:
        assert exact[r["vec_id"]] == pytest.approx(r["sim"], abs=1e-9)


def test_ivf_training_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.train_ivf_centroids(emb, n_lists=8, iters=2)
    b = similarity.train_ivf_centroids(emb, n_lists=8, iters=2)
    assert a == b
    assert len(a) == 8 and all(len(c) == 64 for c in a)


def test_ivf_train_sampled(spark, sf_dir):
    """Sample-based training (the 100-TB path): deterministic, right shape,
    and the sampled centroids still serve with reasonable recall."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.train_ivf_centroids(emb, n_lists=8, iters=3, sample_mod=4)
    b = similarity.train_ivf_centroids(emb, n_lists=8, iters=3, sample_mod=4)
    assert a == b
    assert len(a) == 8 and all(len(c) == 64 for c in a)
    full = similarity.train_ivf_centroids(emb, n_lists=8, iters=3)
    assert a != full  # the sample predicate actually restricted training
    got = similarity.ivf_cosine_topk(
        emb, 0, k=10, n_lists=8, n_probe=3, centroids=a
    ).collect()
    assert len(got) == 10
    exact = {r["vec_id"] for r in
             similarity.cosine_topk(emb, 0, k=10).collect()}
    assert len({r["vec_id"] for r in got} & exact) / 10 >= 0.3


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    """Probing every list is an exact scan — must equal brute-force top-k."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_seed_centroids(n_lists=8)
    ivf = similarity.ivf_cosine_topk(
        emb, 0, k=10, n_lists=8, n_probe=8, centroids=cents
    ).orderBy("rank").collect()
    exact = similarity.cosine_topk(emb, 0, k=10).orderBy("rank").collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_ivf_trained_recall(spark, sf_dir):
    """Trained centroids + partial probe: k rows returned, subset of exact
    sims, reasonable recall on the clustered synthetic data."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_ivf_centroids(emb, n_lists=8, iters=3)
    got = similarity.ivf_cosine_topk(
        emb, 0, k=10, n_lists=8, n_probe=3, centroids=cents
    ).collect()
    assert len(got) == 10
    exact = {r["vec_id"] for r in
             similarity.cosine_topk(emb, 0, k=10).collect()}
    recall = len({r["vec_id"] for r in got} & exact) / 10
    assert recall >= 0.3


def test_ivf_layout_matches_inline(spark, sf_dir, tmp_path_factory):
    """The materialized IVF layout serves the same result as the inline
    assignment path, and the scan prunes to the probed partitions."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_seed_centroids(n_lists=8)
    d = str(tmp_path_factory.mktemp("ivf_layout"))
    similarity.build_ivf_layout(emb, d, centroids=cents, n_lists=8)
    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    got = similarity.ivf_topk_layout(spark, d, list(qvec), k=11, n_probe=3)
    rows = [r for r in got.collect() if r["vec_id"] != 0][:10]
    inline = similarity.ivf_cosine_topk(
        emb, 0, k=10, n_lists=8, n_probe=3, centroids=cents
    ).orderBy("rank").collect()
    assert [(r["vec_id"], r["sim"]) for r in rows] == [
        (r["vec_id"], pytest.approx(r["sim"], abs=1e-9)) for r in inline
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "list_id" in part_filters
    assert "TakeOrderedAndProject" in plan  # distributed top-k merge


def test_lsh_layout_matches_inline(spark, sf_dir, tmp_path_factory):
    """The materialized LSH bucket layout serves the same result as the
    inline multi-probe scan, reading only the probed bucket partitions."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path_factory.mktemp("lsh_layout"))
    similarity.build_lsh_layout(emb, d)
    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    got = similarity.lsh_topk_layout(spark, d, list(qvec), k=10,
                                     exclude_vec_id=0)
    inline = similarity.lsh_cosine_topk(emb, query_id=0, k=10) \
        .orderBy("rank").collect()
    assert [(r["rank"], r["vec_id"], r["sim"]) for r in
            got.orderBy("rank").collect()] == [
        (r["rank"], r["vec_id"], pytest.approx(r["sim"], abs=1e-9))
        for r in inline
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in part_filters
    assert "TakeOrderedAndProject" in plan  # distributed top-k merge


def test_ann_layout_batch_matches_single(spark, sf_dir, tmp_path_factory):
    """Batched layout serving (N queries, one job) is result-identical to
    per-query calls for BOTH layouts, reads only the union of probed
    partitions, and merges via the group-limited window (map-side
    WindowGroupLimit prune below the exchange — never the full scored
    set into one task)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 7, 42]
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin(qids)).collect()}
    queries = [(q, vecs[q]) for q in qids]
    excl = {q: q for q in qids}

    ld = str(tmp_path_factory.mktemp("lsh_batch"))
    similarity.build_lsh_layout(emb, ld)
    batch = similarity.lsh_topk_layout_batch(spark, ld, queries, k=10,
                                             exclude_ids=excl)
    got = sorted(tuple(r) for r in batch.collect())
    want = sorted(
        (q, r["rank"], r["vec_id"], r["sim"])
        for q in qids
        for r in similarity.lsh_topk_layout(
            spark, ld, vecs[q], k=10, exclude_vec_id=q).collect()
    )
    assert got == want and len(got) == 30
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan.split("PartitionFilters: [")[1].split("]")[0]
    ex = plan.index("Exchange hashpartitioning")
    assert "WindowGroupLimit" in plan[ex:] and "Partial" in plan[ex:], plan

    iv = str(tmp_path_factory.mktemp("ivf_batch"))
    similarity.build_ivf_layout(emb, iv,
                                centroids=similarity.ivf_seed_centroids())
    ibatch = similarity.ivf_topk_layout_batch(spark, iv, queries, k=10,
                                              exclude_ids=excl)
    igot = {q: [] for q in qids}
    for r in ibatch.orderBy("query_id", "rank").collect():
        igot[r["query_id"]].append((r["vec_id"], r["sim"]))
    for q in qids:
        single = [(r["vec_id"], r["sim"]) for r in
                  similarity.ivf_topk_layout(spark, iv, vecs[q], k=11)
                  .orderBy("rank").collect() if r["vec_id"] != q][:10]
        assert igot[q] == single, q
    iplan = ibatch._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in iplan.split("PartitionFilters: [")[1].split("]")[0]


def test_ivf_exact_adaptive_probing(spark, sf_dir, tmp_path_factory):
    """Radius-bound adaptive probing is EXACT: result-identical to
    brute-force cosine top-k for several queries, while the probe set is
    provably sufficient (and reported)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path_factory.mktemp("ivf_exact"))
    similarity.build_ivf_layout(emb, d,
                                centroids=similarity.ivf_seed_centroids())
    for qid in (0, 7, 42):
        vec = [float(x) for x in emb.filter(
            F.col("vec_id") == qid).collect()[0]["embedding"]]
        stats: dict = {}
        got = similarity.ivf_topk_exact(
            spark, d, vec, k=10, exclude_vec_id=qid, probe_stats=stats
        ).orderBy("rank").collect()
        want = similarity.cosine_topk(emb, qid, k=10).orderBy("rank").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], qid
        assert 0 < stats["n_probed"] <= stats["n_lists"]
    # the layout without radii must still be exact (probe-all fallback)
    import json as _json

    meta = _json.load(open(f"{d}/layout.json"))
    assert len(meta["radii"]) == meta["n_lists"]


def test_ivf_exact_random_queries_identity(spark, tmp_path_factory):
    """Exactness holds for arbitrary (seeded-random) vectors and query
    points, including queries that are NOT corpus members, across mixed
    cluster tightness."""
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    rows = []
    for vid in range(120):
        c = vid % 4
        base = np.zeros(16)
        base[c * 4:(c + 1) * 4] = 1.0
        spread = 0.05 if c < 2 else 1.0  # two tight + two diffuse clusters
        v = base + spread * rng.randn(16)
        rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path_factory.mktemp("ivf_rand"))
    similarity.build_ivf_layout(
        emb, d, centroids=similarity.ivf_seed_centroids(dim=16, n_lists=8),
        n_lists=8, dim=16,
    )
    for trial in range(4):
        qv = [float(x) for x in rng.randn(16)]
        got = similarity.ivf_topk_exact(spark, d, qv, k=7).orderBy(
            "rank").collect()
        # brute force over the same vectors for an external query point
        from pyspark.sql import Window as W

        qlit = F.array(*[F.lit(x) for x in qv])
        scored = emb.select(
            "vec_id",
            F.round(similarity.cosine_expr(F.col("embedding"), qlit),
                    6).alias("sim"),
        )
        w = W.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        want = (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 7).collect())
        assert [tuple(r) for r in got] == [
            (r["rank"], r["vec_id"], r["sim"]) for r in want], trial


def test_ivf_exact_prunes_tight_clusters(spark, tmp_path_factory):
    """On data where the bound can bite — tight clusters — the adaptive
    probe PRUNES lists (n_probed < n_lists) and still returns the exact
    brute-force result."""
    rng = np.random.RandomState(7)
    rows, vid = [], 0
    for axis in range(3):
        base = np.zeros(64)
        base[axis] = 1.0
        for _ in range(40):
            v = base + 0.02 * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path_factory.mktemp("ivf_tight"))
    similarity.build_ivf_layout(emb, d,
                                centroids=similarity.ivf_seed_centroids())
    stats: dict = {}
    got = similarity.ivf_topk_exact(
        spark, d, rows[0][1], k=10, exclude_vec_id=0, probe_stats=stats
    ).orderBy("rank").collect()
    want = similarity.cosine_topk(emb, 0, k=10).orderBy("rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert stats["n_probed"] < stats["n_lists"], stats


def test_near_dup_pairs_lsh_gated(spark, sf_dir):
    """LSH-gated pairs ⊆ exact pairs, same sims; plan has no cartesian."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(150)
    lsh = {(r["id_a"], r["id_b"]): r["sim"]
           for r in similarity.cosine_near_dup_pairs(emb, 0.4).collect()}
    exact = {(r["id_a"], r["id_b"]): r["sim"]
             for r in similarity.exact_cosine_pairs(emb, 0.4).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == pytest.approx(v, abs=1e-9)
    plan = similarity.cosine_near_dup_pairs(emb, 0.4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_near_dup_pairs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    got = {(r["id_a"], r["id_b"]): r["sim"]
           for r in similarity.exact_cosine_pairs(emb, 0.4).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    want = {}
    for a in vecs:
        for b in vecs:
            if a < b:
                s = round(float(vecs[a] @ vecs[b] /
                                (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))), 6)
                if s >= 0.4:
                    want[(a, b)] = s
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_label_centroids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.pairwise_label_centroids(emb).collect()
    n_labels = emb.select("label").distinct().count()
    assert len(out) == n_labels * 64  # one row per (label, dim)
    # spot-check label 0 / pos 0 against numpy
    rows = emb.filter("label = 0").select("embedding").collect()
    want = round(float(np.mean([r["embedding"][0] for r in rows])), 6)
    got = [r for r in out if r["label"] == 0 and r["pos"] == 0]
    assert len(got) == 1
    assert got[0]["mean"] == pytest.approx(want, abs=2e-6)
    assert got[0]["n"] == len(rows)


def test_embed_media_roundtrip_and_ann(spark, sf_dir):
    """media → embedding bridge: vectors round-trip through the synthetic
    container at 6dp, and the result feeds ANN directly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    media = multimodal.synth_media(emb)
    back = multimodal.embed_media(media)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in back.collect():
        want = orig[r["media_id"]]
        assert len(r["embedding"]) == len(want)
        assert all(abs(a - b) < 1e-5 for a, b in zip(r["embedding"], want))
    topk = similarity.cosine_topk(
        back, query_id=back.first()["media_id"], k=5,
        id_col="media_id", vec_col="embedding",
    ).collect()
    assert len(topk) == 5
    with pytest.raises(NotImplementedError):
        multimodal.embed_media(media, real_codecs=True)


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is in that house for now"),
            (1, "der hund und die katze ist nicht ein problem"),
            (2, "xyzzy qwerty asdf"),
        ],
        "doc_id long, text string",
    )
    out = {r["docid"]: r["lang_guess"] for r in
           textstats.lang_scores(df, "doc_id", "text").collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "unknown"


def test_quality_and_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "A normal sentence, with words of reasonable length and more.")],
        "doc_id long, text string",
    )
    q = textstats.quality_scores(df, "doc_id", "text").collect()[0]
    assert q["n_tokens"] == 10
    assert q["quality"] >= 0.9
    t = textstats.token_counts(df, "doc_id", "text").collect()[0]
    assert t["ws_tokens"] == 10
    assert t["bpe_ish_tokens"] == 12  # 10 words + ',' + '.' split as symbols


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r["docid"]: r["fingerprint"] for r in
          textstats.fingerprints(df, "doc_id", "text").collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_multimodal_roundtrip(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    media = multimodal.synth_media(emb)
    stats = {r["media_id"]: r for r in multimodal.media_stats(media).collect()}
    assert all(r["n_bytes"] > 4 for r in stats.values())

    feats = {r["media_id"]: r for r in multimodal.decode_features(media).collect()}
    assert len(feats) == 50
    assert all(r["n_values"] == 64 for r in feats.values())

    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:5]:
        mean6 = round(
            float(np.mean([float(f"{x:.6f}".replace(",", "")) for x in r["embedding"]])), 6
        )
        assert feats[r["vec_id"]]["mean_value"] == pytest.approx(mean6, abs=1e-5)

    with pytest.raises(NotImplementedError):
        multimodal.decode_features(media, real_codecs=True)

    fr = multimodal.frame_sample(media, every=4)
    assert fr.groupBy("media_id").count().collect()[0]["count"] == 16
