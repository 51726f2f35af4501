"""Training-data pipeline ops: chunking spans, deterministic splits,
balanced sampling — edge cases beyond the catalog's DuckDB oracle compare.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.ops import pipeline


def test_chunk_spans_windows(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 toks → 1 chunk
        (2, " ".join(f"t{i}" for i in range(32))),   # exactly size → 1
        (3, " ".join(f"t{i}" for i in range(33))),   # size+1 → 2 chunks
        (4, " ".join(f"t{i}" for i in range(80))),   # 80 → 1+ceil(48/24)=3
        (5, None),                                   # null → one empty chunk
        (6, ""),                                     # empty → one empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["docid"], r["chunk_id"], r["start_tok"], r["n_tok"])
        for r in pipeline.chunk_spans(df, "doc_id", "text",
                                      size=32, overlap=8).collect()
    }
    want = {
        (1, 0, 0, 10),
        (2, 0, 0, 32),
        (3, 0, 0, 32), (3, 1, 24, 9),
        (4, 0, 0, 32), (4, 1, 24, 32), (4, 2, 48, 32),
        (5, 0, 0, 0),
        (6, 0, 0, 0),
    }
    assert got == want
    # full coverage: consecutive chunks overlap by exactly `overlap` and
    # the last chunk ends at doclen
    assert max(s + n for d, c, s, n in got if d == 4) == 80


def test_chunk_spans_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pipeline.chunk_spans(df, "doc_id", "text", size=8, overlap=8)


def test_dataset_split_deterministic_and_proportional(spark, documents):
    a = {(r["docid"], r["split"])
         for r in pipeline.dataset_split(documents, "doc_id").collect()}
    b = {(r["docid"], r["split"])
         for r in pipeline.dataset_split(
             documents.repartition(7), "doc_id").collect()}
    assert a == b  # partitioning-independent
    n = documents.count()
    frac_train = sum(1 for _, s in a if s == "train") / n
    assert 0.9 <= frac_train <= 0.99  # ~0.95 within small-sample noise
    assert {s for _, s in a} == {"train", "val", "test"}


def test_dataset_split_weights_must_sum(spark, documents):
    with pytest.raises(ValueError):
        pipeline.dataset_split(documents, "doc_id",
                               weights={"a": 0.5, "b": 0.2})


def test_balanced_sample_caps_and_determinism(spark, documents):
    out = pipeline.balanced_sample(documents, "doc_id", "lang",
                                   n_per_group=7)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["group"], []).append(r["sample_rank"])
    n_groups = documents.select("lang").distinct().count()
    assert len(per) == n_groups
    for g, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 7
    again = {(r["docid"], r["group"], r["sample_rank"])
             for r in pipeline.balanced_sample(
                 documents.repartition(5), "doc_id", "lang",
                 n_per_group=7).collect()}
    assert again == {(r["docid"], r["group"], r["sample_rank"]) for r in rows}


def test_pack_sequences_invariants(spark):
    """Concat-and-pack: every doc appears once; within a bucket, offsets
    are the exact running sum of doclens in (hash key, docid) order;
    pack_id/pack_offset derive from start_tok and the budget — verified
    against a plain-Python re-implementation of the md5 bridge."""
    import hashlib

    from gazetteer_spark.analyzer import py_tokenize

    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40)))
            for i in range(60)] + [(60, None), (61, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["docid"]: (r["bucket"], r["start_tok"], r["pack_id"],
                        r["pack_offset"])
           for r in pipeline.pack_sequences(df, "doc_id", "text",
                                            budget=16, n_buckets=4).collect()}
    assert len(got) == len(rows)

    def key(docid):
        return int(hashlib.md5(str(docid).encode()).hexdigest()[:15], 16)

    lens = {i: (len(py_tokenize(t)) if t else 0) for i, t in rows}
    per_bucket: dict[int, list[int]] = {}
    for i, _ in rows:
        per_bucket.setdefault(key(i) % 4, []).append(i)
    for b, ids in per_bucket.items():
        start = 0
        for i in sorted(ids, key=lambda d: (key(d), d)):
            assert got[i] == (b, start, start // 16, start % 16), i
            start += lens[i]


def test_pack_sequences_deterministic_under_partitioning(spark):
    rows = [(i, f"tok{i} alpha beta") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pipeline.pack_sequences(
        df, "doc_id", "text", budget=8, n_buckets=3).collect()))
    b = sorted(map(tuple, pipeline.pack_sequences(
        df.repartition(13), "doc_id", "text", budget=8,
        n_buckets=3).collect()))
    assert a == b
