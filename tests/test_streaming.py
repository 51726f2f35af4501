"""Structured Streaming parity: the tumbling-window aggregation produces the
same result driven as a stream (file source → watermark → memory sink) as in
batch — the engine's late-data/incremental story (reference analog:
sortupdate latest-wins + diff, SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_window_matches_batch(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(events_path)
    schema = batch.schema

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    # (session TZ is pinned UTC, so the cast is value-preserving)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_out").collect()}
    want = {
        tuple(r)
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "total")
            .collect()
        )
    }
    assert got == want
    assert len(got) > 0


def test_streaming_index_ingest_matches_batch(spark, documents, tmp_path_factory):
    """foreachBatch incremental ingest: 3 micro-batches → 3 committed
    generations; top-k over the streamed index is rank-identical to a
    one-shot batch build."""
    from gazetteer_spark import streaming
    from gazetteer_spark.index import spimi, wand

    work = tmp_path_factory.mktemp("stream_ingest")
    src = str(work / "src")
    # three source files → three micro-batches (maxFilesPerTrigger=1)
    for i, (lo, hi) in enumerate([(0, 150), (150, 350), (350, 10**9)]):
        (documents.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}"))
    stream = (
        spark.readStream.schema(documents.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx = str(work / "idx")
    q = streaming.index_stream(
        spark, stream, idx, str(work / "ckpt"),
        id_col="doc_id", content_col="text", n_shards=8,
    )
    q.awaitTermination()

    gens = spimi.committed_generations(idx)
    assert len(gens) == 3  # one generation per micro-batch

    ref = str(work / "idx_batch")
    spimi.build_index(spark, documents, ref, n_shards=8,
                      id_col="doc_id", content_col="text")
    queries = [(0, "spark join merge"), (1, "customer filter group")]
    got = wand.topk(spark, idx, queries, k=10).orderBy("query_id", "rank").collect()
    want = wand.topk(spark, ref, queries, k=10).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_cdc_add_remove(spark, documents, tmp_path_factory):
    """CDC ingest (action add/remove per record): the streamed index must be
    byte-identical (manifest checksums) to the same operation sequence
    applied imperatively — removals apply BEFORE adds within a batch (the
    upsert convention), so [remove X, add X] in one batch keeps X."""
    from gazetteer_spark import streaming
    from gazetteer_spark.index import spimi

    work = tmp_path_factory.mktemp("stream_cdc")
    src = str(work / "src")
    batch1 = documents.filter(F.col("doc_id") < 300).withColumn(
        "action", F.lit("add"))
    adds2 = documents.filter(F.col("doc_id") >= 300).withColumn(
        "action", F.lit("add"))
    removes2 = documents.filter(F.col("doc_id").isin([5, 310])).withColumn(
        "action", F.lit("remove"))
    batch1.coalesce(1).write.parquet(f"{src}/b1")
    adds2.unionByName(removes2).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx = str(work / "idx")
    q = streaming.index_cdc_stream(
        spark, stream, idx, str(work / "ckpt"),
        id_col="doc_id", content_col="text", n_shards=8,
    )
    q.awaitTermination()

    # imperative twin of the SAME semantics: batch 2 deletes land first
    ref = str(work / "idx_ref")
    spimi.build_index(spark, documents.filter(F.col("doc_id") < 300), ref,
                      n_shards=8, id_col="doc_id", content_col="text")
    spimi.delete_documents(spark, [5, 310], ref)
    spimi.add_documents(spark, documents.filter(F.col("doc_id") >= 300), ref,
                        id_col="doc_id", content_col="text")

    man_a = {(r["generation"], r["shard"]): r["checksum"]
             for r in spimi.load_manifest(spark, idx).collect()}
    man_b = {(r["generation"], r["shard"]): r["checksum"]
             for r in spimi.load_manifest(spark, ref).collect()}
    assert man_a == man_b

    # semantics: doc 5 (added batch 1, removed batch 2) is gone; doc 310
    # (removed and added in the SAME batch) survives — compaction counts
    # exactly the visible docs
    compacted = str(work / "idx_compact")
    stats = spimi.compact_index(spark, idx, compacted)
    assert stats["n_docs"] == documents.count() - 1


def test_streaming_replay_is_idempotent(spark, documents, tmp_path_factory):
    """Exactly-once: the batch marker rides in the manifest commit, so
    replaying already-applied micro-batches (fresh checkpoint, same
    stream identity and batch ids) must not change the index at all."""
    import shutil

    from gazetteer_spark import streaming
    from gazetteer_spark.index import spimi

    work = tmp_path_factory.mktemp("stream_replay")
    src = str(work / "src")
    for i, (lo, hi) in enumerate([(0, 250), (250, 10**9)]):
        (documents.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.parquet(f"{src}/part{i}"))
    stream_of = lambda: (  # noqa: E731
        spark.readStream.schema(documents.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx, ckpt = str(work / "idx"), str(work / "ckpt")
    streaming.index_stream(
        spark, stream_of(), idx, ckpt, id_col="doc_id",
        content_col="text", n_shards=8,
    ).awaitTermination()
    man1 = sorted(
        (r["generation"], r["shard"], r["checksum"])
        for r in spimi.load_manifest(spark, idx).collect()
    )
    # wipe the checkpoint: the source replays every batch from 0 with the
    # same stream identity — all must be skipped via the manifest markers
    shutil.rmtree(ckpt)
    streaming.index_stream(
        spark, stream_of(), idx, ckpt, id_col="doc_id",
        content_col="text", n_shards=8,
    ).awaitTermination()
    man2 = sorted(
        (r["generation"], r["shard"], r["checksum"])
        for r in spimi.load_manifest(spark, idx).collect()
    )
    assert man1 == man2


def test_cdc_delete_heavy_distributed(spark, documents, tmp_path_factory):
    """A delete-heavy CDC batch (100k removals in one micro-batch) flows
    shard-partitioned through delete_documents_df — no driver-side id list —
    and lands byte-identical to the imperative delete."""
    from gazetteer_spark import streaming
    from gazetteer_spark.index import spimi

    work = tmp_path_factory.mktemp("stream_cdc_heavy")
    src = str(work / "src")
    batch1 = documents.withColumn("action", F.lit("add"))
    removes = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_chars"),
        F.lit("remove").alias("action"),
    )
    batch1.coalesce(1).write.parquet(f"{src}/b1")
    removes.coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx = str(work / "idx")
    streaming.index_cdc_stream(
        spark, stream, idx, str(work / "ckpt"),
        id_col="doc_id", content_col="text", n_shards=8,
    ).awaitTermination()

    ref = str(work / "idx_ref")
    spimi.build_index(spark, documents, ref, n_shards=8,
                      id_col="doc_id", content_col="text")
    spimi.delete_documents_df(
        spark, spark.range(100_000).select(F.col("id").alias("docid")), ref
    )
    man_a = {(r["generation"], r["shard"]): r["checksum"]
             for r in spimi.load_manifest(spark, idx).collect()}
    man_b = {(r["generation"], r["shard"]): r["checksum"]
             for r in spimi.load_manifest(spark, ref).collect()}
    assert man_a == man_b
    # every document is tombstoned → compaction refuses an empty commit
    import pytest

    with pytest.raises(ValueError, match="empty index"):
        spimi.compact_index(spark, idx, str(work / "idx_compact"))


def test_apply_in_pandas_with_state_counts(spark, sf_dir, tmp_path_factory):
    """Custom stateful operator (applyInPandasWithState): cumulative per-user
    counts across micro-batches; final state equals the batch answer."""
    from gazetteer_spark import streaming

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = streaming.running_user_counts(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_state")))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM running_counts GROUP BY user_id"
    ).collect()
    got = {(r["user_id"], r["n"]) for r in rows}
    want = {(r["user_id"], r["n"])
            for r in batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and got


def test_stream_stateful_latest_wins(spark, sf_dir):
    """Latest-event-per-user maintained incrementally via streaming dedup
    ordering — checked against the batch window answer."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("latest_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["event_id"])
           for r in spark.sql("SELECT * FROM latest_out").collect()}
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = {
        (r["user_id"], r["event_id"])
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want


def test_streaming_fielded_ingest_matches_batch(spark, documents,
                                                tmp_path_factory):
    """index_stream(fields=...) maintains a FIELDED index: 2 micro-batches →
    2 committed generations; BM25F top-k over the streamed index is
    rank-identical to a one-shot fielded build (and therefore to the exact
    corpus-scan scorer)."""
    from gazetteer_spark import fielded, streaming
    from gazetteer_spark.index import spimi

    fields = {"body": "text", "src": "source"}
    boosts = {"body": 1.0, "src": 2.0}
    queries = [(0, "spark join src13"), (1, "customer filter")]

    work = tmp_path_factory.mktemp("stream_fielded")
    src = str(work / "src")
    for i, (lo, hi) in enumerate([(0, 250), (250, 10**9)]):
        (documents.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}"))
    stream = (
        spark.readStream.schema(documents.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx = str(work / "fidx")
    q = streaming.index_stream(
        spark, stream, idx, str(work / "ckpt"),
        id_col="doc_id", n_shards=8, fields=fields, positions=True,
    )
    q.awaitTermination()

    assert len(spimi.committed_generations(idx)) == 2

    ref = str(work / "fidx_batch")
    fielded.build_fielded_index(spark, documents, ref, fields, n_shards=8,
                                id_col="doc_id", positions=True)
    got = fielded.fielded_topk(spark, idx, queries, boosts=boosts, k=10) \
        .orderBy("query_id", "rank").collect()
    want = fielded.fielded_topk(spark, ref, queries, boosts=boosts, k=10) \
        .orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got

    # positions=True streamed through both generations: phrase-within-field
    # over the STREAMED index equals the one-shot positional build
    gp = {(r["docid"], r["n_occurrences"]) for r in
          fielded.fielded_phrase_match(spark, idx, "body",
                                       "key order").collect()}
    wp = {(r["docid"], r["n_occurrences"]) for r in
          fielded.fielded_phrase_match(spark, ref, "body",
                                       "key order").collect()}
    assert gp == wp and gp


def test_streaming_cdc_fielded(spark, documents, tmp_path_factory):
    """CDC over a FIELDED index: adds become fielded generations, removes
    tombstone; BM25F results equal the imperative sequence."""
    from gazetteer_spark import fielded, streaming
    from gazetteer_spark.index import spimi

    fields = {"body": "text", "src": "source"}
    queries = [(0, "spark join src13")]
    work = tmp_path_factory.mktemp("stream_cdc_fielded")
    src = str(work / "src")
    b1 = documents.filter(F.col("doc_id") < 300).withColumn(
        "action", F.lit("add"))
    b2 = (documents.filter(F.col("doc_id") >= 300)
          .withColumn("action", F.lit("add"))
          .unionByName(documents.filter(F.col("doc_id").isin([5, 310]))
                       .withColumn("action", F.lit("remove"))))
    b1.coalesce(1).write.parquet(f"{src}/b1")
    b2.coalesce(1).write.parquet(f"{src}/b2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    idx = str(work / "fidx")
    q = streaming.index_cdc_stream(
        spark, stream, idx, str(work / "ckpt"),
        id_col="doc_id", n_shards=8, fields=fields,
    )
    q.awaitTermination()

    ref = str(work / "fidx_ref")
    fielded.build_fielded_index(
        spark, documents.filter(F.col("doc_id") < 300), ref, fields,
        n_shards=8, id_col="doc_id")
    spimi.delete_documents(spark, [5, 310], ref)
    fielded.add_fielded_documents(
        spark, documents.filter(F.col("doc_id") >= 300), ref, fields,
        id_col="doc_id")
    got = fielded.fielded_topk(spark, idx, queries, k=10) \
        .orderBy("query_id", "rank").collect()
    want = fielded.fielded_topk(spark, ref, queries, k=10) \
        .orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got


def test_streaming_checkpoint_reuse_with_new_data_detected(
    spark, documents, tmp_path_factory
):
    """A NEW logical stream reusing an OLD checkpoint path with different
    data must fail loudly, not skip silently: every committed batch marker
    records a content fingerprint, and a would-be replay skip whose
    incoming fingerprint differs raises. (The identical-replay twin —
    checkpoint wiped, SAME source — must still converge silently:
    test_streaming_replay_is_idempotent.) Re-ingesting under a fresh
    identity instead would duplicate postings and corrupt df/idf, so the
    engine refuses and names the remediation."""
    import shutil

    import pytest

    from gazetteer_spark import streaming
    from gazetteer_spark.index import spimi

    work = tmp_path_factory.mktemp("stream_fp")
    src1, src2 = str(work / "src1"), str(work / "src2")
    (documents.filter(F.col("doc_id") < 200)
     .coalesce(1).write.parquet(f"{src1}/b0"))
    (documents.filter(F.col("doc_id") >= 200)
     .coalesce(1).write.parquet(f"{src2}/b0"))
    idx, ckpt = str(work / "idx"), str(work / "ckpt")

    def run(src):
        stream = (
            spark.readStream.schema(documents.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return streaming.index_stream(
            spark, stream, idx, ckpt,
            id_col="doc_id", content_col="text", n_shards=4,
        )

    run(src1).awaitTermination()
    man1 = sorted(
        (r["generation"], r["shard"], r["checksum"])
        for r in spimi.load_manifest(spark, idx).collect()
    )
    # operator mistake: delete the checkpoint, point a DIFFERENT source at
    # the same path+index — its batch 0 collides with the committed batch 0
    shutil.rmtree(ckpt)
    with pytest.raises(Exception, match="fingerprint"):
        run(src2).awaitTermination()
    man2 = sorted(
        (r["generation"], r["shard"], r["checksum"])
        for r in spimi.load_manifest(spark, idx).collect()
    )
    assert man1 == man2  # nothing from the mismatched batch was committed
