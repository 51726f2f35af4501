"""Structured Streaming surface: incremental index ingest + custom state.

Two first-class streaming operators on top of the engine:

- :func:`index_stream` — continuous index maintenance: every micro-batch of
  documents becomes one committed segment GENERATION (the reference's
  `split --append` / diff lifecycle driven by a stream instead of a cron).
  foreachBatch gives exactly-once-per-batch semantics on top of the
  engine's own manifest commit point: a batch's segments only become
  visible when its manifest lands, so a crash between write and commit
  replays cleanly (rebuilding a generation is byte-identical — docids and
  ordering derive from data).
- :func:`running_user_counts` — a custom stateful operator via
  applyInPandasWithState (Arrow-batched GroupState): per-key running
  aggregates with explicit state schema, the escape hatch for stateful
  logic that watermarked built-ins can't express.

At scale: each micro-batch's build cost is the engine's normal one-shuffle
incremental add over just that batch's rows; state in the second operator
is per-key scalars managed by the HDFS/RocksDB state store.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .index import spimi


def index_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "docid",
    content_col: str = "content",
    n_shards: int = 8,
    positions: bool = False,
    analyzer: str = "default",
    **trigger_kwargs,
):
    """Start a streaming query that maintains the index at ``out_dir`` —
    one committed generation per non-empty micro-batch. Returns the
    StreamingQuery (caller awaits/stops). Default trigger: availableNow."""
    if not trigger_kwargs:
        trigger_kwargs = {"availableNow": True}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.exists(f"{out_dir}/build.json"):
            spimi.build_index(
                spark, batch_df, out_dir, n_shards=n_shards,
                id_col=id_col, content_col=content_col,
                positions=positions, analyzer=analyzer,
            )
        else:
            spimi.add_documents(
                spark, batch_df, out_dir, id_col=id_col, content_col=content_col
            )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger_kwargs)
        .start()
    )


def index_cdc_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "docid",
    content_col: str = "content",
    action_col: str = "action",
    n_shards: int = 8,
    positions: bool = False,
    analyzer: str = "default",
    **trigger_kwargs,
):
    """Change-data-capture ingest: each record carries an ``action`` column
    ('add' | 'remove') — the reference's sortupdate action rows
    (`sortupdate/SortAndUpdateTask.java:30-92`) driven by a stream.

    Per micro-batch: adds commit as a segment generation, then removals
    commit as a tombstone generation (so a doc added and removed in the
    same batch ends up deleted). Removal ids pass through the driver (the
    tombstone API takes an id list — deletes per batch are metadata-scale).
    Compaction later folds tombstones away (spimi.compact_index)."""
    if not trigger_kwargs:
        trigger_kwargs = {"availableNow": True}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        adds = batch_df.filter(F.col(action_col) == "add").drop(action_col)
        if not adds.isEmpty():
            if not os.path.exists(f"{out_dir}/build.json"):
                spimi.build_index(
                    spark, adds, out_dir, n_shards=n_shards,
                    id_col=id_col, content_col=content_col,
                    positions=positions, analyzer=analyzer,
                )
            else:
                spimi.add_documents(
                    spark, adds, out_dir, id_col=id_col, content_col=content_col
                )
        removes = [
            r[0] for r in batch_df.filter(F.col(action_col) == "remove")
            .select(id_col).distinct().collect()
        ]
        if removes and os.path.exists(f"{out_dir}/build.json"):
            spimi.delete_documents(spark, removes, out_dir)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger_kwargs)
        .start()
    )


def running_user_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming per-key running event counts via applyInPandasWithState.

    Emits (key, n_events) in UPDATE mode whenever a key receives rows; the
    count is cumulative across all micro-batches (state = one long per
    key). The latest emission per key equals the batch groupBy count."""

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
