"""Structured Streaming surface: incremental index ingest + custom state.

Two first-class streaming operators on top of the engine:

- :func:`index_stream` — continuous index maintenance: every micro-batch of
  documents becomes one committed segment GENERATION (the reference's
  `split --append` / diff lifecycle driven by a stream instead of a cron).
- :func:`index_cdc_stream` — change-data-capture ingest with per-record
  add/remove actions and generation-ordered tombstones.
- :func:`running_user_counts` — a custom stateful operator via
  applyInPandasWithState (Arrow-batched GroupState).

Exactly-once: foreachBatch alone is NOT idempotent — the engine's manifest
commit and the streaming checkpoint commit are two separate durability
points, and a crash between them replays the batch. The sinks therefore
stamp (stream_id, batch_id, batch_step) INTO the manifest commit itself
(one atomic rename — spimi._commit_manifest), and skip any batch/step the
manifest already records. Orphan segment data from a half-applied batch is
invisible (manifest-gated) and pre-cleaned by the next write at that
generation, so replays converge to exactly-once.

At scale: each micro-batch's build cost is the engine's normal one-shuffle
incremental add over just that batch's rows; CDC removals flow shard-
partitioned through delete_documents_df (never through the driver); state
in running_user_counts is per-key scalars in the state store.
"""

from __future__ import annotations

import hashlib
import logging
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .index import spimi

log = logging.getLogger(__name__)


def _stream_id(checkpoint_dir: str) -> str:
    """Stable identity of a stream = its checkpoint location (batch_ids are
    monotonically increasing per checkpoint; a NEW checkpoint writing into
    the same index restarts at 0 and must not be confused with the old).

    CAVEAT: the identity is the PATH — deleting a checkpoint and starting a
    genuinely new stream (different source) at the same path into the same
    index makes its early batch_ids look like replays and they are skipped.
    Every marker-skip is therefore logged loudly (see _warn_skip); use a
    fresh checkpoint path per logical stream."""
    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]


def _warn_skip(out_dir: str, sid: str, batch_id: int, last: int) -> None:
    log.warning(
        "index %s: stream %s batch %d skipped — manifest already records "
        "batch %d for this stream id (exactly-once replay dedup). If this "
        "is a NEW stream reusing an old checkpoint path, its data is NOT "
        "being ingested: use a fresh checkpoint location.",
        out_dir, sid, batch_id, last,
    )


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
    fields: dict[str, str] | None = None,
    **trigger_kwargs,
):
    """Start a streaming query that maintains the index at ``out_dir`` —
    one committed generation per non-empty micro-batch, exactly once (the
    batch marker rides in the manifest commit; replays are skipped).
    ``fields`` switches the sink to a FIELDED (BM25F) index — each batch
    becomes one fielded generation via the same commit protocol
    (``content_col`` is ignored in that mode; ``positions=True`` selects
    the field-local positional layout, so the streamed index also serves
    phrase/NEAR-within-field).
    Returns the StreamingQuery (caller awaits/stops). Default trigger:
    availableNow."""
    if not trigger_kwargs:
        trigger_kwargs = {"availableNow": True}
    sid = _stream_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        last, _ = spimi.last_stream_commit(out_dir, sid)
        if last is not None and batch_id <= last:
            _warn_skip(out_dir, sid, batch_id, last)
            return  # replay of an already-committed batch
        if batch_df.isEmpty():
            return
        extra = {"stream_id": sid, "batch_id": batch_id, "batch_step": "add"}
        fresh = not os.path.exists(f"{out_dir}/build.json")
        if fields is not None:
            from . import fielded

            if fresh:
                fielded.build_fielded_index(
                    spark, batch_df, out_dir, fields, n_shards=n_shards,
                    id_col=id_col, analyzer=analyzer, positions=positions,
                    manifest_extra=extra,
                )
            else:
                fielded.add_fielded_documents(
                    spark, batch_df, out_dir, fields, id_col=id_col,
                    manifest_extra=extra,
                )
        elif fresh:
            spimi.build_index(
                spark, batch_df, out_dir, n_shards=n_shards,
                id_col=id_col, content_col=content_col,
                positions=positions, analyzer=analyzer,
                manifest_extra=extra,
            )
        else:
            spimi.add_documents(
                spark, batch_df, out_dir, id_col=id_col,
                content_col=content_col, manifest_extra=extra,
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
    fields: dict[str, str] | None = None,
    **trigger_kwargs,
):
    """Change-data-capture ingest: each record carries an ``action`` column
    ('add' | 'remove') — the reference's sortupdate action rows
    (`sortupdate/SortAndUpdateTask.java:30-92`) driven by a stream.
    ``fields`` switches the add path to a FIELDED (BM25F) index; removals
    are format-agnostic tombstones either way.

    Semantics (upsert convention): within one micro-batch REMOVALS apply
    BEFORE adds, so the standard CDC upsert [remove X, add X] lands as the
    new X; tombstones are generation-ordered (codec.DelIndex), so a docid
    removed in batch N and re-added in batch N+1 is visible again. Removal
    ids flow shard-partitioned through :func:`spimi.delete_documents_df` —
    never through the driver. Each step ('del' then 'add') commits with a
    (stream_id, batch_id, batch_step) marker inside the manifest rename;
    replays skip exactly the steps already committed."""
    if not trigger_kwargs:
        trigger_kwargs = {"availableNow": True}
    sid = _stream_id(checkpoint_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        last, steps = spimi.last_stream_commit(out_dir, sid)
        if last is not None and batch_id < last:
            _warn_skip(out_dir, sid, batch_id, last)
            return
        done = steps if (last is not None and batch_id == last) else set()

        # del runs only if this batch's add step hasn't committed yet: steps
        # commit del→add, so an already-committed add means the del step
        # already ran or was skipped-by-design (index didn't exist) —
        # replaying it AFTER the add would invert the removes-first order
        if "del" not in done and "add" not in done and os.path.exists(
            f"{out_dir}/build.json"
        ):
            removes = (
                batch_df.filter(F.col(action_col) == "remove")
                .select(F.col(id_col).alias("docid")).distinct()
            )
            if not removes.isEmpty():
                spimi.delete_documents_df(
                    spark, removes, out_dir,
                    manifest_extra={"stream_id": sid, "batch_id": batch_id,
                                    "batch_step": "del"},
                )
        if "add" not in done:
            adds = batch_df.filter(F.col(action_col) == "add").drop(action_col)
            if not adds.isEmpty():
                extra = {"stream_id": sid, "batch_id": batch_id,
                         "batch_step": "add"}
                fresh = not os.path.exists(f"{out_dir}/build.json")
                if fields is not None:
                    from . import fielded

                    if fresh:
                        fielded.build_fielded_index(
                            spark, adds, out_dir, fields, n_shards=n_shards,
                            id_col=id_col, analyzer=analyzer,
                            positions=positions, manifest_extra=extra,
                        )
                    else:
                        fielded.add_fielded_documents(
                            spark, adds, out_dir, fields, id_col=id_col,
                            manifest_extra=extra,
                        )
                elif fresh:
                    spimi.build_index(
                        spark, adds, out_dir, n_shards=n_shards,
                        id_col=id_col, content_col=content_col,
                        positions=positions, analyzer=analyzer,
                        manifest_extra=extra,
                    )
                else:
                    spimi.add_documents(
                        spark, adds, out_dir, id_col=id_col,
                        content_col=content_col, manifest_extra=extra,
                    )

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
