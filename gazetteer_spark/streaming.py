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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .index import spimi

log = logging.getLogger(__name__)


def _stream_id(checkpoint_dir: str) -> str:
    """Stable identity of a stream = its checkpoint location (batch_ids are
    monotonically increasing per checkpoint; a NEW checkpoint writing into
    the same index restarts at 0 and must not be confused with the old).

    The identity is deliberately the PATH, so that losing the checkpoint
    and re-running the SAME source converges (replayed batches are skipped
    via the manifest markers — the exactly-once recovery path). The
    hazardous twin — a genuinely NEW stream reusing an old checkpoint path,
    whose early batch_ids would look like replays — is caught by CONTENT,
    not identity: each committed batch marker records an order-insensitive
    fingerprint of the batch rows (see _batch_fp), and a would-be skip
    whose incoming fingerprint differs from the recorded one raises
    instead of skipping. Silent data loss becomes a loud error; identical
    replays still converge."""
    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]


def _batch_fp(batch_df: DataFrame) -> str:
    """Order-insensitive fingerprint of a micro-batch: sum of bounded
    per-row xxhash64 over ALL columns (cast to string) plus the row count.
    Partition- and order-independent (sum is commutative), deterministic,
    and overflow-safe (each row hash is reduced mod 2^31-1 first, so the
    sum stays far below int64 for any realistic batch). One narrow
    aggregation per micro-batch — trivial next to the index build."""
    prime = (1 << 31) - 1
    cols = [F.col(c).cast("string") for c in batch_df.columns]
    row = batch_df.select(
        F.sum(F.pmod(F.xxhash64(*cols, F.lit("gz_batch_fp")),
                     F.lit(prime))).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"{int(row['s'] or 0) % prime}:{int(row['n'])}"


def _check_replay_fp(
    out_dir: str, sid: str, batch_id: int, step: str,
    fps: dict[tuple[int, str], str], batch_df: DataFrame,
) -> None:
    """A batch is about to be skipped as an exactly-once replay — verify it
    IS one. Raises if the recorded fingerprint for (batch_id, step) exists
    and differs from the incoming batch's: that means a NEW stream is
    reusing an old checkpoint path and its data would be silently dropped.
    Markers from before fingerprints existed (no fp recorded) skip with
    the warning only, as before."""
    expected = fps.get((batch_id, step), "")
    if not expected:
        return
    actual = _batch_fp(batch_df)
    if actual != expected:
        raise ValueError(
            f"index {out_dir}: stream {sid} batch {batch_id} looks like a "
            f"replay (manifest already records step {step!r}) but its "
            f"content fingerprint {actual} differs from the committed "
            f"{expected}. A NEW stream is reusing an old checkpoint path — "
            "its data would be silently dropped. Use a fresh checkpoint "
            "location (and a fresh index, or CDC upserts) for a new "
            "logical stream."
        )


# (out_dir, stream_id) pairs that already produced a WARNING-level skip
# message — replays of already-committed batches are the NORMAL exactly-once
# recovery path after a restart, so repeats drop to INFO to keep the one
# genuinely suspicious case (first skip seen for a stream) loud.
_WARNED_SKIPS: set[tuple[str, str]] = set()


def _warn_skip(out_dir: str, sid: str, batch_id: int, last: int) -> None:
    key = (out_dir, sid)
    level = logging.INFO if key in _WARNED_SKIPS else logging.WARNING
    _WARNED_SKIPS.add(key)
    log.log(
        level,
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
    doclens: bool = False,
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
        last, _, fps = spimi.last_stream_commit(out_dir, sid)
        if last is not None and batch_id <= last:
            # replay of an already-committed batch — but verify it IS one
            # (raises if a new stream is reusing this checkpoint path)
            _check_replay_fp(out_dir, sid, batch_id, "add", fps, batch_df)
            _warn_skip(out_dir, sid, batch_id, last)
            return
        if batch_df.isEmpty():
            return
        extra = {"stream_id": sid, "batch_id": batch_id,
                 "batch_step": "add", "batch_fp": _batch_fp(batch_df)}
        fresh = not os.path.exists(f"{out_dir}/build.json")
        if fields is not None:
            from . import fielded

            if fresh:
                fielded.build_fielded_index(
                    spark, batch_df, out_dir, fields, n_shards=n_shards,
                    id_col=id_col, analyzer=analyzer, positions=positions,
                    manifest_extra=extra, doclens=doclens,
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
                manifest_extra=extra, doclens=doclens,
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
    doclens: bool = False,
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

        last, steps, fps = spimi.last_stream_commit(out_dir, sid)

        def verify_replay(candidate_steps):
            # both steps record the SAME whole-batch fingerprint; checking
            # the first recorded one suffices (raises on mismatch)
            for st in candidate_steps:
                if (batch_id, st) in fps:
                    _check_replay_fp(out_dir, sid, batch_id, st, fps,
                                     batch_df)
                    return

        if last is not None and batch_id < last:
            verify_replay(("add", "del"))
            _warn_skip(out_dir, sid, batch_id, last)
            return
        done = steps if (last is not None and batch_id == last) else set()
        if done:
            verify_replay([st for st in ("add", "del") if st in done])
        fp = _batch_fp(batch_df) if ("add" not in done or "del" not in done) \
            else ""

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
                                    "batch_step": "del", "batch_fp": fp},
                )
        if "add" not in done:
            adds = batch_df.filter(F.col(action_col) == "add").drop(action_col)
            if not adds.isEmpty():
                extra = {"stream_id": sid, "batch_id": batch_id,
                         "batch_step": "add", "batch_fp": fp}
                fresh = not os.path.exists(f"{out_dir}/build.json")
                if fields is not None:
                    from . import fielded

                    if fresh:
                        fielded.build_fielded_index(
                            spark, adds, out_dir, fields, n_shards=n_shards,
                            id_col=id_col, analyzer=analyzer,
                            positions=positions, manifest_extra=extra,
                            doclens=doclens,
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
                        manifest_extra=extra, doclens=doclens,
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
