"""Multimodal columns: opaque binary media + typed metadata, Spark-side
plumbing for decode / feature-extract / frame-sample stages.

The image/audio libraries are not in this container, so the DECODE step is
stubbed (NotImplementedError for real codecs; a deterministic fake parses
our synthetic container format). Everything Spark-facing is real and
tested: schema, batch iteration via mapInPandas, partitioning, and the
metadata expressions.

Synthetic container format (deterministic, built from any float-array
column): header b"GZM1" + uint8 format tag + uint16be width,height +
payload = each value rendered at 6dp, ','-joined, utf-8. Reproducible in
SQL for oracle checks (length/hash of the payload).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = {0: "fake", 1: "png", 2: "jpeg", 3: "wav"}


def synth_media(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(media_id, media binary, meta struct): deterministic fake media blobs."""
    payload = F.encode(
        F.concat_ws(
            ",", F.transform(F.col(vec_col), lambda x: F.format_string("%.6f", x))
        ),
        "utf-8",
    )
    fmt = F.pmod(F.col(id_col), F.lit(4)).cast("int")
    width = (F.pmod(F.col(id_col), F.lit(16)) + 1).cast("int") * 8
    height = (F.pmod(F.col(id_col), F.lit(9)) + 1).cast("int") * 8
    return df.select(
        F.col(id_col).alias("media_id"),
        F.concat(F.lit(b"GZM1"), payload).alias("media"),
        F.struct(
            fmt.alias("format_tag"), width.alias("width"), height.alias("height")
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, payload_sha256, format_tag): pure-JVM metadata —
    no decode needed, the cheap path that should never touch Python."""
    return media.select(
        "media_id",
        F.length("media").cast("long").alias("n_bytes"),
        F.sha2(F.expr("substring(media, 5, length(media) - 4)"), 256).alias(
            "payload_sha256"
        ),
        F.col("meta.format_tag").alias("format_tag"),
    )


def _decode_fake(buf: bytes) -> np.ndarray:
    if not buf.startswith(b"GZM1"):
        raise ValueError("bad magic")
    return np.array([float(x) for x in buf[4:].decode().split(",")], dtype=np.float32)


def decode_features(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """(media_id, n_values, mean_value, checksum): Arrow-batched decode +
    feature extraction via mapInPandas.

    ``real_codecs=True`` is the production path (PIL/ffmpeg) — STUBBED here:
    raises NotImplementedError (libs absent in this container). The fake
    decoder exercises the identical batch shape: binary in → features out.
    """
    if real_codecs:
        raise NotImplementedError(
            "image/audio codecs are not available in this container; "
            "the Spark-side plumbing below is the real, tested path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = [_decode_fake(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_values": pd.Series([len(v) for v in vals], dtype="int32"),
                    "mean_value": pd.Series(
                        [round(float(v.mean()), 6) for v in vals], dtype="float64"
                    ),
                    "checksum": [
                        hashlib.sha256(v.tobytes()).hexdigest() for v in vals
                    ],
                }
            )

    return media.select("media_id", "media").mapInPandas(
        batches, "media_id long, n_values int, mean_value double, checksum string"
    )


def embed_media(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """(media_id, embedding array<float>): media → feature vector, the
    bridge from the multimodal surface into similarity search (ANN / IVF /
    near-dup all consume this column directly).

    ``real_codecs=True`` is the production path (a vision/audio encoder) —
    STUBBED like :func:`decode_features`; the fake decoder recovers the
    synthetic payload's float vector, exercising the identical Arrow batch
    shape: binary in → array<float> out."""
    if real_codecs:
        raise NotImplementedError(
            "media encoders are not available in this container; "
            "the Spark-side plumbing below is the real, tested path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "embedding": [_decode_fake(b) for b in pdf["media"]],
                }
            )

    return media.select("media_id", "media").mapInPandas(
        batches, "media_id long, embedding array<float>"
    )


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """(media_id, frame_idx, frame binary): deterministic frame sampling —
    the payload split on ',' plays the role of a frame sequence; JVM-side
    posexplode keeps the fan-out off Python."""
    frames = F.split(
        F.decode(F.expr("substring(media, 5, length(media) - 4)"), "utf-8"), ","
    )
    return (
        media.select("media_id", F.posexplode(frames).alias("frame_idx", "frame_s"))
        .filter(F.pmod(F.col("frame_idx"), F.lit(every)) == 0)
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.encode(F.col("frame_s"), "utf-8").alias("frame"),
        )
    )
