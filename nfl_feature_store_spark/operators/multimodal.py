"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, partition sizing, UDF signatures, batch
shapes) is real and tested; the actual codec work is STUBBED behind
``decode_stub`` because the sandbox image has no image/audio libraries —
swap ``_fake_decode`` for PIL/torchaudio/ffmpeg in production. The batch
contract is the part that matters at 100 TB: media bytes never pass through
Python row-at-a-time, only as Arrow buffers, and per-batch bytes are bounded
at execution time by the session's
``spark.sql.execution.arrow.maxBytesPerBatch`` (see extract_media_features).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 1000, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes.

    Stands in for an ingested corpus so the plumbing is testable end-to-end.
    """
    df = spark.range(0, n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.abs(F.xxhash64("id", F.lit(seed))) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.repeat(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))), 1, 16), 4)).alias(
            "payload"
        ),
        F.lit("application/octet-stream").alias("mime"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1920 + 16).cast("int").alias("width"),
        (F.abs(F.xxhash64("id", F.lit(2))) % 1080 + 16).cast("int").alias("height"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 60000).cast("int").alias("duration_ms"),
    )
    return df


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a FEATURE_DIM
    float vector from the payload bytes. Replace with a real codec call
    (``raise NotImplementedError`` path below guards misuse)."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype="float32")
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(FEATURE_DIM / max(len(arr), 1)))
    vec = np.tile(arr, reps)[:FEATURE_DIM].astype("float32")
    return vec / 255.0


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    return _fake_decode(payload)


def extract_media_features(
    media: DataFrame,
    emit_batch_rows: bool = False,
) -> DataFrame:
    """media table → (media_id, kind, feature: array<float>, n_bytes).

    Arrow-batched ``mapInPandas``: each pandas batch carries the payload
    column as raw bytes; the decode runs vectorized per batch and the kernel
    streams batch-by-batch, never holding a whole partition.

    Memory contract (execution-time, round-1 fix): the bytes a worker
    materializes per batch are bounded by the SESSION conf
    ``spark.sql.execution.arrow.maxBytesPerBatch`` (Spark 4 default 64 MB),
    which the JVM-side ArrowWriter enforces when the plan EXECUTES — unlike a
    records-per-batch conf toggled around this (lazy) transformation, which
    would be restored before any task runs and so never take effect. Size the
    session conf to the worker budget at session build time; do not mutate it
    around individual queries.

    ``emit_batch_rows=True`` appends a ``batch_rows`` column recording the
    size of the Arrow batch each row arrived in — observability for tests
    that pin the batch-bound contract.
    """
    fields = [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
    if emit_batch_rows:
        fields.append(T.StructField("batch_rows", T.IntegerType(), False))
    out_schema = T.StructType(fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # stream batch-by-batch: never holds the partition
            feats = [decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )
            if emit_batch_rows:
                out["batch_rows"] = len(pdf)
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the explode is pure column algebra; actual frame extraction is the
    decode stub's job downstream."""
    n_frames = F.least(
        F.ceil(F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(max_frames)
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
            "payload",
        )
    )
