"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque `binary` columns + typed metadata struct; all
transforms run as Arrow-batched `mapInPandas` so each task processes
columnar batches without JVM<->Python per-row cost. The actual codec work
(decode/resize/frame-sample) needs PIL/ffmpeg etc. which are NOT in this
container — those kernels are stubbed deterministically (env-gated), while
the Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is real and tested.

Scale notes: media rows are large — `repartition` by id before mapInPandas
so batches stay under the Arrow batch target, and keep
spark.sql.execution.arrow.maxRecordsPerBatch modest (e.g. 64) for >MB
payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_kernel(payload: bytes, kind: str) -> list[float]:
    """STUB: real implementation decodes the media and extracts features
    (PIL/torchvision for images, torchaudio/ffmpeg for audio/video — not
    available in this container). The deterministic fake derives an
    8-float vector from the payload digest so pipelines are testable
    end-to-end with stable outputs."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(df: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """payload -> (size, content hash, feature vector) via mapInPandas.

    The per-batch loop is vectorized where it can be (sizes, hashes) and
    delegates per-item work to the decode kernel; swapping the stub for a
    real codec does not change the Spark plan."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "content_hash": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [
                        _decode_kernel(p, k)
                        for p, k in zip(payloads, pdf["kind"])
                    ],
                }
            )

    from .scale import spread_small_input

    # adaptive widening only — media payloads are the most expensive bytes
    # to shuffle, so a wide input must NOT pay a repartition for this
    return (
        spread_small_input(df, F.col("media_id"))
        .select("media_id", "kind", "payload")
        .mapInPandas(op, schema=FEATURE_SCHEMA)
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB surface for image resize: raises until a codec is installed;
    the signature/schema is the stable contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize needs PIL/opencv (not in this container); "
            "plug the kernel into extract_features-style mapInPandas"
        )

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def _frame_kernel(payload: bytes, ts_ms: int, duration_ms: int) -> bytes:
    """STUB: the real kernel seeks to `ts_ms` and decodes one frame
    (ffmpeg/pyav — not in this container). The deterministic fake slices a
    64-byte window whose offset is proportional to ts/duration, so outputs
    are stable, distinct per timestamp, and pipeline-testable."""
    if not payload:
        return b""
    off = int((ts_ms / max(1, duration_ms)) * max(0, len(payload) - 64))
    return payload[off : off + 64]


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform temporal frame sampling for video rows: one output row per
    (video, frame), timestamps at the midpoints of `n_frames` equal spans
    (ts_i = (i + 0.5)/n * duration — the standard uniform clip-sampling
    policy). The sampling policy, video filter, per-frame fan-out, Arrow
    batching, and output schema are real; only the decode-at-timestamp
    kernel is stubbed (`_frame_kernel`). Swapping in a real codec does not
    change the Spark plan.

    Scale: output is n_frames× the video row count but each frame row is
    small; a NARROW input is widened by media_id so one video's frames stay
    in one task — wide inputs are untouched (payload bytes never shuffle
    for nothing; see scale.spread_small_input)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [], "frame": [],
                "frame_hash": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur) if dur is not None and dur > 0 else 1
                for i in range(n_frames):
                    ts = int((i + 0.5) * dur / n_frames)
                    frame = _frame_kernel(payload, ts, dur)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(frame)
                    out["frame_hash"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    from .scale import spread_small_input

    return (
        spread_small_input(
            df.filter(F.col("kind") == "video").select(
                "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
            ),
            F.col("media_id"),
        )
        .mapInPandas(op, schema=FRAME_SCHEMA)
    )


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as text exact dedup)."""
    return features.groupBy("content_hash").agg(
        F.min("media_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
