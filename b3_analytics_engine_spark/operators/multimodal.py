"""Multimodal column plumbing for training-data pipelines.

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct. The Spark-side contract —
schema, partition-friendly batch iteration, Arrow transfer shape — is
real and tested; the actual codec work is STUBBED (`_decode_image`)
because no image/audio libraries ship in this container. Swapping the
stub for Pillow/libav is a one-function change; nothing about the
plan shape moves.

Scale design: decode/feature steps run via ``mapInPandas`` — one
Python worker per partition, Arrow batches in/out, no shuffle. The
deterministic fake "decoder" derives pixel stats from a hash of the
bytes so tests get stable values end-to-end.
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
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, sha256 string, "
    "mean_byte double, feat array<float>"
)

STUB_REAL_DECODERS = True  # flip when real codec libs are installed


def _decode_image(payload: bytes) -> list[float]:
    """STUB decode → feature vector.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``
    → resize → normalized pixel tensor. Not available in this
    container, so we derive a deterministic 8-dim fake feature from the
    byte content (keeps the full pipeline testable and reproducible).
    """
    if not STUB_REAL_DECODERS:
        raise NotImplementedError("real image decoding requires Pillow")
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + featurize media rows with mapInPandas (Arrow batches,
    partition-parallel, zero shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if b else None
                    ),
                    "feat": payloads.map(
                        lambda b: _decode_image(b) if b is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: explodes (media_id, frame_ts_ms)
    rows for each sampling point given duration metadata — the
    shuffle/partition shape of frame extraction without the codec.
    The decode of each frame would slot into extract_features."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
