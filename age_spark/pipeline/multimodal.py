"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contract, Arrow-batched
``mapInPandas`` kernels, partition sizing — while the actual media decode is
STUBBED (this container ships no image/audio libs): ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is requested.
Swapping in a real decoder (PIL/torchaudio/ffmpeg) changes ONE function
body; the distributed plumbing (batch shape, schema, memory ceiling via
``maxRecordsPerBatch``) is already exercised by tests.

Column contract:
    media: STRUCT<content: BINARY, meta: STRUCT<mime STRING, width INT,
           height INT, n_frames INT, sample_rate INT>>
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media column derived from text bytes — stands
    in for reading real blobs (e.g. from object-store parquet with a binary
    column)."""
    content = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


def decode_image(content: bytes):  # pragma: no cover - real decoder slot
    """Real image decode — NOT available in this environment."""
    raise NotImplementedError(
        "image decoding requires an image library (e.g. PIL); "
        "use fake=True for the deterministic stand-in"
    )


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: byte-histogram moments."""
    if content is None:
        return [0.0] * dim
    out = []
    n = len(content) or 1
    for i in range(dim):
        bucket = [b for j, b in enumerate(content) if j % dim == i]
        out.append(round(sum(bucket) / (255.0 * (len(bucket) or 1)), 6))
    return out


def extract_features(
    df: DataFrame, media_col: str = "media", fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas so each Python worker sees pandas batches (vectorizable by a
    real decoder); output schema = input fields + features array<double>.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            feats = []
            for m in media:
                content = None if m is None else m["content"]
                if not fake:
                    decode_image(content)  # raises: no decoder in container
                feats.append(_fake_features(content, dim))
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def resize_plan(
    df: DataFrame, media_col: str = "media", width: int = 224, height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize: metadata updates JVM-side; the pixel transform itself would
    run in the same mapInPandas slot as extract_features (stubbed — no image
    lib in this container). With fake=True only the meta fields change,
    which is exactly the plumbing a real resizer needs tested: struct
    rebuild, null propagation, no shuffle."""
    if not fake:  # pragma: no cover - real decoder slot
        raise NotImplementedError("real resize requires an image library")
    m = F.col(media_col)
    new_meta = F.struct(
        m.getField("meta").getField("mime").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        m.getField("meta").getField("n_frames").alias("n_frames"),
        m.getField("meta").getField("sample_rate").alias("sample_rate"),
    )
    return df.withColumn(
        media_col, F.struct(m.getField("content").alias("content"), new_meta.alias("meta"))
    )


def attach_fake_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Audio variant of the media contract (sample_rate set, no frames)."""
    content = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("audio/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


def frame_sample_plan(df: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan*: one row per sampled frame index (JVM-side
    explode of a sequence; the decode of each frame would happen in
    extract_features). Shows the shuffle-free fan-out shape for video."""
    n_frames = F.col(f"{media_col}.meta.n_frames")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))
