"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over mapInPandas.

The decode step is gated on an OPTIONAL PIL import: `real_decode=True`
decodes actual pixels when PIL is importable and raises
NotImplementedError when it is not (this container has no image libs);
the deterministic fake stays the default/oracle behavior either way. The
Spark-side plumbing is real and tested regardless: binary schema,
partition-friendly batch iteration, Arrow transfer, stable output schema.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["to_binary_table", "decode_features", "resize_images",
           "sample_frames", "MEDIA_SCHEMA"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("content", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]), True),
])


def to_binary_table(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "text",
                    modality: str = "image") -> DataFrame:
    """Build a media table with an opaque binary content column (here the
    payload is encoded text standing in for real image bytes — the
    pipeline downstream treats it as opaque either way)."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(modality).alias("modality"),
        content.alias("content"),
        F.struct(
            F.length(content).cast("bigint").alias("n_bytes"),
            F.lit(f"application/x-fake-{modality}").alias("mime"),
            F.pmod(F.col(id_col), F.lit(640)).cast("int").alias("width"),
            F.pmod(F.col(id_col), F.lit(480)).cast("int").alias("height"),
        ).alias("meta"))


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder. Component
    k is the first 4 md5 bytes of (content || byte(65+k)) scaled to
    [0, 1) — pure md5 arithmetic, so unlike an RNG-seeded fake the
    VALUES are replayable in any engine with md5 (the q82 oracle
    recomputes them in SQL) while still exercising the same Arrow batch
    shape a learned encoder would."""
    vals = [
        int.from_bytes(hashlib.md5(content + bytes([65 + k])).digest()[:4],
                       "big") / 4294967296.0
        for k in range(dim)
    ]
    return np.asarray(vals, dtype="float32")


def _pil_feature(content: bytes, dim: int) -> np.ndarray:
    """Real decode path (only reachable when PIL imports): decode the
    image bytes, grayscale, resize to a dim x 1 strip, and emit the
    normalized pixel row as the feature — a stand-in visual signature
    computed from ACTUAL pixel data, exercising the same batch shape a
    learned encoder would."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(content)) as im:
        strip = im.convert("L").resize((dim, 1))
        return (np.asarray(strip, dtype="float32").reshape(-1) / 255.0)


def decode_features(media_df: DataFrame, dim: int = 16,
                    real_decode: bool = False) -> DataFrame:
    """Per-item feature extraction over mapInPandas: batches arrive as
    Arrow-backed pandas DataFrames per partition — the exact shape a GPU
    encoder wants (batched, partition-local, no shuffle).

    real_decode=True decodes with PIL when it is importable (executors
    need PIL installed too on a real cluster — local mode shares the
    driver env) and raises NotImplementedError when it is not, so the
    deterministic fake stays the default/oracle behavior either way."""
    if real_decode:
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real_decode=True needs PIL, which is not importable in "
                "this environment; deterministic fake features are the "
                "default") from exc

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ])

    feature_fn = _pil_feature if real_decode else _fake_feature

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                feature_fn(bytes(c), dim).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                "feature": feats,
            })

    return media_df.mapInPandas(extract, out_schema)


def resize_images(media_df: DataFrame, width: int = 224,
                  height: int = 224) -> DataFrame:
    """Resize stub: passes content through (a real implementation decodes,
    resizes, re-encodes inside the same mapInPandas batch loop); the meta
    struct is updated for downstream schema correctness."""
    return media_df.withColumn(
        "meta",
        F.struct(F.col("meta.n_bytes").alias("n_bytes"),
                 F.col("meta.mime").alias("mime"),
                 F.lit(width).alias("width"),
                 F.lit(height).alias("height")))


def sample_frames(media_df: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' content: deterministic byte-stride
    sampling standing in for ffmpeg keyframe extraction. One output row
    per sampled frame; wholly JVM-side (substring on binary)."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(max_frames - 1))).alias("frame_no")
    offset = F.col("frame_no") * every_n_bytes
    return (media_df.select("media_id", idx, F.col("content"),
                            F.col("meta.n_bytes").alias("n_bytes"))
            .filter(offset < F.col("n_bytes"))
            .select("media_id", "frame_no",
                    F.substring(F.col("content"), offset + 1, every_n_bytes)
                     .alias("frame_bytes")))
