"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over mapInPandas.

The decode step decodes ACTUAL pixels for PPM/PGM and uncompressed BMP
in pure Python (no image library needed), falls through to an OPTIONAL
PIL import for every other format, and raises NotImplementedError when
neither applies (this container has no image libs); the deterministic
fake stays the default/oracle behavior either way. The
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
           "sample_frames", "decode_pixels", "MEDIA_SCHEMA"]

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


def _parse_ppm(content: bytes) -> np.ndarray:
    """Pure-Python decode of binary PPM/PGM (P6/P5, maxval <= 255) to an
    H x W x 3 uint8 array — the minimal real-pixel format, so the
    real-decode branch is testable in image-library-free containers."""
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header fields
        while pos < len(content) and content[pos:pos + 1].isspace():
            pos += 1
        if content[pos:pos + 1] == b"#":
            pos = content.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(content) and not content[end:end + 1].isspace():
            end += 1
        fields.append(int(content[pos:end]))
        pos = end
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    pos += 1  # single whitespace byte after maxval
    ch = 3 if content[:2] == b"P6" else 1
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * ch,
                       offset=pos).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px


def _parse_bmp(content: bytes) -> np.ndarray:
    """Pure-Python decode of uncompressed 24/32-bit BI_RGB BMP
    (BITMAPINFOHEADER, bottom-up or top-down) to H x W x 3 uint8."""
    import struct

    off = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    comp = struct.unpack_from("<I", content, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP (got bpp={bpp}, "
            f"compression={comp})")
    top_down, h = h < 0, abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(content, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = rows[:, :w * nb].reshape(h, w, nb)[:, :, :3][:, :, ::-1]  # BGR
    return px if top_down else px[::-1]


def decode_pixels(content: bytes) -> np.ndarray:
    """Decode image bytes to an H x W x 3 uint8 array: PPM/PGM and
    uncompressed BMP decode in pure Python (works in this container);
    any other format falls through to PIL when importable, else raises
    NotImplementedError naming the format."""
    if content[:2] in (b"P6", b"P5"):
        return _parse_ppm(content)
    if content[:2] == b"BM":
        return _parse_bmp(content)
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            f"format {content[:2]!r} needs PIL, which is not importable "
            "in this environment (PPM/PGM/BMP decode in pure Python)"
        ) from exc
    with Image.open(BytesIO(content)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _real_feature(content: bytes, dim: int) -> np.ndarray:
    """Real decode path: decode ACTUAL pixels (pure-Python PPM/BMP, or
    PIL for other formats), Rec.601 grayscale, area-average the columns
    into a dim x 1 strip, emit the normalized row — a visual signature
    computed from real pixel data through the same Arrow batch shape a
    learned encoder would use. Deterministic: integer source pixels,
    fixed float64 reduction order, no resampling-library dependence."""
    px = decode_pixels(content).astype("float64")
    gray = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
            + 0.114 * px[:, :, 2])
    w = gray.shape[1]
    # PAA buckets over columns: bucket j = cols [j*w//dim, (j+1)*w//dim)
    # (nonempty when w >= dim; when w < dim a bucket repeats the single
    # column at its scaled position)
    out = np.empty(dim, dtype="float64")
    for j in range(dim):
        lo, hi = (j * w) // dim, ((j + 1) * w) // dim
        if hi <= lo:
            lo, hi = min(lo, w - 1), min(lo, w - 1) + 1
        out[j] = gray[:, lo:hi].mean()
    return (out / 255.0).astype("float32")


def decode_features(media_df: DataFrame, dim: int = 16,
                    real_decode: bool = False) -> DataFrame:
    """Per-item feature extraction over mapInPandas: batches arrive as
    Arrow-backed pandas DataFrames per partition — the exact shape a GPU
    encoder wants (batched, partition-local, no shuffle).

    real_decode=True decodes ACTUAL pixels: PPM/PGM and uncompressed
    BMP decode in pure Python (no image library needed — testable in
    this container), other formats through PIL when importable
    (executors need PIL installed too on a real cluster — local mode
    shares the driver env); an unsupported format raises
    NotImplementedError FROM THE TASK naming the format. The
    deterministic fake stays the default/oracle behavior either way."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ])

    feature_fn = _real_feature if real_decode else _fake_feature

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


def encode_wav_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """Pure-Python RIFF/WAVE writer for mono 16-bit PCM — the encoder
    half of the audio plumbing (no audio library in this container;
    the RIFF container format is trivial struct packing). Used by
    tests/gates to synthesize real WAV blobs the decoder then parses
    back — the audio analogue of the PPM/BMP real-pixel path."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1,
                                   sample_rate, sample_rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(content: bytes):
    """Pure-Python RIFF/WAVE reader: walks the chunk list (not a fixed
    44-byte offset — WAVs may carry LIST/fact chunks), accepts mono
    16-bit PCM, returns (sample_rate, int16 ndarray). Anything else
    (compressed codecs, multi-channel, floats) raises
    NotImplementedError naming the blocker — same contract as
    `decode_pixels` for images."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    pos, rate, bits, chans, fmt = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt, chans, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            if fmt != 1 or bits != 16 or chans != 1:
                raise NotImplementedError(
                    f"only mono PCM16 decodes (fmt={fmt}, "
                    f"bits={bits}, channels={chans})")
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise NotImplementedError("no data chunk found")


def audio_features(media_df: DataFrame, id_col: str = "media_id",
                   content_col: str = "content") -> DataFrame:
    """Per-clip audio summary over the Arrow mapInPandas path (the
    batch shape a real featurizer would use): decode each WAV blob
    with `decode_wav`, emit sample count/rate, RMS level and the
    zero-crossing count — the triage features (silence? clipping?
    speech-band activity?) an audio-corpus intake computes before any
    model runs.

    Exactness: RMS = sqrt(sum(s^2)/n) folds EXACT int64 squares in
    numpy (per-clip, no cross-row float accumulation), one sqrt +
    round 6; zero-crossings compare sign bits — all integer. The
    whole op is partition-local (no shuffle). Output: (media_id,
    sample_rate, n_samples, rms, zero_crossings)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math as _m

        for pdf in batches:
            rows = {"media_id": [], "sample_rate": [], "n_samples": [],
                    "rms": [], "zero_crossings": []}
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                rate, s = decode_wav(bytes(c))
                n = int(s.size)
                sq = int((s.astype("int64") ** 2).sum())
                rms = _m.floor(_m.sqrt(sq / n) * 1e6 + 0.5) / 1e6 \
                    if n else None
                neg = s < 0
                zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(int(rate))
                rows["n_samples"].append(n)
                rows["rms"].append(rms)
                rows["zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(extract, out_schema)


def encode_ppm_p6(pixels) -> bytes:
    """Pure-Python binary PPM (P6, maxval 255) writer — the image
    sibling of `encode_wav_pcm16`: header + raw RGB bytes, nothing
    else, so `decode_pixels` round-trips it bit-exactly. ``pixels``
    is an H x W x 3 uint8 array."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("expected H x W x 3 RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def image_dhash(media_df: DataFrame, id_col: str = "media_id",
                content_col: str = "content",
                cols: int = 9, rows: int = 7) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels —
    the image near-dup fingerprint (resize-, brightness-offset-, and
    format-invariant up to Hamming distance): decode (pure-Python
    PPM/PGM/BMP), integer luma gray = (299R + 587G + 114B) // 1000,
    NEAREST-sample a ``cols`` x ``rows`` grid (sx = x*W // cols,
    sy = y*H // rows — integer division, no interpolation, so the
    hash is exactly replayable from a pixel formula), then one bit
    per horizontally-adjacent comparison: bit(y,x) = gray[y,x+1] >
    gray[y,x], packed little-endian into a BIGINT. Default 9x7 grid
    -> 56 bits, fitting signed int64 exactly (cross-engine-safe —
    the classic 9x8/64-bit variant overflows BIGINT).

    Every step is integer arithmetic on uint8 pixels: deterministic
    across hosts, partitionings, and engines. Pair near-dups with the
    SimHash banding machinery (dedup.simhash_pairs' contract) or any
    Hamming join. Output: (media_id, w, h, dhash). mapInPandas
    per-image, no shuffle — embarrassingly parallel at any corpus
    size."""
    if (cols - 1) * rows > 63:
        raise ValueError("grid packs more than 63 bits")
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("w", T.LongType(), False),
        T.StructField("h", T.LongType(), False),
        T.StructField("dhash", T.LongType(), False),
    ])

    def extract(batches):
        for pdf in batches:
            out = {"media_id": [], "w": [], "h": [], "dhash": []}
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                px = decode_pixels(bytes(c)).astype(np.int64)
                hh, ww = px.shape[0], px.shape[1]
                gray = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                        + 114 * px[:, :, 2]) // 1000
                sx = [(x * ww) // cols for x in range(cols)]
                sy = [(y * hh) // rows for y in range(rows)]
                sub = gray[np.ix_(sy, sx)]
                bits = sub[:, 1:] > sub[:, :-1]          # rows x cols-1
                hv = 0
                for y in range(rows):
                    for x in range(cols - 1):
                        if bits[y, x]:
                            hv |= 1 << (y * (cols - 1) + x)
                out["media_id"].append(int(mid))
                out["w"].append(ww)
                out["h"].append(hh)
                out["dhash"].append(hv)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(extract, out_schema)
