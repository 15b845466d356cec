"""Unit tests for the multimodal binary-column plumbing — the Spark-side
contract (schema, Arrow batch shape, determinism, frame-stride math) that
the q50-q52 driver gates exercise end-to-end. The decode itself is the
documented stub (no image libs in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions import multimodal


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload-{i:03d}-" + "x" * (i % 200)) for i in range(40)],
        "doc_id long, text string")
    return multimodal.to_binary_table(docs)


def test_media_schema_and_meta(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "modality", "content", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    rows = media.orderBy("media_id").collect()
    assert len(rows) == 40
    for r in rows:
        assert r.meta.n_bytes == len(r.content)
        assert r.meta.mime == "application/x-fake-image"


def test_decode_features_batched_and_deterministic(media):
    out = multimodal.decode_features(media, dim=16)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 40
    for r in rows.values():
        assert len(r.feature) == 16
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # deterministic: same content -> identical features on a second run
    again = {r.media_id: r.feature
             for r in multimodal.decode_features(media, dim=16).collect()}
    assert all(again[i] == rows[i].feature for i in rows)
    # identical payloads produce identical features (content-keyed)
    dup = multimodal.to_binary_table(
        media.sparkSession.createDataFrame(
            [(1, "same"), (2, "same")], "doc_id long, text string"))
    f = [r.feature for r in multimodal.decode_features(dup, dim=8).collect()]
    assert f[0] == f[1]


def _ppm(w, h, rgb_rows):
    """Binary P6 bytes from a list of rows of (r, g, b) tuples."""
    body = bytes(c for row in rgb_rows for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def _bmp24(w, h, rgb_rows):
    """Uncompressed 24-bit bottom-up BI_RGB BMP bytes."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rgb_rows):  # bottom-up storage
        raw = bytes(c for (r, g, b) in row for c in (b, g, r))  # BGR
        body += raw + b"\x00" * (stride - len(raw))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(body), 2835, 2835, 0, 0))
    return hdr + body


def test_real_decode_ppm_bmp_through_spark(media):
    """The REAL-pixel branch end-to-end through the mapInPandas Arrow
    path: constant-shade PPM and BMP images decode to shade/255 in
    every strip bucket — actual pixel data, no image library needed."""
    spark = media.sparkSession
    shade = [[(128, 128, 128)] * 4] * 4   # 4x4 mid-gray
    ramp = [[(0, 0, 0), (0, 0, 0), (255, 255, 255), (255, 255, 255)]] * 2
    imgs = spark.createDataFrame(
        [(1, "image", _ppm(4, 4, shade), None),
         (2, "image", _bmp24(4, 4, shade), None),
         (3, "image", _ppm(4, 2, ramp), None),
         (4, "image", _bmp24(4, 2, ramp), None)],
        multimodal.MEDIA_SCHEMA)
    rows = {r.media_id: r.feature
            for r in multimodal.decode_features(
                imgs, dim=4, real_decode=True).collect()}
    g = round(128 / 255.0, 6)
    assert [round(x, 6) for x in rows[1]] == [g] * 4
    # BMP of the same pixels decodes to the identical feature
    assert rows[2] == rows[1]
    # left half black, right half white, in both formats
    assert [round(x, 6) for x in rows[3]] == [0.0, 0.0, 1.0, 1.0]
    assert rows[4] == rows[3]


def test_real_decode_unknown_format_gated_on_pil(media):
    """Non-PPM/BMP content goes through PIL when importable; without
    PIL the task raises NotImplementedError naming the format — this
    covers whichever import state the environment has."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        # the fake-text payloads are not PPM/BMP -> task-side raise
        with pytest.raises(Exception, match="NotImplementedError|PIL"):
            multimodal.decode_features(media, real_decode=True).collect()
        return
    # PIL present: build real 4x4 PNGs in-memory and decode actual pixels
    import io

    from PIL import Image

    def png(shade):
        im = Image.new("L", (4, 4), color=shade)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return buf.getvalue()

    spark = media.sparkSession
    imgs = spark.createDataFrame(
        [(1, "image", png(0), None), (2, "image", png(255), None)],
        multimodal.MEDIA_SCHEMA)
    rows = {r.media_id: r.feature
            for r in multimodal.decode_features(
                imgs, dim=4, real_decode=True).collect()}
    assert [round(x, 6) for x in rows[1]] == [0.0] * 4
    assert [round(x, 6) for x in rows[2]] == [1.0] * 4


def test_resize_updates_meta_only(media):
    out = multimodal.resize_images(media, width=64, height=32)
    r = out.filter(F.col("media_id") == 3).collect()[0]
    assert (r.meta.width, r.meta.height) == (64, 32)
    orig = media.filter(F.col("media_id") == 3).collect()[0]
    assert bytes(r.content) == bytes(orig.content)


def test_sample_frames_stride_math(media):
    stride, max_frames = 64, 8
    out = multimodal.sample_frames(media, every_n_bytes=stride,
                                   max_frames=max_frames)
    sizes = {r.media_id: r.meta.n_bytes for r in media.collect()}
    got = {}
    for r in out.collect():
        got.setdefault(r.media_id, []).append(r)
    for mid, nb in sizes.items():
        want_frames = min(max_frames, -(-nb // stride))
        frames = got.get(mid, [])
        assert len(frames) == want_frames, (mid, nb)
        for fr in frames:
            lo = fr.frame_no * stride
            assert 1 <= len(bytes(fr.frame_bytes)) <= stride
            assert len(bytes(fr.frame_bytes)) == min(stride, nb - lo)


def test_wav_roundtrip_and_features(spark):
    import numpy as np

    from dask_grblas_spark.functions.multimodal import (
        audio_features, decode_wav, encode_wav_pcm16)

    s = np.array([0, 1000, -1000, 32767, -32768, 5], dtype=np.int16)
    blob = encode_wav_pcm16(s, sample_rate=44100)
    rate, back = decode_wav(blob)
    assert rate == 44100
    assert np.array_equal(back, s)

    # chunk walker tolerates an extra chunk before data
    import struct
    extra = (blob[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO"
             + blob[12:])
    rate2, back2 = decode_wav(extra)
    assert rate2 == 44100 and np.array_equal(back2, s)

    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, content binary")
    r = audio_features(df).collect()[0]
    assert r["n_samples"] == 6 and r["sample_rate"] == 44100
    # rms = sqrt(sum(s^2)/6), zero crossings: 0->1000 no, 1000->-1000
    # yes, -1000->32767 yes, 32767->-32768 yes, -32768->5 yes
    sq = int((s.astype(np.int64) ** 2).sum())
    import math
    assert r["rms"] == math.floor(math.sqrt(sq / 6) * 1e6 + 0.5) / 1e6
    assert r["zero_crossings"] == 4


def test_decode_wav_rejects_non_pcm16(spark):
    import struct

    import pytest

    from dask_grblas_spark.functions.multimodal import decode_wav
    # stereo header
    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000,
                                   32000, 4, 16)
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        decode_wav(hdr)
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS junk")


# ---------------------------------------------------------------------------
# encode_ppm_p6 / image_dhash (r11)
# ---------------------------------------------------------------------------

def test_ppm_p6_roundtrip_bit_exact(spark):
    import numpy as np

    from dask_grblas_spark.functions.multimodal import (decode_pixels,
                                                        encode_ppm_p6)
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 17, 3)).astype("uint8")
    assert (decode_pixels(encode_ppm_p6(px)) == px).all()


def _dhash_of(spark, px_list):
    import pandas as pd

    from dask_grblas_spark.functions.multimodal import (encode_ppm_p6,
                                                        image_dhash)
    rows = [(i, bytearray(encode_ppm_p6(px)))
            for i, px in enumerate(px_list)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return {r["media_id"]: r["dhash"]
            for r in image_dhash(df).collect()}


def test_dhash_gradient_all_ones_and_flat_zero(spark):
    import numpy as np

    # strictly increasing left->right gray: every adjacent comparison
    # fires -> all 56 bits set; a flat image sets none
    grad = np.tile(np.arange(0, 180, 10, dtype=np.uint8), (12, 1))
    grad = np.stack([grad] * 3, axis=2)        # 12 x 18 x 3
    flat = np.full((12, 18, 3), 77, dtype=np.uint8)
    got = _dhash_of(spark, [grad, flat])
    assert got[0] == (1 << 56) - 1
    assert got[1] == 0


def test_dhash_brightness_offset_invariant(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randint(30, 200, size=(20, 25, 3)).astype("uint8")
    brighter = (base.astype(np.int64) + 40).clip(0, 255).astype("uint8")
    got = _dhash_of(spark, [base, brighter])
    # luma shifts by a constant (+40 on all channels), comparisons
    # between sampled cells are unchanged
    assert got[0] == got[1]


def test_dhash_grid_bit_budget(spark):
    import pytest as _pt

    from dask_grblas_spark.functions.multimodal import image_dhash
    df = spark.createDataFrame([], "media_id long, content binary")
    with _pt.raises(ValueError, match="63 bits"):
        image_dhash(df, cols=9, rows=8)        # 64 bits: overflows
