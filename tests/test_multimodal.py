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


def test_decode_real_path_gated_on_pil_import(media):
    """real_decode=True decodes with PIL when importable, raises
    NotImplementedError when not — this test covers whichever import
    state the environment has, so the gate is exercised either way."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            multimodal.decode_features(media, real_decode=True)
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
