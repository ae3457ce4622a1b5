"""Multimodal plumbing tests: media struct schema, 1→1 decode batches,
feature extraction shape, 1→N frame fan-out, null handling, and the
explicit NotImplementedError seam for real decoders.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from financial_data_engineering_spark.llm import multimodal as mm


@pytest.fixture()
def media_df(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two"), (3, None)],
        "id int, raw binary",
    )
    return df.select(
        "id", mm.media_struct(F.col("raw"), "image/png").alias("media")
    )


def test_media_struct_schema(media_df):
    field = media_df.schema["media"].dataType
    assert [f.name for f in field.fields] == ["data", "mime", "source_meta"]


def test_decode_is_deterministic_and_null_safe(media_df):
    rows = {r["id"]: r for r in mm.decode_media(media_df).collect()}
    h = hashlib.md5(b"payload-one").hexdigest()
    assert rows[1]["width"] == 16 * (1 + int(h[0], 16))
    assert rows[1]["height"] == 16 * (1 + int(h[1], 16))
    assert rows[1]["format"] in ("png", "jpeg")
    assert rows[3]["width"] is None  # null payload decodes to nulls
    again = {r["id"]: r for r in mm.decode_media(media_df).collect()}
    assert rows[1]["width"] == again[1]["width"]


def test_require_real_unsupported_container_fails_at_seam(media_df):
    # media_df's payloads are not PPM/BMP: the real path must fail the
    # task at the codec seam (UnsupportedMediaError inside the UDF,
    # surfaced through Spark's Python-worker exception), never return
    # fabricated metadata.
    with pytest.raises(Exception, match="no fixture codec|PIL/ffmpeg"):
        mm.decode_media(media_df, require_real=True).collect()


def test_extract_features_shape(media_df):
    out = mm.extract_features(media_df, dim=16)
    rows = {r["id"]: r["features"] for r in out.collect()}
    assert len(rows[1]) == 16
    assert all(0.0 <= v < 1.0 for v in rows[1])
    assert rows[3] is None
    assert rows[1] != rows[2]


def test_sample_frames_fan_out_and_stride(media_df):
    frames = mm.sample_frames(media_df, "id").collect()
    h = hashlib.md5(b"payload-one").hexdigest()
    expected_1 = 1 + int(h[2], 16)
    got_1 = [r for r in frames if r["id"] == 1]
    assert len(got_1) == expected_1
    assert [r["frame_idx"] for r in got_1] == list(range(expected_1))
    assert all(r["id"] != 3 for r in frames)  # null payload emits nothing
    strided = mm.sample_frames(media_df, "id", every=2).collect()
    assert len([r for r in strided if r["id"] == 1]) == (expected_1 + 1) // 2


def test_resize_media_bounds_aspect_and_identity(media_df):
    decoded = {r["id"]: r for r in mm.decode_media(media_df).collect()}
    out = mm.resize_media(media_df, max_width=32, max_height=32)
    rows = {r["id"]: r["media"] for r in out.collect()}
    for i in (1, 2):
        w, h = decoded[i]["width"], decoded[i]["height"]
        meta = rows[i]["source_meta"] or {}
        if w <= 32 and h <= 32:
            # no-op case: payload identity preserved, no resize marker
            assert bytes(rows[i]["data"]) == decoded[i]["media"]["data"]
            assert "resized" not in meta
        else:
            nw, nh = int(meta["width"]), int(meta["height"])
            assert nw <= 32 and nh <= 32 and meta["resized"] == "true"
            # aspect preserved within integer floor: the binding edge hits
            # the bound exactly and the other scales proportionally
            if w * 32 >= h * 32:
                assert nw == 32 and nh == max(1, h * 32 // w)
            else:
                assert nh == 32 and nw == max(1, w * 32 // h)
            assert len(bytes(rows[i]["data"])) == 16  # fake transcode
    # null media passes through untouched
    assert rows[3] is None or rows[3]["data"] is None
    # deterministic across runs
    again = {
        r["id"]: r["media"]
        for r in mm.resize_media(media_df, max_width=32, max_height=32).collect()
    }
    assert bytes(rows[1]["data"]) == bytes(again[1]["data"])


def test_resize_media_require_real_unsupported_fails_at_seam(media_df):
    with pytest.raises(Exception, match="no fixture codec|PIL/ffmpeg"):
        mm.resize_media(media_df, require_real=True).collect()


# --- fixture-codec end-to-end: REAL pixels through the full Arrow path


def _ppm_bytes(width, height, rgb):
    from financial_data_engineering_spark.llm import codecs

    return codecs.encode(width, height, bytes(rgb), "ppm")


@pytest.fixture()
def real_media_df(spark):
    """One PPM and one BMP with KNOWN pixels, plus a null row — the
    first in-sandbox media that decodes to real pixels end-to-end."""
    from financial_data_engineering_spark.llm import codecs

    # 8x4 gradient PPM: pixel (x, y) = (32x, 64y, 7)
    ppm_rgb = bytes(
        v
        for y in range(4)
        for x in range(8)
        for v in (32 * x, 64 * y, 7)
    )
    ppm = codecs.encode(8, 4, ppm_rgb, "ppm")
    # 3x3 BMP: solid red except a green center
    bmp_rgb = bytearray(b"\xff\x00\x00" * 9)
    bmp_rgb[3 * 4 : 3 * 4 + 3] = b"\x00\xff\x00"
    bmp = codecs.encode(3, 3, bytes(bmp_rgb), "bmp")
    df = spark.createDataFrame(
        [
            (1, ppm, "image/x-portable-pixmap"),
            (2, bmp, "image/bmp"),
            (3, None, None),
        ],
        "id int, raw binary, mime string",
    )
    return df.select(
        "id", mm.media_struct(F.col("raw"), F.col("mime")).alias("media")
    )


def test_real_decode_reads_actual_headers(real_media_df):
    rows = {
        r["id"]: r
        for r in mm.decode_media(real_media_df, require_real=True).collect()
    }
    assert (rows[1]["width"], rows[1]["height"], rows[1]["format"]) == (
        8,
        4,
        "ppm",
    )
    assert (rows[2]["width"], rows[2]["height"], rows[2]["format"]) == (
        3,
        3,
        "bmp",
    )
    assert rows[1]["n_frames"] == 1 and rows[2]["n_frames"] == 1
    assert rows[3]["width"] is None  # null payload still decodes to nulls


def test_real_features_are_pixel_exact(real_media_df):
    from financial_data_engineering_spark.llm.multimodal import pixel_features

    out = mm.extract_features(real_media_df, require_real=True)
    rows = {r["id"]: r["features"] for r in out.collect()}
    # recompute expected from the same known pixels, independently
    ppm_rgb = bytes(
        v for y in range(4) for x in range(8) for v in (32 * x, 64 * y, 7)
    )
    expected = pixel_features(8, 4, ppm_rgb)
    assert rows[1] == pytest.approx(expected, rel=1e-6)
    # hand-check a couple of dims against the definition: mean R of the
    # gradient is mean(32x for x in 0..7)/255 = 112/255; B is constant 7
    assert rows[1][0] == pytest.approx(112 / 255.0, rel=1e-6)
    assert rows[1][2] == pytest.approx(7 / 255.0, rel=1e-6)
    # BMP: 8 red + 1 green pixel -> R mean 8/9, G mean 1/9, B mean 0
    assert rows[2][0] == pytest.approx(8 / 9, rel=1e-6)
    assert rows[2][1] == pytest.approx(1 / 9, rel=1e-6)
    assert rows[2][2] == 0.0
    assert rows[3] is None


def test_real_resize_is_nearest_neighbor_exact(real_media_df, spark):
    from financial_data_engineering_spark.llm import codecs

    out = mm.resize_media(
        real_media_df, max_width=4, max_height=4, require_real=True
    )
    rows = {r["id"]: r["media"] for r in out.collect()}
    # 8x4 -> width binds -> 4x2; nearest-neighbor takes src (2x, 2y)
    w, h, rgb, fmt = codecs.decode(None, bytes(rows[1]["data"]))
    assert (w, h, fmt) == (4, 2, "ppm")
    expected = bytes(
        v
        for y in range(2)
        for x in range(4)
        for v in (32 * (2 * x), 64 * (2 * y), 7)
    )
    assert rgb == expected
    assert rows[1]["source_meta"]["resized"] == "true"
    # 3x3 already fits: payload identity preserved (same BMP bytes)
    w2, h2, rgb2, fmt2 = codecs.decode(None, bytes(rows[2]["data"]))
    assert (w2, h2, fmt2) == (3, 3, "bmp")
    assert "resized" not in (rows[2]["source_meta"] or {})
