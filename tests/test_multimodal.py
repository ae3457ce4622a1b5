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


def test_require_real_raises_not_implemented(media_df):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media_df, require_real=True)


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


def test_resize_media_require_real_raises(media_df):
    with pytest.raises(NotImplementedError):
        mm.resize_media(media_df, require_real=True)
