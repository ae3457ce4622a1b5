"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media travel as opaque ``binary`` columns inside a typed struct
(:data:`MEDIA_SCHEMA`), so Spark shuffles/stores them like any other
column while decode/feature work happens in Arrow-batched Pandas UDFs —
the only sane shape at 100 TB: bytes stay columnar end-to-end, Python sees
them batch-at-a-time, and partitioning controls how many decodes run per
task.

DECODER STATUS: this container ships no image/audio libraries, so the
compressed-codec decode is STUBBED. ``decode_media`` uses a
clearly-marked **deterministic fake** (metadata derived from the MD5 of
the payload bytes) by default; ``require_real=True`` decodes REAL
pixels through the pure-Python fixture codecs in :mod:`.codecs`
(uncompressed PPM/BMP — public, header-only formats), so the
decode→features→resize path executes end-to-end in this sandbox.
Containers outside the fixture set (PNG/JPEG/video) raise
``NotImplementedError`` (via :class:`.codecs.UnsupportedMediaError`)
at the same PIL/ffmpeg integration seam as before. All the Spark-side
plumbing — schemas, UDF signatures, Arrow batch shapes, 1→N frame
fan-out — is shared between the fake and real paths; swapping in
``PIL.Image.open(io.BytesIO(b))`` widens one dispatch function.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.llm import codecs as _codecs

#: A media value: payload + container type + source-asserted metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source_meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

#: decode_media output columns appended to the input frame.
DECODED_FIELDS = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_DIM = 16


def media_struct(data: Column, mime: Column | str) -> Column:
    """Assemble a MEDIA_SCHEMA struct from a binary column + mime."""
    mime_col = F.lit(mime) if isinstance(mime, str) else mime
    return F.struct(
        data.alias("data"),
        mime_col.alias("mime"),
        F.create_map().cast(MEDIA_SCHEMA["source_meta"].dataType).alias(
            "source_meta"
        ),
    )


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, str] | None:
    """DETERMINISTIC FAKE decode: metadata from the payload's MD5 hex
    digest (nibbles 0-3), standing in for a real header parse. Byte-stable
    across runs/engines, so SQL oracles can replay it."""
    if payload is None:
        return None
    h = hashlib.md5(bytes(payload)).hexdigest()
    width = 16 * (1 + int(h[0], 16))
    height = 16 * (1 + int(h[1], 16))
    n_frames = 1 + int(h[2], 16)
    fmt = "png" if int(h[3], 16) % 2 == 0 else "jpeg"
    return width, height, n_frames, fmt


def _real_decode(
    payload: bytes | None, mime: str | None
) -> tuple[int, int, int, str] | None:
    """REAL header+pixel decode through the fixture codecs (PPM/BMP).
    Still images have exactly one frame. Containers outside the fixture
    set raise :class:`.codecs.UnsupportedMediaError` (a
    NotImplementedError) — the task fails honestly at the PIL/ffmpeg
    seam instead of returning fabricated metadata."""
    if payload is None:
        return None
    w, h, _, fmt = _codecs.decode(mime, bytes(payload))
    return w, h, 1, fmt


def decode_media(
    df: DataFrame, media_col: str = "media", *, require_real: bool = False
) -> DataFrame:
    """Append decoded metadata columns (width/height/n_frames/format) via
    ``mapInPandas``. Batch contract: input batches keep every source
    column; output batches append the four decoded columns, one output row
    per input row (decode is 1→1; see :func:`sample_frames` for 1→N).

    ``require_real=True`` parses REAL headers/pixels via the fixture
    codecs (PPM/BMP); unsupported containers fail the task with
    NotImplementedError at the codec seam."""
    out_schema = T.StructType(list(df.schema.fields) + list(DECODED_FIELDS.fields))

    def gen(batches):
        for pdf in batches:
            if require_real:
                decoded = [
                    _real_decode(
                        m["data"] if m is not None else None,
                        m["mime"] if m is not None else None,
                    )
                    for m in pdf[media_col]
                ]
            else:
                decoded = [
                    _fake_decode(m["data"] if m is not None else None)
                    for m in pdf[media_col]
                ]
            pdf = pdf.copy()
            pdf["width"] = [d[0] if d else None for d in decoded]
            pdf["height"] = [d[1] if d else None for d in decoded]
            pdf["n_frames"] = [d[2] if d else None for d in decoded]
            pdf["format"] = [d[3] if d else None for d in decoded]
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def pixel_features(width: int, height: int, rgb: bytes) -> list[float]:
    """16-dim REAL pixel statistics, all in [0, 1): per-channel means
    (3), overall brightness mean (1), and a 4-bin histogram per channel
    (12; bin = value // 64). Integer sums divided once at the end, so
    the vector is exactly replayable from the same pixels — the
    pixel-exact contract the fixture-codec tests assert."""
    n_px = width * height
    sums = [0, 0, 0]
    bins = [[0] * 4 for _ in range(3)]
    for i in range(0, 3 * n_px, 3):
        for c in range(3):
            v = rgb[i + c]
            sums[c] += v
            bins[c][v >> 6] += 1
    feats = [sums[c] / (255.0 * n_px) for c in range(3)]
    feats.append(sum(sums) / (3 * 255.0 * n_px))
    for c in range(3):
        feats.extend(bins[c][k] / n_px for k in range(4))
    return feats


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    feature_col: str = "features",
    dim: int = FEATURE_DIM,
    *,
    require_real: bool = False,
) -> DataFrame:
    """Append a ``array<float>`` feature vector per media row (the
    embed-everything step before similarity search). Default is the
    DETERMINISTIC FAKE: MD5 digest bytes scaled to [0,1) — a stand-in
    for a real vision/audio encoder with the same UDF signature and
    batch shape. ``require_real=True`` computes :func:`pixel_features`
    from REAL pixels via the fixture codecs (dim must be 16);
    unsupported containers fail at the codec seam."""
    if require_real and dim != FEATURE_DIM:
        raise ValueError(
            f"real pixel features are exactly {FEATURE_DIM}-dim, got {dim}"
        )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(feature_col, T.ArrayType(T.FloatType()))]
    )

    def gen(batches):
        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                if m is None or m["data"] is None:
                    feats.append(None)
                    continue
                if require_real:
                    w, h, rgb, _ = _codecs.decode(m["mime"], bytes(m["data"]))
                    feats.append(pixel_features(w, h, rgb))
                else:
                    digest = hashlib.md5(bytes(m["data"])).digest()
                    feats.append([digest[i % 16] / 256.0 for i in range(dim)])
            pdf = pdf.copy()
            pdf[feature_col] = feats
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def resize_media(
    df: DataFrame,
    media_col: str = "media",
    *,
    max_width: int = 256,
    max_height: int = 256,
    require_real: bool = False,
) -> DataFrame:
    """Downscale each media payload to fit (max_width, max_height),
    preserving aspect ratio; already-fitting media pass through unchanged
    (payload identity preserved — the no-op case must not rewrite bytes).
    1→1 Arrow-batched transform over the same MEDIA_SCHEMA struct; the
    resized dimensions are recorded in ``source_meta`` (width/height/
    resized keys) since the FAKE transcode can't embed them in a real
    header. Aspect math is pure integer arithmetic (binding edge chosen by
    cross-multiplication), so output dims are engine-replayable.

    DETERMINISTIC FAKE transcode by default: the resized payload is the
    MD5 of (payload ‖ new dims) — a byte-stable stand-in with the same
    UDF signature as a real resize. ``require_real=True`` performs a
    REAL integer nearest-neighbor resample via the fixture codecs and
    re-encodes in the SAME container (PPM/BMP); unsupported containers
    fail at the codec seam. Both paths share the aspect math and the
    source_meta bookkeeping."""
    out_schema = df.schema

    def gen(batches):
        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                if m is None or m["data"] is None:
                    out.append(m)
                    continue
                data = bytes(m["data"])
                if require_real:
                    w, h, rgb, fmt = _codecs.decode(m["mime"], data)
                else:
                    w, h, _, _ = _fake_decode(data)
                if w <= max_width and h <= max_height:
                    out.append(m)
                    continue
                # binding edge by cross-multiplication: width binds iff
                # w/max_width >= h/max_height  ⟺  w*max_height >= h*max_width
                if w * max_height >= h * max_width:
                    new_w = max_width
                    new_h = max(1, h * max_width // w)
                else:
                    new_h = max_height
                    new_w = max(1, w * max_height // h)
                if require_real:
                    resized = _codecs.resize_nearest(w, h, rgb, new_w, new_h)
                    payload = _codecs.encode(new_w, new_h, resized, fmt)
                else:
                    payload = hashlib.md5(
                        data + f"|{new_w}x{new_h}".encode()
                    ).digest()
                meta = dict(m["source_meta"] or {})
                meta.update(
                    {
                        "width": str(new_w),
                        "height": str(new_h),
                        "resized": "true",
                    }
                )
                out.append(
                    {"data": payload, "mime": m["mime"], "source_meta": meta}
                )
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    every: int = 1,
) -> DataFrame:
    """Explode each media row into its frames (1→N generator shape —
    the video/audio-chunk fan-out). Frame count comes from the (fake)
    decode; each output row carries a deterministic byte-slice of the
    payload as the frame payload. ``every`` keeps one frame in ``every``
    (stride sampling)."""
    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_data", T.BinaryType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for rid, m in zip(pdf[id_col], pdf[media_col]):
                if m is None or m["data"] is None:
                    continue
                data = bytes(m["data"])
                meta = _fake_decode(data)
                for i in range(0, meta[2], every):
                    ids.append(rid)
                    idxs.append(i)
                    start = (i * 7) % max(len(data), 1)
                    payloads.append(data[start : start + 16])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_data": payloads}
            )

    return df.mapInPandas(gen, schema=out_schema)
