"""Pure-Python fixture codecs for the multimodal seams: uncompressed
PPM (P6) and BMP (24-bit BI_RGB) decode/encode plus an integer
nearest-neighbor resize.

Why these two: both are PUBLIC, header-only, uncompressed raster
formats decodable in ~40 lines with no third-party library — which
makes the ``require_real=True`` path of
:mod:`financial_data_engineering_spark.llm.multimodal` executable
end-to-end in an environment without PIL/ffmpeg (this container). Real
compressed codecs (PNG/JPEG/video) remain behind the documented
NotImplementedError seam; this module only covers the containers whose
byte layout IS the pixel array, so every decoded value is pixel-exact
and test-assertable.

All arithmetic is integer (row strides, nearest-neighbor index math),
so decode → resize → re-encode is byte-deterministic across engines —
the property the Spark-side oracles and parity tests rely on.
"""

from __future__ import annotations

import struct

#: mime aliases accepted per container.
PPM_MIMES = frozenset({"image/x-portable-pixmap", "image/ppm"})
BMP_MIMES = frozenset({"image/bmp", "image/x-ms-bmp"})
SUPPORTED_MIMES = PPM_MIMES | BMP_MIMES


class UnsupportedMediaError(NotImplementedError):
    """Raised for containers outside the fixture-codec set — the same
    PIL/ffmpeg integration seam the fake path documents."""


def sniff_format(mime: str | None, data: bytes) -> str:
    """Return 'ppm' or 'bmp', or raise :class:`UnsupportedMediaError`.
    The magic bytes are authoritative; mime must not contradict them."""
    if data[:2] == b"P6" and (mime is None or mime in PPM_MIMES):
        return "ppm"
    if data[:2] == b"BM" and (mime is None or mime in BMP_MIMES):
        return "bmp"
    raise UnsupportedMediaError(
        f"no fixture codec for mime={mime!r} magic={data[:2]!r}; real "
        "codecs (PNG/JPEG/video) need PIL/ffmpeg — integration seam in "
        "llm/multimodal.py"
    )


def decode(mime: str | None, data: bytes) -> tuple[int, int, bytes, str]:
    """Decode to (width, height, rgb_bytes, format). ``rgb_bytes`` is
    row-major top-down RGB, 3 bytes per pixel — the common in-memory
    shape both containers normalize to."""
    fmt = sniff_format(mime, data)
    if fmt == "ppm":
        w, h, rgb = _decode_ppm(data)
    else:
        w, h, rgb = _decode_bmp(data)
    return w, h, rgb, fmt


def encode(width: int, height: int, rgb: bytes, fmt: str) -> bytes:
    """Re-encode top-down RGB pixels into ``fmt`` ('ppm' or 'bmp')."""
    if len(rgb) != 3 * width * height:
        raise ValueError(
            f"pixel buffer is {len(rgb)} bytes, expected {3 * width * height}"
        )
    if fmt == "ppm":
        return _encode_ppm(width, height, rgb)
    if fmt == "bmp":
        return _encode_bmp(width, height, rgb)
    raise UnsupportedMediaError(f"no fixture encoder for format {fmt!r}")


def resize_nearest(
    width: int, height: int, rgb: bytes, new_w: int, new_h: int
) -> bytes:
    """Integer nearest-neighbor resample: output pixel (x, y) takes
    source pixel (x*width // new_w, y*height // new_h) — the standard
    floor mapping, deterministic and replayable in SQL if ever needed."""
    out = bytearray(3 * new_w * new_h)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = 3 * sy * width
        dst_row = 3 * y * new_w
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + 3 * sx
            d = dst_row + 3 * x
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


# --- PPM (P6, binary, maxval <= 255) ---------------------------------


def _ppm_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens starting at
    ``start``, skipping ``#`` comments (the netpbm header grammar).
    Returns (values, offset one whitespace past the last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte after maxval


def _decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(data, 3, 2)
    if maxval != 255:
        raise ValueError(f"fixture codec supports maxval=255, got {maxval}")
    need = 3 * w * h
    rgb = data[off : off + need]
    if len(rgb) != need:
        raise ValueError(f"PPM pixel data truncated: {len(rgb)}/{need} bytes")
    return w, h, rgb


def _encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


# --- BMP (BITMAPINFOHEADER, 24bpp, BI_RGB, bottom-up) -----------------


def _decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"fixture codec supports 24bpp BI_RGB only (got bpp={bpp}, "
            f"compression={compression})"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    bottom_up = h > 0
    h = abs(h)
    stride = (3 * w + 3) & ~3  # rows padded to 4 bytes
    rgb = bytearray(3 * w * h)
    for y in range(h):
        src_y = (h - 1 - y) if bottom_up else y
        row = pixel_off + src_y * stride
        if row + 3 * w > len(data):
            raise ValueError("BMP pixel data truncated")
        dst = 3 * y * w
        for x in range(w):
            b, g, r = data[row + 3 * x : row + 3 * x + 3]
            rgb[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return w, h, bytes(rgb)


def _encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    stride = (3 * width + 3) & ~3
    image_size = stride * height
    file_size = 14 + 40 + image_size
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (stride - 3 * width)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = 3 * y * width
        for x in range(width):
            r, g, b = rgb[row + 3 * x : row + 3 * x + 3]
            out += bytes((b, g, r))
        out += pad
    return bytes(out)
