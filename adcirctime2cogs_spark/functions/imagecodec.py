"""Pure-Python image codecs (BMP 24-bit, binary PPM/PGM) — struct +
numpy, no PIL/OpenCV. decode_image also dispatches PNG
(functions/pngcodec.py) and baseline JPEG (functions/jpegcodec.py)
payloads by signature, so the multimodal kernels read all four
common encodings.

Both formats are fully public and trivial, which makes them the right
substrate for the multimodal operators in this container: the Spark
plumbing (binary columns, Arrow batches, mapInPandas) carries REAL
image bytes, the decode kernel really parses headers and pixel rows,
and resize really resamples pixels — so the operator family is no
longer a deterministic fake, just a reduced codec set. A PIL-equipped
cluster swaps `decode_image` for Image.open and nothing else changes.

Formats:
- BMP: 14-byte file header ('BM', size, data offset) + 40-byte
  BITMAPINFOHEADER, 24 bpp uncompressed, BGR pixel order, rows padded
  to 4 bytes, stored bottom-up.
- PPM (P6) / PGM (P5): ASCII header "P6\\n<w> <h>\\n255\\n" followed by
  raw RGB (or gray) bytes, row-major top-down.
"""

from __future__ import annotations

import re
import struct

import numpy as np


# ------------------------------------------------------------------ PPM
def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6); HxW uint8 -> PGM (P5)."""
    arr = np.ascontiguousarray(arr, dtype="uint8")
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"PPM wants HxWx3 or HxW, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    m = re.match(rb"(P[56])\s+(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        raise ValueError("not a binary PPM/PGM")
    magic, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    px = np.frombuffer(data, dtype="uint8", offset=m.end())
    if magic == b"P6":
        return px[: h * w * 3].reshape(h, w, 3).copy()
    return px[: h * w].reshape(h, w).copy()


# ------------------------------------------------------------------ BMP
def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) -> 24-bit uncompressed BMP."""
    arr = np.ascontiguousarray(arr, dtype="uint8")
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"BMP writer wants HxWx3, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up rows, 4-byte row padding
    bgr = arr[::-1, :, ::-1]
    rows = bgr.reshape(h, row_bytes)
    if pad:
        rows = np.hstack([rows, np.zeros((h, pad), dtype="uint8")])
    data = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (offset,) = struct.unpack_from("<I", data, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(data, dtype="uint8", offset=offset,
                         count=stride * h).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------ dispatch
def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """(HxWx3-or-HxW uint8 array, format) by magic sniffing."""
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data), "ppm"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from adcirctime2cogs_spark.functions.pngcodec import decode_png

        return decode_png(data), "png"
    if data[:2] == b"\xff\xd8":
        from adcirctime2cogs_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(data), "jpeg"
    raise ValueError(
        "unknown image format (not BMP, binary PPM/PGM, PNG, or JPEG)"
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (the pixel-center mapping PIL's
    NEAREST uses)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype("int64"), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype("int64"), w - 1)
    return arr[rows][:, cols].copy()
