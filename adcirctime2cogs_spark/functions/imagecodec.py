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
    # Netpbm headers allow '#' comment lines between any tokens and
    # common writers emit them (GIMP: 'P6\n# CREATOR...\n') — tokens
    # are parsed with comments stripped, not by a comment-blind regex
    # that rejected such files (review r10)
    tok = rb"(?:\s+|\s*(?:#[^\n]*\n\s*)+)"
    m = re.match(
        rb"(P[56])" + tok + rb"(\d+)" + tok + rb"(\d+)" + tok
        + rb"(\d+)(?:#[^\n]*\n|\s)",
        data,
    )
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
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from adcirctime2cogs_spark.functions.gifcodec import decode_gif

        return decode_gif(data)[0], "gif"  # first frame for stills
    raise ValueError(
        "unknown image format (not BMP, binary PPM/PGM, PNG, JPEG, "
        "or GIF)"
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (the pixel-center mapping PIL's
    NEAREST uses)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype("int64"), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype("int64"), w - 1)
    return arr[rows][:, cols].copy()


# ------------------------------------------------------------------
# Perceptual hashing (pHash): the DCT low-frequency signature behind
# embedding-free image near-dup detection in multimodal training-data
# pipelines. Pure numpy — grayscale, box-filter resample, orthonormal
# 2-D DCT-II, median-threshold bits.

def to_gray(arr: np.ndarray) -> np.ndarray:
    """Rec.601 luma as float64 (H, W); grayscale inputs pass through."""
    a = arr.astype("float64")
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def resize_area(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter (area-average) resample of a 2-D float array — the
    stable choice for perceptual hashing: every source pixel
    contributes, so a one-pixel shift or re-encode noise moves the
    average by O(1/area) instead of flipping a sampled pixel the way
    nearest-neighbor can. Fractional source extents are handled by
    edge-weighted cumulative sums (exact area weighting)."""
    h, w = arr.shape
    # exact area average via the 2-D integral image evaluated at
    # fractional box edges (linear interpolation of cumsum is exact
    # for piecewise-constant pixels)
    integ = np.zeros((h + 1, w + 1), dtype="float64")
    integ[1:, 1:] = np.cumsum(np.cumsum(arr, axis=0), axis=1)

    def edges(n_out: int, n_in: int) -> np.ndarray:
        return np.linspace(0.0, float(n_in), n_out + 1)

    def interp_axis(m: np.ndarray, pos: np.ndarray, axis: int):
        base = np.minimum(pos.astype("int64"), m.shape[axis] - 1)
        frac = pos - base
        lo = np.take(m, base, axis=axis)
        hi = np.take(m, np.minimum(base + 1, m.shape[axis] - 1),
                     axis=axis)
        shape = [1, 1]
        shape[axis] = len(pos)
        return lo + (hi - lo) * frac.reshape(shape)

    re_ = edges(out_h, h)
    ce = edges(out_w, w)
    g = interp_axis(interp_axis(integ, re_, 0), ce, 1)
    boxes = (g[1:, 1:] - g[:-1, 1:] - g[1:, :-1] + g[:-1, :-1])
    area = np.outer(np.diff(re_), np.diff(ce))
    return boxes / area


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n)."""
    k = np.arange(n, dtype="float64")[:, None]
    x = np.arange(n, dtype="float64")[None, :]
    m = np.cos(np.pi * (x + 0.5) * k / n) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def phash64(arr: np.ndarray, grid: int = 32, keep: int = 8) -> int:
    """64-bit perceptual hash: grayscale -> area-resample to
    grid x grid -> orthonormal 2-D DCT-II -> the keep x keep
    low-frequency block, bit k (row-major) = 1 iff coefficient >
    median of the block EXCLUDING the DC term. Uniform brightness
    shifts move only the DC coefficient, so they leave the hash
    untouched; mild re-encode noise perturbs coefficients by far
    less than the median gap on natural images."""
    g = resize_area(to_gray(arr), grid, grid)
    d = _dct_mat(grid)
    coef = d @ g @ d.T
    block = coef[:keep, :keep].ravel()
    med = np.median(block[1:])
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
