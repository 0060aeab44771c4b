"""Pure-Python/numpy PNG codec (RFC 2083 / ISO 15948) — the lossless
web-image leg of the multimodal family, alongside BMP/PPM
(imagecodec.py) and baseline JPEG (jpegcodec.py).

Decoder: chunk walk with real CRC-32 verification, IHDR geometry,
zlib-inflated IDAT (concatenated across chunks), all five scanline
filters (None/Sub/Up/Average/Paeth) unfiltered per spec, color types
0 (grayscale), 2 (truecolor), 3 (palette via PLTE), 6 (RGBA), 8-bit
depth. Out of scope with clear errors: 16-bit and sub-byte depths,
Adam7 interlace.

Encoder: 8-bit grayscale/RGB/RGBA with a selectable scanline filter
(default Paeth — the common adaptive choice, applied uniformly so the
stream is deterministic), zlib-compressed IDAT, CRC'd chunks. Output
is a fully standard PNG any reader opens.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class PNGError(ValueError):
    pass


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter `ftype` to one raw scanline (uint8 vector)."""
    r = row.astype(np.int64)
    a = np.zeros_like(r)
    a[bpp:] = r[:-bpp]
    b = prev.astype(np.int64)
    c = np.zeros_like(b)
    c[bpp:] = b[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - a
    elif ftype == 2:
        out = r - b
    elif ftype == 3:
        out = r - (a + b) // 2
    elif ftype == 4:
        out = r - _paeth(a, b, c)
    else:
        raise PNGError(f"unknown filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Invert filter `ftype` (row is the filtered bytes). Sub/Average/
    Paeth are sequential in x (each pixel needs the reconstructed
    left neighbor), so they run per-pixel-column in steps of bpp."""
    n = row.shape[0]
    out = row.astype(np.int64)
    b = prev.astype(np.int64)
    if ftype == 0:
        pass
    elif ftype == 2:
        out = (out + b) % 256
    elif ftype == 1:
        for x in range(bpp, n):
            out[x] = (out[x] + out[x - bpp]) % 256
    elif ftype == 3:
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (out[x] + (left + b[x]) // 2) % 256
    elif ftype == 4:
        for x in range(n):
            a = out[x - bpp] if x >= bpp else 0
            c = b[x - bpp] if x >= bpp else 0
            p = a + b[x] - c
            pa, pb, pc = abs(p - a), abs(p - b[x]), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (
                b[x] if pb <= pc else c
            )
            out[x] = (out[x] + pred) % 256
    else:
        raise PNGError(f"unknown filter type {ftype}")
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 4,
               level: int = 6) -> bytes:
    """uint8 (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA ->
    PNG bytes. filter_type applies to every scanline (0, 1, 2, 3, or
    4 = Paeth); all are valid per spec, Paeth compresses typical
    content best."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise PNGError("encode_png wants uint8 (h,w) / (h,w,3) / (h,w,4)")
    if arr.ndim == 2:
        color, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.shape[2] == 3:
        color, ch = 2, 3
        flat = arr
    elif arr.shape[2] == 4:
        color, ch = 6, 4
        flat = arr
    else:
        raise PNGError(f"unsupported channel count {arr.shape[2]}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = flat[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, ch).tobytes()
        prev = row
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (h, w) for grayscale, (h, w, 3) for
    truecolor/palette, (h, w, 4) for RGBA. CRCs are verified; every
    malformed-input failure surfaces as PNGError (a ValueError)."""
    try:
        return _decode_png(data)
    except PNGError:
        raise
    except (struct.error, IndexError, ValueError) as exc:
        raise PNGError(f"malformed PNG stream: {exc!r}") from exc


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise PNGError("no PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        ln, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise PNGError(f"truncated {ctype!r} chunk")
        crc_raw = data[pos + 8 + ln:pos + 12 + ln]
        if len(crc_raw) != 4:
            raise PNGError(f"truncated CRC on {ctype!r}")
        crc = struct.unpack(">I", crc_raw)[0]
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise PNGError(f"bad CRC on {ctype!r}")
        pos += 12 + ln
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PNGError(f"IHDR is {len(body)} bytes, not 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise PNGError(f"PLTE length {len(body)} not periodic")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise PNGError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise PNGError(f"bit depth {depth} unsupported (8 only)")
    if interlace:
        raise PNGError("Adam7 interlace unsupported")
    if comp or filt:
        raise PNGError("nonzero compression/filter method")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if ch is None:
        raise PNGError(f"color type {color} unsupported")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as exc:
        raise PNGError(f"bad IDAT stream: {exc}") from exc
    stride = w * ch
    if raw.shape[0] != h * (stride + 1):
        raise PNGError(
            f"IDAT holds {raw.shape[0]} bytes, expected {h * (stride + 1)}"
        )
    rows = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(rows[y, 0]), rows[y, 1:], prev, ch)
        out[y] = prev
    px = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise PNGError("palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise PNGError("palette index out of range")
        return plte[idx]
    if ch == 1:
        return px[:, :, 0]
    return px
