"""Pure-Python GIF87a/89a codec (struct + numpy): the remaining
image format a web-crawl multimodal corpus actually carries next to
JPEG/PNG/BMP. Implements the public GIF specification end-to-end —
logical screen descriptor, global AND local color tables, variable-
width GIF-LZW (3..12-bit codes, clear/EOI, 255-byte sub-blocks),
4-pass interlacing, multi-frame animations with graphic control
extensions — as a writer/reader pair in the house codec style
(encode for fixtures, decode for the scan path; a PIL cluster swaps
decode_gif for Image.open and nothing else changes).

Scope: full-frame replace animations with GCE TRANSPARENCY decoded
(transparent pixels leave the canvas unchanged — the compositing
rule under disposal unspecified/keep); restore-to-background and
restore-to-previous disposal and PLTE-less GIFs are out of scope
with typed errors — the fixtures never emit them and the decode path
names them clearly.
"""

from __future__ import annotations

import struct

import numpy as np


class GIFError(ValueError):
    """Malformed or out-of-subset GIF structure."""


# ------------------------------------------------------------- LZW
def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-LZW encode a flat uint8 index array at min code size mcs.

    Optimization r13 (same output bytes, pinned by the round-trip
    suite): the dictionary keys on the integer pair
    (prev_code << 8 | byte) instead of growing bytes objects — one
    int hash per symbol instead of an O(len) bytes concat+hash — and
    the emitted (code, width) stream is bit-packed in one vectorized
    numpy pass at the end instead of a per-code Python closure. The
    code sequence, width schedule, and table-reset points are
    byte-identical to the previous form: singletons map to their own
    code (so the dict never needs re-seeding after a clear), and the
    width bump/reset tests run in the same order per emission."""
    clear = 1 << mcs
    eoi = clear + 1
    codes: list[int] = []
    widths: list[int] = []
    emit = codes.append
    emitw = widths.append
    width = mcs + 1
    emit(clear)
    emitw(width)
    data = indices.tobytes()
    if data:
        table: dict[int, int] = {}
        next_code = eoi + 1
        prev = data[0]
        for b in data[1:]:
            key = (prev << 8) | b
            cur = table.get(key)
            if cur is not None:
                prev = cur
                continue
            emit(prev)
            emitw(width)
            table[key] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
            if next_code >= 4096:
                emit(clear)
                emitw(width)
                table.clear()
                next_code = eoi + 1
                width = mcs + 1
            prev = b
        emit(prev)
        emitw(width)
    emit(eoi)
    emitw(width)
    # vectorized bit-pack: each code's fragments land in <= 3 bytes;
    # bit positions never overlap, so scatter-add == scatter-or
    c = np.asarray(codes, dtype=np.int64)
    w = np.asarray(widths, dtype=np.int64)
    ends = np.cumsum(w)
    starts = ends - w
    nbytes = int((ends[-1] + 7) // 8)
    v = c << (starts & 7)
    out = np.zeros(nbytes + 2, dtype=np.uint32)
    idx = (starts >> 3).astype(np.int64)
    np.add.at(out, idx, v & 0xFF)
    np.add.at(out, idx + 1, (v >> 8) & 0xFF)
    np.add.at(out, idx + 2, (v >> 16) & 0xFF)
    return out[:nbytes].astype(np.uint8).tobytes()


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    """GIF-LZW decode to exactly n_expected index bytes."""
    clear = 1 << mcs
    eoi = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GIFError("LZW stream ended before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GIFError(f"first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GIFError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            # writers may pad; stop once the raster is complete, but
            # still require a well-formed stream up to here
            break
    if len(out) < n_expected:
        raise GIFError(
            f"LZW produced {len(out)} of {n_expected} pixels"
        )
    return bytes(out[:n_expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, dtype="int64")


# ----------------------------------------------------------- encode
def encode_gif(frames: np.ndarray, delay_cs: int = 4,
               interlace: bool = False,
               local_tables: bool = False) -> bytes:
    """(n, h, w, 3) or (h, w, 3) uint8 RGB -> GIF89a bytes. Each
    frame must use <= 256 distinct colors (the format's limit; the
    fixtures are paletted by construction — real pipelines quantize
    upstream). Multi-frame inputs get a looping animation with
    per-frame graphic control extensions. local_tables stores each
    frame's palette in a LOCAL color table (the layout multi-palette
    animations use); otherwise frame 0's palette goes global and
    every frame must share it."""
    frames = np.ascontiguousarray(frames, dtype="u1")
    if frames.ndim == 3:
        frames = frames[None]
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise GIFError("encode_gif takes (n, h, w, 3) uint8 frames")
    n, h, w, _ = frames.shape

    def palette_of(img) -> tuple[np.ndarray, np.ndarray]:
        # pack RGB into one uint32 so the unique runs on a 1-D int
        # array (optimization r12: np.unique(axis=0) lexsorts rows —
        # the profiled encode hotspot). r*2^16 + g*2^8 + b sorts in
        # exactly the (r, g, b) lexicographic order axis=0 used, so
        # palette bytes and index raster are bit-identical (pinned by
        # the byte-level round-trip tests).
        flat = img.reshape(-1, 3).astype("u4")
        packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        pal_p, inv = np.unique(packed, return_inverse=True)
        if len(pal_p) > 256:
            raise GIFError(
                f"frame has {len(pal_p)} colors; GIF allows 256"
            )
        pal = np.stack(
            [(pal_p >> 16) & 0xFF, (pal_p >> 8) & 0xFF, pal_p & 0xFF],
            axis=1,
        ).astype("u1")
        return pal, inv.astype("u1").reshape(img.shape[:2])

    def table_bytes(pal: np.ndarray) -> tuple[bytes, int]:
        size_exp = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
        padded = np.zeros((1 << size_exp, 3), dtype="u1")
        padded[:len(pal)] = pal
        return padded.tobytes(), size_exp

    out = bytearray(b"GIF89a")
    gpal, gidx0 = palette_of(frames[0])
    gtab, gexp = table_bytes(gpal)
    out += struct.pack("<HHBBB", w, h, 0x80 | (gexp - 1), 0, 0)
    out += gtab
    if n > 1:
        # Netscape looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi in range(n):
        if n > 1:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", 0, delay_cs, 0
            ) + b"\x00"
        if local_tables or fi == 0:
            pal, idx = (gpal, gidx0) if fi == 0 else palette_of(
                frames[fi]
            )
        else:
            # vectorized global-palette lookup: pack RGB to 24-bit
            # ints and searchsorted against the sorted packed palette
            # (the old per-pixel dict loop allocated a tuple per pixel
            # — review r10)
            pal = gpal
            flat = frames[fi].reshape(-1, 3).astype("int64")
            packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
            gp = gpal.astype("int64")
            gp_packed = (gp[:, 0] << 16) | (gp[:, 1] << 8) | gp[:, 2]
            order = np.argsort(gp_packed)
            at = np.searchsorted(gp_packed[order], packed)
            at = np.clip(at, 0, len(order) - 1)
            hit = gp_packed[order][at] == packed
            if not hit.all():
                raise GIFError(
                    "frame color outside the global table; pass "
                    "local_tables=True"
                )
            idx = order[at].astype("u1").reshape(h, w)
        flags = 0x40 if interlace else 0
        if local_tables and fi > 0:
            ltab, lexp = table_bytes(pal)
            flags |= 0x80 | (lexp - 1)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        if local_tables and fi > 0:
            out += ltab
        rows = idx[_interlace_order(h)] if interlace else idx
        mcs = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
        lzw = _lzw_encode(rows.reshape(-1), mcs)
        out.append(mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ----------------------------------------------------------- decode
def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (n, h, w, 3) uint8 RGB frames (full-frame replace
    semantics; sub-rectangle frames are composited onto the previous
    frame). Truncated or corrupt structures raise GIFError, never
    struct.error / IndexError — the typed-error contract every codec
    in this package keeps."""
    try:
        return _decode_gif(data)
    except GIFError:
        raise
    except (struct.error, IndexError, ValueError) as exc:
        # ValueError covers np.frombuffer on a buffer truncated inside
        # a color table ("buffer is smaller than requested size")
        raise GIFError(f"truncated or corrupt GIF: {exc}") from exc


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GIFError("not a GIF file (no GIF87a/GIF89a signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gpal = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        gpal = np.frombuffer(
            data, dtype="u1", count=gsize * 3, offset=pos
        ).reshape(-1, 3)
        pos += gsize * 3
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype="u1")
    transparent = None  # pending GCE transparency index for ONE image
    while True:
        if pos >= len(data):
            raise GIFError("GIF ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:
                # Graphic Control Extension: transparency DECODES
                # (transparent pixels leave the canvas unchanged —
                # the compositing rule under disposal none/keep);
                # restore-to-background/previous disposal stays out
                # of scope with the TYPED error the module contract
                # promises — it used to be silently skipped, feeding
                # corrupt frames to the pHash pipeline (review r10)
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 0x07
                if disposal in (2, 3):
                    raise GIFError(
                        f"GIF disposal method {disposal} (restore to "
                        "background/previous) is out of the decoded "
                        "subset (have: unspecified/keep)"
                    )
                if gflags & 0x01:
                    transparent = data[pos + 4]
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block == 0x3B:
            break
        if block != 0x2C:
            raise GIFError(f"unknown GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gpal
        if iflags & 0x80:
            lsize = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                data, dtype="u1", count=lsize * 3, offset=pos
            ).reshape(-1, 3)
            pos += lsize * 3
        if pal is None:
            raise GIFError("image with neither global nor local "
                           "color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), mcs, iw * ih), dtype="u1"
        ).reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(pal):
            raise GIFError("pixel index beyond the color table")
        if iflags & 0x40:  # deinterlace
            order = _interlace_order(ih)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        canvas = canvas.copy()
        if transparent is not None:
            region = canvas[iy:iy + ih, ix:ix + iw]
            m = idx != transparent
            region[m] = pal[idx][m]
        else:
            canvas[iy:iy + ih, ix:ix + iw] = pal[idx]
        transparent = None  # a GCE governs exactly one image
        frames.append(canvas)
    if not frames:
        raise GIFError("GIF contains no image data")
    return np.stack(frames)
