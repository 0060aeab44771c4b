"""Minimal tiled GeoTIFF / Cloud-Optimized-GeoTIFF codec — pure Python
(struct + zlib), no GDAL/rasterio.

Replaces the old .npz fallback of the COG sink (SURVEY O20; the
reference writes COGs through datacube+GDAL at
run/adcircTime2cogs.py:205-206): output is a structurally valid COG
per the public TIFF 6.0 + GeoTIFF 1.1 + COG specs —

- little-endian classic TIFF, ALL IFDs at the front of the file
  (header-first layout, the property COG readers range-request on),
- 256x256 deflate-compressed float64 tiles (Compression=8,
  SampleFormat=IEEE-float, edge tiles padded with the nodata value),
- reduced-resolution overview IFDs (NewSubfileType=1, nearest 2x
  decimation) whenever the image is larger than one tile,
- georeferencing via ModelPixelScale + ModelTiepoint and a GeoKey
  directory carrying the EPSG code (geographic or projected), plus
  GDAL's ASCII nodata tag.

A reading half lives here too: enough of a TIFF parser to reassemble
the full-resolution raster and expose the tag dictionary — used by the
sink tests for byte-level header assertions and round-trips, and by
pipelines that want to read COGs back without GDAL.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

TILE = 256
# TIFF field types
T_ASCII, T_SHORT, T_LONG, T_DOUBLE = 2, 3, 4, 12
_TYPE_SIZE = {T_ASCII: 1, T_SHORT: 2, T_LONG: 4, T_DOUBLE: 8}

TAG_NEW_SUBFILE_TYPE = 254
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_SAMPLES_PER_PIXEL = 277
TAG_PLANAR_CONFIG = 284
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_PREDICTOR = 317
TAG_SAMPLE_FORMAT = 339
PREDICTOR_FLOAT = 3  # TIFF Technical Note 3 floating-point predictor
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_GEO_KEY_DIRECTORY = 34735
TAG_GDAL_NODATA = 42113


def _epsg_code(crs: str | int) -> int:
    if isinstance(crs, int):
        return crs
    s = str(crs)
    return int(s.split(":")[1]) if ":" in s else int(s)


def _geokey_directory(crs: str | int) -> list[int]:
    """GeoKey directory (GeoTIFF 1.1): model type + raster type +
    geographic/projected EPSG code. RasterType=1 (PixelIsArea) matches
    the pixel-edge geotransform convention of the COG sink."""
    code = _epsg_code(crs)
    # EPSG 4xxx is the geographic-CRS band, with a handful of
    # PROJECTED exceptions (4087/4088, World Equidistant/Mercator
    # sphere) that must emit ProjectedCSTypeGeoKey or readers would
    # interpret a meter geotransform as degrees (review r10)
    geographic = 4000 <= code <= 4999 and code not in (4087, 4088)
    keys = (
        [(1024, 0, 1, 2), (1025, 0, 1, 1), (2048, 0, 1, code)]
        if geographic
        else [(1024, 0, 1, 1), (1025, 0, 1, 1), (3072, 0, 1, code)]
    )
    flat = [1, 1, 0, len(keys)]
    for k in keys:
        flat.extend(k)
    return flat


def _pack_values(ftype: int, values) -> bytes:
    if ftype == T_ASCII:
        return values  # caller passes NUL-terminated bytes
    fmt = {T_SHORT: "<H", T_LONG: "<I", T_DOUBLE: "<d"}[ftype]
    return b"".join(struct.pack(fmt, v) for v in values)


def _fp_predict(block: np.ndarray) -> bytes:
    """TIFF floating-point horizontal-differencing predictor (TIFF
    Technical Note 3, Predictor=3 — what GDAL writes for float COGs):
    per tile row, the values' bytes are reordered plane-major with the
    most-significant plane first, then byte-wise differenced. Smooth
    rasters become near-constant byte streams — measured 40x smaller
    AND 10x faster to deflate than the raw float64 bytes on the
    production regrid output."""
    h, w = block.shape
    b = block.astype(">f8").view("u1").reshape(h, w, 8)
    planes = b.transpose(0, 2, 1).reshape(h, 8 * w).astype("i2")
    planes[:, 1:] = np.diff(planes, axis=1)
    return (planes % 256).astype("u1").tobytes()


def _fp_unpredict(raw: bytes, h: int, w: int) -> np.ndarray:
    d = np.frombuffer(raw, dtype="u1").reshape(h, 8 * w)
    planes = np.cumsum(d.astype("u8"), axis=1) % 256
    b = planes.astype("u1").reshape(h, 8, w).transpose(0, 2, 1)
    return np.ascontiguousarray(b).view(">f8").reshape(h, w).astype(
        "float64"
    )


# deflate worker threads per write (zlib releases the GIL, so tiles
# compress in parallel INSIDE one Spark task — the case that matters
# is few huge images, where per-timestep task parallelism alone
# leaves most cores idle)
COG_THREADS = 4


def _tile_level(arr: np.ndarray, nodata: float, level: int = 6,
                predictor: int = PREDICTOR_FLOAT) -> list[bytes]:
    from concurrent.futures import ThreadPoolExecutor

    h, w = arr.shape
    blocks = []
    for tr in range(math.ceil(h / TILE)):
        for tc in range(math.ceil(w / TILE)):
            block = np.full((TILE, TILE), nodata, dtype="<f8")
            sub = arr[tr * TILE:(tr + 1) * TILE, tc * TILE:(tc + 1) * TILE]
            block[: sub.shape[0], : sub.shape[1]] = sub
            blocks.append(block)

    def enc(block: np.ndarray) -> bytes:
        raw = (
            _fp_predict(block) if predictor == PREDICTOR_FLOAT
            else block.tobytes()
        )
        return zlib.compress(raw, level)

    if len(blocks) > 1 and COG_THREADS > 1:
        with ThreadPoolExecutor(max_workers=COG_THREADS) as pool:
            return list(pool.map(enc, blocks))
    return [enc(b) for b in blocks]


def write_geotiff(
    path: str,
    arr: np.ndarray,
    transform: list[float],
    crs: str | int = "EPSG:4326",
    nodata: float = float("nan"),
    level: int = 6,
    predictor: int = PREDICTOR_FLOAT,
) -> None:
    """Write `arr` (2-D float) as a tiled deflate COG.

    transform: GDAL-style affine (ulx, xres, rot, uly, rot, -yres) —
    only the axis-aligned form is representable in
    ModelPixelScale/ModelTiepoint (rotation terms must be 0).
    Tiles deflate behind the floating-point predictor (tag 317 = 3)
    by default — pass predictor=1 for raw float bytes."""
    if transform[2] != 0.0 or transform[4] != 0.0:
        raise ValueError("rotated geotransforms need a ModelTransformation tag")
    arr = np.asarray(arr, dtype="float64")
    if arr.ndim != 2:
        raise ValueError("write_geotiff takes a single-band 2-D array")

    # pyramid: full res + nearest-2x overviews until BOTH axes fit one
    # tile — min() would stop early on elongated rasters (10000x200)
    # and leave the long axis spanning ~40 tiles with no overview
    levels = [arr]
    while max(levels[-1].shape) > TILE:
        levels.append(levels[-1][::2, ::2])

    level_tiles = [_tile_level(lv, nodata, level, predictor) for lv in levels]

    def entries_for(idx: int) -> list[tuple[int, int, list | bytes]]:
        lv = levels[idx]
        h, w = lv.shape
        n = len(level_tiles[idx])
        e: list[tuple[int, int, list | bytes]] = []
        if idx > 0:
            e.append((TAG_NEW_SUBFILE_TYPE, T_LONG, [1]))
        e += [
            (TAG_IMAGE_WIDTH, T_LONG, [w]),
            (TAG_IMAGE_LENGTH, T_LONG, [h]),
            (TAG_BITS_PER_SAMPLE, T_SHORT, [64]),
            (TAG_COMPRESSION, T_SHORT, [8]),       # Adobe deflate
            (TAG_PHOTOMETRIC, T_SHORT, [1]),       # BlackIsZero
            (TAG_SAMPLES_PER_PIXEL, T_SHORT, [1]),
            (TAG_PLANAR_CONFIG, T_SHORT, [1]),
            (TAG_TILE_WIDTH, T_SHORT, [TILE]),
            (TAG_TILE_LENGTH, T_SHORT, [TILE]),
            (TAG_TILE_OFFSETS, T_LONG, [0] * n),   # patched below
            (TAG_TILE_BYTE_COUNTS, T_LONG, [len(t) for t in level_tiles[idx]]),
            (TAG_SAMPLE_FORMAT, T_SHORT, [3]),     # IEEE float
        ]
        if predictor != 1:
            e.append((TAG_PREDICTOR, T_SHORT, [predictor]))
        if idx == 0:
            xres, yres = transform[1], -transform[5]
            e += [
                (TAG_MODEL_PIXEL_SCALE, T_DOUBLE, [xres, yres, 0.0]),
                (TAG_MODEL_TIEPOINT, T_DOUBLE,
                 [0.0, 0.0, 0.0, transform[0], transform[3], 0.0]),
                (TAG_GEO_KEY_DIRECTORY, T_SHORT, _geokey_directory(crs)),
                (TAG_GDAL_NODATA, T_ASCII,
                 (b"nan\x00" if math.isnan(nodata)
                  else f"{nodata:g}".encode() + b"\x00")),
            ]
        return sorted(e)

    level_entries = [entries_for(i) for i in range(len(levels))]

    # ---- layout: header | IFDs | external value arrays | tile data
    pos = 8
    ifd_offsets = []
    for e in level_entries:
        ifd_offsets.append(pos)
        pos += 2 + 12 * len(e) + 4
    ext_offsets: list[dict[int, int]] = []
    for e in level_entries:
        offs = {}
        for tag, ftype, values in e:
            nbytes = len(values) * _TYPE_SIZE[ftype]
            if nbytes > 4:
                pos = (pos + 3) & ~3
                offs[tag] = pos
                pos += nbytes
        ext_offsets.append(offs)
    tile_offsets: list[list[int]] = []
    for tiles in level_tiles:
        offs = []
        for t in tiles:
            offs.append(pos)
            pos += len(t)
        tile_offsets.append(offs)

    # patch TileOffsets now that tile positions are known
    for i, e in enumerate(level_entries):
        for j, (tag, ftype, values) in enumerate(e):
            if tag == TAG_TILE_OFFSETS:
                e[j] = (tag, ftype, tile_offsets[i])

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    for i, e in enumerate(level_entries):
        assert len(out) == ifd_offsets[i]
        out += struct.pack("<H", len(e))
        for tag, ftype, values in e:
            count = len(values)
            raw = _pack_values(ftype, values)
            out += struct.pack("<HHI", tag, ftype, count)
            if len(raw) <= 4:
                out += raw + b"\x00" * (4 - len(raw))
            else:
                out += struct.pack("<I", ext_offsets[i][tag])
        nxt = ifd_offsets[i + 1] if i + 1 < len(level_entries) else 0
        out += struct.pack("<I", nxt)
    for i, e in enumerate(level_entries):
        for tag, ftype, values in e:
            raw = _pack_values(ftype, values)
            if len(raw) > 4:
                out += b"\x00" * (ext_offsets[i][tag] - len(out))
                out += raw
    for tiles in level_tiles:
        out += b"".join(tiles)

    with open(path, "wb") as f:
        f.write(out)


# ------------------------------------------------------------- reading
def read_tags(path: str) -> list[dict]:
    """Tag dictionaries of every IFD (values decoded, arrays as
    tuples) — the header-assertion surface for tests."""
    buf = open(path, "rb").read()
    if buf[:4] != b"II*\x00":
        raise ValueError("not a little-endian classic TIFF")
    ifds = []
    (off,) = struct.unpack_from("<I", buf, 4)
    while off:
        (n,) = struct.unpack_from("<H", buf, off)
        tags = {}
        for i in range(n):
            tag, ftype, count = struct.unpack_from("<HHI", buf, off + 2 + 12 * i)
            nbytes = count * _TYPE_SIZE[ftype]
            vpos = off + 2 + 12 * i + 8
            if nbytes > 4:
                (vpos,) = struct.unpack_from("<I", buf, vpos)
            raw = buf[vpos:vpos + nbytes]
            if ftype == T_ASCII:
                tags[tag] = raw.rstrip(b"\x00").decode()
            else:
                fmt = {T_SHORT: "<H", T_LONG: "<I", T_DOUBLE: "<d"}[ftype]
                vals = tuple(
                    struct.unpack_from(fmt, raw, k * _TYPE_SIZE[ftype])[0]
                    for k in range(count)
                )
                tags[tag] = vals[0] if count == 1 else vals
        ifds.append(tags)
        (off,) = struct.unpack_from("<I", buf, off + 2 + 12 * n)
    return ifds


def read_geotiff(path: str) -> tuple[np.ndarray, dict]:
    """(full-resolution array, main-IFD tags) — decompress + untile."""
    buf = open(path, "rb").read()
    tags = read_tags(path)[0]
    h, w = tags[TAG_IMAGE_LENGTH], tags[TAG_IMAGE_WIDTH]
    tw, th = tags[TAG_TILE_WIDTH], tags[TAG_TILE_LENGTH]
    offs = tags[TAG_TILE_OFFSETS]
    counts = tags[TAG_TILE_BYTE_COUNTS]
    offs = (offs,) if isinstance(offs, int) else offs
    counts = (counts,) if isinstance(counts, int) else counts
    tiles_across = math.ceil(w / tw)
    out = np.empty(
        (math.ceil(h / th) * th, tiles_across * tw), dtype="float64"
    )
    predictor = tags.get(TAG_PREDICTOR, 1)
    for i, (o, c) in enumerate(zip(offs, counts)):
        raw = zlib.decompress(buf[o:o + c])
        if predictor == PREDICTOR_FLOAT:
            block = _fp_unpredict(raw, th, tw)
        elif predictor == 1:
            block = np.frombuffer(raw, dtype="<f8").reshape(th, tw)
        else:
            raise ValueError(f"unsupported TIFF predictor {predictor}")
        r, col = divmod(i, tiles_across)
        out[r * th:(r + 1) * th, col * tw:(col + 1) * tw] = block
    return out[:h, :w], tags


def geotransform_of(tags: dict) -> list[float]:
    """Recover the GDAL-style affine from ModelPixelScale+Tiepoint."""
    sx, sy, _ = tags[TAG_MODEL_PIXEL_SCALE]
    _, _, _, ulx, uly, _ = tags[TAG_MODEL_TIEPOINT]
    return [ulx, sx, 0.0, uly, 0.0, -sy]
