"""Property-based round-trips (hypothesis) for the round-6 pure-Python
codecs: classic NetCDF, tiled GeoTIFF, BMP/PPM, and WAV. Hand-picked
cases pin the spec corners; these pin the parametric space — arbitrary
shapes, dtypes, and values must survive encode -> decode bit-exactly.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from adcirctime2cogs_spark.functions import audiocodec as ac
from adcirctime2cogs_spark.functions import imagecodec as ic
from adcirctime2cogs_spark.sinks import geotiff as gt
from adcirctime2cogs_spark.sources import netcdf3 as nc3


@st.composite
def _uint8_image(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype="uint8")


@settings(max_examples=40, deadline=None)
@given(_uint8_image())
def test_bmp_roundtrip_any_shape(img):
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(_uint8_image())
def test_ppm_roundtrip_any_shape(img):
    arr, fmt = ic.decode_image(ic.encode_ppm(img))
    assert fmt == "ppm" and np.array_equal(arr, img)


@settings(max_examples=40, deadline=None)
@given(
    _uint8_image(),
    st.integers(1, 50),
    st.integers(1, 50),
)
def test_resize_nearest_properties(img, ow, oh):
    out = ic.resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel exists somewhere in the source (nearest picks,
    # never blends)
    src = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in src for p in out.reshape(-1, 3)[:20])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 2000).map(lambda n: n),
    st.integers(1000, 96000),
    st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype="int16")
    back, r = ac.decode_wav(ac.encode_wav(s, rate))
    assert r == rate and np.array_equal(back, s)


@settings(max_examples=25, deadline=None)
@given(
    n_rec=st.integers(1, 6),
    n_node=st.integers(1, 30),
    version=st.sampled_from([1, 2, 5]),
    seed=st.integers(0, 2**31 - 1),
)
def test_netcdf_roundtrip_any_shape(tmp_path_factory, n_rec, n_node, version, seed):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(n_rec, n_node))
    t = np.arange(n_rec, dtype="float64") * 60.0
    fixed = rng.normal(size=n_node)
    p = str(tmp_path_factory.mktemp("nc") / "f.nc")
    nc3.write_classic(
        p,
        dims=[("time", None), ("node", n_node)],
        variables=[
            {"name": "time", "dims": ["time"], "data": t,
             "atts": {"units": "seconds since 2024-01-01 00:00:00"}},
            {"name": "x", "dims": ["node"], "data": fixed},
            {"name": "zeta", "dims": ["time", "node"], "data": vals},
        ],
        version=version,
    )
    h = nc3.read_header_file(p)
    assert h.numrecs == n_rec and dict(h.dims)["node"] == n_node
    assert np.array_equal(nc3.read_var(p, h, "zeta"), vals)
    assert np.array_equal(nc3.read_var(p, h, "x"), fixed)
    # per-record slabs agree with the full gather at every record
    for r in range(n_rec):
        assert np.array_equal(nc3.read_record_slab(p, h, "zeta", r), vals[r])


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 300),
    w=st.integers(1, 300),
    seed=st.integers(0, 2**31 - 1),
)
def test_geotiff_roundtrip_any_shape(tmp_path_factory, h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.normal(size=(h, w))
    # sprinkle NaNs — nodata must survive deflate + tiling
    mask = rng.random(size=(h, w)) < 0.1
    arr[mask] = np.nan
    p = str(tmp_path_factory.mktemp("tif") / "t.tif")
    gt.write_geotiff(p, arr, [0.0, 0.01, 0.0, float(h) * 0.01, 0.0, -0.01])
    back, tags = gt.read_geotiff(p)
    assert back.shape == (h, w)
    assert np.array_equal(back, arr, equal_nan=True)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_netcdf_parser_rejects_garbage_with_typed_errors(junk):
    """Fuzz: arbitrary bytes behind a correct magic must terminate
    quickly with one of the codec's TYPED errors — never a KeyError /
    UnicodeDecodeError / hang (callers dispatch on NotClassicNetCDF to
    reach the HDF5 fallback chain)."""
    try:
        nc3.parse_header(b"CDF\x01" + junk)
    except (nc3.NotClassicNetCDF, nc3.TruncatedHeader):
        pass


@settings(max_examples=200, deadline=None)
@given(
    junk=st.binary(min_size=0, max_size=256),
    prefix=st.sampled_from(
        [b"", b"BM", b"P6\n", b"RIFF\x20\x00\x00\x00WAVE",
         b"RIFF\x20\x00\x00\x00WAVEfmt "]
    ),
)
def test_image_audio_decoders_reject_garbage(junk, prefix):
    """Fuzz past the magic too: truncated/corrupt chunk structures must
    raise ValueError, never struct.error / index crashes."""
    for dec in (ic.decode_image, ac.decode_wav):
        try:
            dec(prefix + junk)
        except ValueError:
            pass


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    fps=st.integers(1, 120),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_any_shape(n, h, w, fps, seed):
    from adcirctime2cogs_spark.functions import videocodec as vc

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype="u1")
    out, r = vc.decode_avi(vc.encode_avi(frames, fps))
    assert r == fps and np.array_equal(out, frames)


@settings(max_examples=150, deadline=None)
@given(
    junk=st.binary(min_size=0, max_size=200),
    prefix=st.sampled_from(
        [b"", b"RIFF\x20\x00\x00\x00AVI ",
         b"RIFF\x40\x00\x00\x00AVI LIST\x10\x00\x00\x00hdrlavih"]
    ),
)
def test_avi_decoder_rejects_garbage(junk, prefix):
    from adcirctime2cogs_spark.functions import videocodec as vc

    try:
        vc.decode_avi(prefix + junk)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(
    junk=st.binary(min_size=0, max_size=300),
    prefix=st.sampled_from(
        [b"", b"\x89HDF\r\n\x1a\n",
         b"\x89HDF\r\n\x1a\n" + b"\x00" * 88,  # v0 superblock of zeros
         b"\x89HDF\r\n\x1a\n\x02\x08\x08\x00" + b"\x00" * 36]  # v2
    ),
)
def test_hdf5_reader_rejects_garbage(junk, prefix):
    """Corrupt/truncated HDF5 structures raise the module's typed
    ValueErrors (NotHDF5/HDF5Error), never struct.error or index
    crashes — same contract as the image/audio/video codecs."""
    from adcirctime2cogs_spark.sources import hdf5

    try:
        hdf5.H5File(prefix + junk)
    except ValueError:
        pass
    except RecursionError:
        pass  # pathological self-referencing B-tree/continuation loops


@given(
    n_rec=st.integers(1, 6),
    n_node=st.integers(1, 30),
    layout=st.sampled_from(["v1", "latest"]),
    compress=st.sampled_from([None, 6]),
    shuffle=st.booleans(),
    time_chunk=st.integers(1, 3),
    node_chunk=st.sampled_from([None, 2, 7]),
    static_chunk=st.sampled_from([None, 3]),
    n_gatts=st.sampled_from([0, 3, 12, 40]),
    big_attr=st.booleans(),
    heap_indirect=st.booleans(),
    heap_filter=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_netcdf4_roundtrip_any_layout(tmp_path_factory, n_rec, n_node,
                                      layout, compress, shuffle,
                                      time_chunk, node_chunk,
                                      static_chunk, n_gatts, big_attr,
                                      heap_indirect, heap_filter,
                                      seed):
    """Property sweep of the NetCDF-4 writer/reader pair across the
    layout matrix: both metadata generations, deflate/shuffle on and
    off, record/column/static chunking, attribute counts spanning
    compact (<=8) and dense fractal-heap storage, and an oversized
    history attribute that forces a HUGE heap ID when dense. Values,
    dims, and every attribute must round-trip exactly whatever the
    combination."""
    from adcirctime2cogs_spark.sources import hdf5

    rng = np.random.default_rng(seed)
    t = np.arange(n_rec, dtype="float64") * 30.0
    zeta = rng.normal(size=(n_rec, n_node))
    depth = rng.normal(size=n_node)
    gatts = {f"g{i:03d}": np.float64(i * 2) for i in range(n_gatts)}
    if big_attr:
        gatts["history"] = "h" * 5000
    p = str(tmp_path_factory.mktemp("h5prop") / "f.nc")
    hdf5.write_netcdf4(
        p,
        dims={"time": None, "node": n_node},
        variables={
            "time": (("time",), t,
                     {"units": "seconds since 2024-01-01"}),
            "depth": (("node",), depth, {}),
            "zeta": (("time", "node"), zeta, {}),
        },
        gatts=gatts,
        compress=compress,
        shuffle=shuffle and compress is not None,
        time_chunk=time_chunk,
        node_chunk=node_chunk,
        layout=layout,
        static_chunk=static_chunk if layout == "latest" else None,
        heap_indirect=heap_indirect and layout == "latest",
        heap_filter=heap_filter and layout == "latest",
    )
    f = hdf5.H5File(p)
    assert np.array_equal(f.read("zeta"), zeta)
    assert np.array_equal(f.read("depth"), depth)
    assert np.array_equal(f.read("time"), t)
    got_g = {k: v for k, v in f.root_attrs.items() if k.startswith("g")}
    assert got_g == gatts if not big_attr else \
        got_g == {k: v for k, v in gatts.items() if k != "history"}
    if big_attr:
        assert f.root_attrs["history"] == "h" * 5000


# ------------------------------------------------------------- GIF
def _pal_image(rng, h, w, ncolors):
    pal = rng.integers(0, 256, (ncolors, 3)).astype("uint8")
    idx = rng.integers(0, ncolors, (h, w))
    return pal[idx]


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ncolors=st.sampled_from([1, 2, 3, 17, 128, 256]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_any_shape(h, w, ncolors, interlace, seed):
    """GIF round-trips losslessly at any shape, palette size (1..256
    colors exercises every LZW min-code-size), and interlacing."""
    from adcirctime2cogs_spark.functions.gifcodec import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    img = _pal_image(rng, h, w, ncolors)
    rt = decode_gif(encode_gif(img, interlace=interlace))
    assert rt.shape == (1, h, w, 3)
    assert np.array_equal(rt[0], img)


def test_gif_lzw_table_overflow_and_animation():
    """A 256-color 120x200 noise image drives the LZW table past 4096
    codes (the clear-and-rebuild path); a three-frame animation with
    per-frame LOCAL palettes round-trips frame-exact; decode_image
    dispatches GIF by magic and returns the first frame."""
    from adcirctime2cogs_spark.functions.gifcodec import (
        decode_gif,
        encode_gif,
    )
    from adcirctime2cogs_spark.functions.imagecodec import decode_image

    rng = np.random.default_rng(11)
    big = _pal_image(rng, 120, 200, 256)
    rt = decode_gif(encode_gif(big))
    assert np.array_equal(rt[0], big)
    frames = np.stack([
        _pal_image(rng, 20, 30, 64),
        _pal_image(rng, 20, 30, 64),
        _pal_image(rng, 20, 30, 200),
    ])
    rt2 = decode_gif(encode_gif(frames, local_tables=True))
    assert np.array_equal(rt2, frames)
    arr, fmt = decode_image(encode_gif(big))
    assert fmt == "gif" and np.array_equal(arr, big)


@given(st.binary(min_size=0, max_size=256))
def test_gif_decoder_rejects_garbage(junk):
    """Garbage after a GIF signature raises the codec's typed error —
    GIFError exactly, never bare IndexError/struct.error/ValueError
    (ADVICE r09: a buffer truncated inside a color table used to
    escape as np.frombuffer's plain ValueError)."""
    from adcirctime2cogs_spark.functions.gifcodec import (
        GIFError,
        decode_gif,
    )

    try:
        decode_gif(b"GIF89a" + junk)
    except GIFError:
        pass


def test_gif_truncated_color_table_raises_typed_error():
    """The exact ADVICE r09 case: a GIF cut mid-global-color-table
    makes np.frombuffer raise ValueError; decode_gif must surface it
    as GIFError."""
    import pytest

    from adcirctime2cogs_spark.functions.gifcodec import (
        GIFError,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(7)
    full = encode_gif(_pal_image(rng, 8, 8, 64))
    truncated = full[:13 + 10]  # header + 10 of 192 palette bytes
    with pytest.raises(GIFError):
        decode_gif(truncated)


# ------------------------------------------- review-r10 codec pins
def test_jpeg_zero_sampling_factor_raises_typed_error():
    """A SOF with sampling factor 0 must raise JPEGError, not a raw
    ZeroDivisionError that escapes ValueError-catching callers."""
    import pytest

    from adcirctime2cogs_spark.functions.jpegcodec import (
        JPEGError,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    good = bytearray(encode_jpeg(rng.integers(0, 255, (16, 16, 3),
                                              dtype="u1")))
    at = bytes(good).index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then per-comp
    # [id, hv, tq] — zero the first component's hv byte
    good[at + 11] = 0
    with pytest.raises(JPEGError):
        decode_jpeg(bytes(good))


def test_jpeg_truncated_dqt_raises_named_error():
    """A DQT shorter than 65 bytes raises the NAMED 'truncated DQT'
    error (the old size check sat after the indexing that raised
    IndexError first — dead code)."""
    import pytest

    from adcirctime2cogs_spark.functions.jpegcodec import (
        JPEGError,
        decode_jpeg,
    )

    # SOI + DQT declaring 10 body bytes, then EOI
    raw = b"\xff\xd8" + b"\xff\xdb\x00\x0c" + b"\x00" * 10 + b"\xff\xd9"
    with pytest.raises(JPEGError, match="truncated DQT"):
        decode_jpeg(raw)


def test_avi_audio_stream_does_not_clobber_video_header():
    """An AVI carrying an audio strl AFTER the video strl (the common
    capture layout) must decode the video — the audio WAVEFORMATEX
    strf used to be parsed as BITMAPINFOHEADER, clobbering w/h."""
    import struct

    from adcirctime2cogs_spark.functions.videocodec import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (2, 8, 10, 3), dtype="u1")
    raw = bytearray(encode_avi(frames, fps=5, codec="DIB"))
    # append an audio strl LIST into the hdrl LIST: strh('auds') +
    # strf(WAVEFORMATEX for 44100 Hz stereo 16-bit)
    strh = b"strh" + struct.pack("<I", 48) + b"auds" + b"\x00" * 44
    wf = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16) + b"\x00" * 8
    strf = b"strf" + struct.pack("<I", len(wf)) + wf
    strl_body = b"strl" + strh + strf
    alist = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    # hdrl LIST starts at offset 12; grow its size and RIFF's
    (hdrl_size,) = struct.unpack_from("<I", raw, 16)
    insert_at = 20 + hdrl_size
    raw[16:20] = struct.pack("<I", hdrl_size + len(alist))
    raw[insert_at:insert_at] = alist
    raw[4:8] = struct.pack("<I", len(raw) - 8)
    out, fps = decode_avi(bytes(raw))
    assert out.shape == (2, 8, 10, 3) and fps == 5
    assert np.array_equal(out, frames)


def test_gif_transparency_composites_and_disposal_raises():
    """GCE transparency decodes (transparent pixels keep the canvas);
    restore-to-background disposal raises the typed error instead of
    silently corrupting frames (review r10)."""
    import pytest

    from adcirctime2cogs_spark.functions.gifcodec import (
        GIFError,
        decode_gif,
        encode_gif,
    )

    base = np.zeros((4, 4, 3), dtype="u1")
    base[:, :] = (10, 20, 30)
    raw = bytearray(encode_gif(np.stack([base, base])))
    # the encoder writes one GCE (21 F9 04 ...) per frame of an
    # animation; set frame 2's transparency flag + index = palette
    # slot of (10,20,30) so every pixel is transparent
    at = bytes(raw).index(b"\x21\xf9\x04", bytes(raw).index(b"\x21\xf9\x04") + 1)
    raw[at + 3] |= 0x01      # transparency flag
    raw[at + 6] = 0          # transparent color index (sole color)
    out = decode_gif(bytes(raw))
    assert np.array_equal(out[1], out[0])  # canvas carried through
    # disposal=2 (restore to background) is out of scope, typed
    raw[at + 3] = (raw[at + 3] & ~0x1C) | (2 << 2)
    raw[at + 3] &= ~0x01
    with pytest.raises(GIFError, match="disposal method 2"):
        decode_gif(bytes(raw))


def test_gif_global_palette_mapping_vectorized_matches():
    """The vectorized packed-int global-palette mapping round-trips a
    multi-frame shared-palette animation exactly and still raises the
    typed error for an out-of-table color."""
    import pytest

    from adcirctime2cogs_spark.functions.gifcodec import (
        GIFError,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 255, (16, 3), dtype="u1")
    # frame 0 must USE every pool color: the global table is frame 0's
    # observed palette
    f0 = pal[np.arange(42).reshape(6, 7) % 16]
    f1 = pal[rng.integers(0, 16, (6, 7))]
    rt = decode_gif(encode_gif(np.stack([f0, f1])))
    assert np.array_equal(rt[0], f0) and np.array_equal(rt[1], f1)
    bad = f1.copy()
    bad[0, 0] = (255 - pal[:, 0].max(), 7, 7)
    with pytest.raises(GIFError, match="outside the global table"):
        encode_gif(np.stack([f0, bad]))


def test_mp4_truncated_mdhd_raises_typed_error():
    """A truncated mdhd raises ValueError naming the box instead of
    silently reading the sibling box's bytes as the timescale."""
    import struct

    import pytest

    from adcirctime2cogs_spark.functions.mp4codec import (
        decode_mp4,
        encode_mp4,
    )

    rng = np.random.default_rng(9)
    raw = bytearray(encode_mp4(rng.integers(0, 255, (1, 8, 8, 3),
                                            dtype="u1"), fps=5))
    at = bytes(raw).index(b"mdhd")
    # shrink the mdhd box to 8 bytes of body (needs 12 for v0),
    # padding the removed span as a free box so offsets stay valid
    (old_size,) = struct.unpack_from(">I", raw, at - 4)
    new_size = 8 + 8
    raw[at - 4:at] = struct.pack(">I", new_size)
    freed = old_size - new_size
    raw[at - 4 + new_size:at - 4 + new_size] = b""  # no byte moves
    raw[at + new_size - 4:at + new_size - 4] = b""
    # overwrite the tail of the old mdhd with a 'free' box header
    free_at = at - 4 + new_size
    raw[free_at:free_at + 8] = struct.pack(">I", freed) + b"free"
    with pytest.raises(ValueError, match="truncated mdhd"):
        decode_mp4(bytes(raw))


def test_ppm_header_comments_parse():
    """Netpbm '#' comments between header tokens parse (GIMP emits
    them); the raster bytes land at the right offset."""
    from adcirctime2cogs_spark.functions.imagecodec import decode_ppm

    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (3, 5, 3), dtype="u1")
    raw = (b"P6\n# CREATOR: GIMP PNM Filter Version 1.1\n5 3\n"
           b"# another note\n255\n" + img.tobytes())
    assert np.array_equal(decode_ppm(raw), img)
    gray = rng.integers(0, 255, (3, 5), dtype="u1")
    raw2 = b"P5 # inline\n5 3 255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(raw2), gray)
