"""MP4/ISO-BMFF container tests (functions/mp4codec.py).

The container must be TRANSPARENT: demuxing an encode_mp4 file yields
byte-ranges that JPEG-decode to exactly what decoding the individual
encode_jpeg payloads yields (the codec owns the loss; the container
owns none). Plus box-level structure asserts and the same
garbage-rejection contract as the other codecs (typed ValueError,
never struct.error/IndexError).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adcirctime2cogs_spark.functions import mp4codec
from adcirctime2cogs_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _frames(n, h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype="u1")


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_container_is_transparent(n, h, w, fps, seed):
    """decode(encode_mp4(frames)) == [decode_jpeg(encode_jpeg(f))]:
    whatever the lossy codec does, the container adds nothing — which
    only holds if every stsc/stco/stsz sample range is byte-exact."""
    frames = _frames(n, h, w, seed)
    out, r = mp4codec.decode_mp4(mp4codec.encode_mp4(frames, fps=fps))
    assert r == fps
    ref = np.stack([decode_jpeg(encode_jpeg(f, quality=90)) for f in frames])
    assert np.array_equal(out, ref)


def test_mp4_box_structure():
    n = 7  # 3 chunks: 3 + 3 + 1 -> two stsc runs
    data = mp4codec.encode_mp4(_frames(n, 16, 16), fps=10)
    assert data[4:8] == b"ftyp" and data[8:12] == b"isom"
    boxes = {k: (b, e) for k, b, e in mp4codec._walk(data, 0, len(data))}
    assert set(boxes) >= {b"ftyp", b"mdat", b"moov"}
    # drill to stbl and check the chunk map really has two runs
    moov = boxes[b"moov"]
    trak = mp4codec._find(data, *moov, b"trak")
    mdia = mp4codec._find(data, *trak, b"mdia")
    minf = mp4codec._find(data, *mdia, b"minf")
    stbl = mp4codec._find(data, *minf, b"stbl")
    tabs = {k: (b, e) for k, b, e in mp4codec._walk(data, *stbl)}
    assert data[tabs[b"stsd"][0] + 12:tabs[b"stsd"][0] + 16] == b"jpeg"
    (n_runs,) = struct.unpack_from(">I", data, tabs[b"stsc"][0] + 4)
    assert n_runs == 2  # (1, 3, 1) then (3, 1, 1)
    _uni, count = struct.unpack_from(">II", data, tabs[b"stsz"][0] + 4)
    assert count == n
    (n_chunks,) = struct.unpack_from(">I", data, tabs[b"stco"][0] + 4)
    assert n_chunks == 3


def test_mp4_trailing_largesize_box_parses():
    """A 64-bit largesize box (size field == 1) must be walked, not
    choke the top-level scan — real writers emit these for >4 GiB
    mdats."""
    data = mp4codec.encode_mp4(_frames(2, 8, 8), fps=5)
    body = b"\x00" * 16
    free = struct.pack(">I", 1) + b"free" + struct.pack(
        ">Q", 16 + len(body)) + body
    out, fps = mp4codec.decode_mp4(data + free)
    assert out.shape[0] == 2 and fps == 5


def test_mp4_empty_and_errors():
    out, fps = mp4codec.decode_mp4(
        mp4codec.encode_mp4(np.empty((0, 8, 8, 3), dtype="u1"), fps=9)
    )
    assert out.shape[0] == 0 and fps == 9
    with pytest.raises(ValueError):
        mp4codec.encode_mp4(np.zeros((2, 8, 8), dtype="u1"))
    with pytest.raises(ValueError):
        mp4codec.encode_mp4(np.zeros((1, 8, 8, 3), dtype="u1"), fps=0)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(b"\x00\x00\x00\x08free")  # no ftyp
    # moov missing
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(ftyp)
    # declared size past EOF
    good = mp4codec.encode_mp4(_frames(1, 8, 8), fps=5)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(good[:40])
    # unsupported sample fourcc
    bad = good.replace(b"jpeg", b"avc1")
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(bad)


@settings(max_examples=150, deadline=None)
@given(
    junk=st.binary(min_size=0, max_size=300),
    prefix=st.sampled_from([
        b"",
        struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0),
        struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
        + struct.pack(">I", 24) + b"moov",
    ]),
)
def test_mp4_decoder_rejects_garbage(junk, prefix):
    try:
        mp4codec.decode_mp4(prefix + junk)
    except ValueError:
        pass
