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


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
    fragmented=st.booleans(),
)
def test_mp4_container_is_transparent(n, h, w, fps, seed, fragmented):
    """decode(encode_mp4(frames)) == [decode_jpeg(encode_jpeg(f))] for
    BOTH layouts: whatever the lossy codec does, the container adds
    nothing — which only holds if every sample byte range (stsc/stco/
    stsz classic, tfhd/trun fragmented) is byte-exact."""
    frames = _frames(n, h, w, seed)
    data = mp4codec.encode_mp4(frames, fps=fps, fragmented=fragmented)
    out, r = mp4codec.decode_mp4(data)
    assert r == fps
    ref = np.stack([decode_jpeg(encode_jpeg(f, quality=90)) for f in frames])
    assert np.array_equal(out, ref)


def test_fmp4_structure_and_corruption():
    """Fragmented layout: 7 frames -> 3 moof/mdat pairs after an
    empty-stbl moov; corrupting the trun sample count or stripping
    tfhd's base addressing must raise the typed error."""
    data = mp4codec.encode_mp4(_frames(7, 8, 8), fps=5, fragmented=True)
    kinds = [k for k, _b, _e in mp4codec._walk(data, 0, len(data))]
    assert kinds == [b"ftyp", b"moov", b"moof", b"mdat", b"moof",
                     b"mdat", b"moof", b"mdat"]
    ref, _ = mp4codec.decode_mp4(mp4codec.encode_mp4(_frames(7, 8, 8),
                                                     fps=5))
    out, fps = mp4codec.decode_mp4(data)
    assert fps == 5 and np.array_equal(out, ref)
    # trun count larger than the box -> typed error
    bad = bytearray(data)
    struct.pack_into(">I", bad, data.find(b"trun") + 8, 100_000)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(bytes(bad))
    # tfhd with neither base-data-offset nor default-base-is-moof
    bad2 = bytearray(data)
    struct.pack_into(">I", bad2, data.find(b"tfhd") + 4, 0)
    with pytest.raises(ValueError):
        mp4codec.decode_mp4(bytes(bad2))


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


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _rebuild(data, pos, end, leaf_fn):
    """Re-serialize the box tree in [pos, end), passing each leaf box
    through leaf_fn(kind, body) -> (kind, body) — the test-side mux
    surgeon for forcing co64/largesize layouts the encoder doesn't
    emit."""
    out = []
    for kind, b, e in mp4codec._walk(data, pos, end):
        if kind in _CONTAINERS:
            body = _rebuild(data, b, e, leaf_fn)
        else:
            kind, body = leaf_fn(kind, data[b:e])
        out.append(struct.pack(">I", len(body) + 8) + kind + body)
    return b"".join(out)


def test_mp4_largesize_mdat_decodes_and_corrupt_largesize_rejected():
    """Drive decode THROUGH a 64-bit largesize mdat (the >4 GiB-file
    layout): rewrite the mdat header from 4-byte to largesize form,
    shift every stco chunk offset by the 8 inserted bytes, and the
    demux must still produce identical frames. A largesize below the
    16-byte header minimum must raise the typed error."""
    data = mp4codec.encode_mp4(_frames(4, 8, 16), fps=5)
    ref, _ = mp4codec.decode_mp4(data)
    boxes = {k: (b, e) for k, b, e in mp4codec._walk(data, 0, len(data))}
    mb, me = boxes[b"mdat"]
    mdat64 = (struct.pack(">I", 1) + b"mdat"
              + struct.pack(">Q", 16 + (me - mb)) + data[mb:me])

    def shift_stco(kind, body):
        if kind != b"stco":
            return kind, body
        (n,) = struct.unpack_from(">I", body, 4)
        offs = struct.unpack_from(f">{n}I", body, 8)
        return kind, body[:8] + b"".join(
            struct.pack(">I", o + 8) for o in offs
        )

    moov_b, moov_e = boxes[b"moov"]
    moov = struct.pack(">I", moov_e - moov_b + 8) + b"moov" + _rebuild(
        data, moov_b, moov_e, shift_stco
    )
    rebuilt = data[:mb - 8] + mdat64 + moov
    out, fps = mp4codec.decode_mp4(rebuilt)
    assert fps == 5 and np.array_equal(out, ref)
    # an impossible largesize (12 < 16-byte header) must be rejected,
    # and the walker must really visit a trailing largesize box
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    walked = [k for k, _b, _e in
              mp4codec._walk(data + free, 0, len(data) + len(free))]
    assert walked[-1] == b"free"
    bad = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 12)
    with pytest.raises(ValueError):
        list(mp4codec._walk(data + bad, 0, len(data) + len(bad)))


def test_mp4_co64_layout_decodes():
    """stco swapped for a 64-bit co64 table (same offsets, 8-byte
    entries) must decode identically — the co64 read path is real,
    not dead code."""
    data = mp4codec.encode_mp4(_frames(5, 8, 8), fps=7)
    ref, _ = mp4codec.decode_mp4(data)

    def to_co64(kind, body):
        if kind != b"stco":
            return kind, body
        (n,) = struct.unpack_from(">I", body, 4)
        offs = struct.unpack_from(f">{n}I", body, 8)
        return b"co64", body[:8] + b"".join(
            struct.pack(">Q", o) for o in offs
        )

    boxes = {k: (b, e) for k, b, e in mp4codec._walk(data, 0, len(data))}
    moov_b, moov_e = boxes[b"moov"]
    new_moov_body = _rebuild(data, moov_b, moov_e, to_co64)
    rebuilt = (data[:moov_b - 8]
               + struct.pack(">I", len(new_moov_body) + 8) + b"moov"
               + new_moov_body)
    assert b"co64" in rebuilt and b"stco" not in rebuilt
    out, fps = mp4codec.decode_mp4(rebuilt)
    assert fps == 7 and np.array_equal(out, ref)


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


def test_mp4_corrupt_sample_tables_raise_typed_errors():
    """Targeted corruption of each sample-table count/index field must
    produce the module's ValueError — never struct.error, IndexError,
    or a silent giant allocation (the uniform-stsz DoS shape)."""
    good = mp4codec.encode_mp4(_frames(7, 8, 8), fps=5)

    def patched(tag, at, fmt, *vals):
        buf = bytearray(good)
        struct.pack_into(fmt, buf, good.find(tag) + at, *vals)
        return bytes(buf)

    cases = [
        patched(b"stsz", 12, ">I", 100_000),       # entry count > box
        patched(b"stsz", 8, ">II", 1, 0xFFFFFFFF),  # uniform-size DoS
        patched(b"stsc", 12, ">I", 50),            # run outside stco
        patched(b"stsc", 12, ">I", 0),             # 1-based index 0
        patched(b"stco", 8, ">I", 100_000),        # chunk count > box
        patched(b"stts", 8, ">I", 100_000),        # stts count > box
    ]
    for bad in cases:
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


def test_fmp4_multi_traf_multi_trun_and_default_size():
    """A hand-built DASH-shaped fragment: an audio traf (track 2) the
    reader must SKIP, then the video traf carrying TWO truns — the
    first with per-sample sizes, the second using the tfhd
    default-sample-size — all under one moof. Every sample must land
    byte-exactly; repeated with the moof under a 64-bit largesize
    header, which shifts the default-base-is-moof base."""
    frames = _frames(3, 8, 8, seed=11)
    samples = [encode_jpeg(f, quality=90) for f in frames]
    base_file = mp4codec.encode_mp4(frames, fps=5, fragmented=True)
    boxes = list(mp4codec._walk(base_file, 0, len(base_file)))
    moov_b, moov_e = next((b, e) for k, b, e in boxes if k == b"moov")
    head = base_file[:moov_e]  # ftyp + moov (empty stbl + mvex)

    def build_moof(extra_base_shift):
        mfhd = mp4codec._full(b"mfhd", 0, 0, struct.pack(">I", 1))
        # audio traf: track 2, has its own trun the reader must ignore
        a_tfhd = mp4codec._full(b"tfhd", 0, 0x020000, struct.pack(">I", 2))
        a_trun = mp4codec._full(b"trun", 0, 0x000201,
                                struct.pack(">Ii", 1, 0)
                                + struct.pack(">I", 4))
        a_traf = mp4codec._box(b"traf", a_tfhd + a_trun)
        # video traf: tfhd carries default-sample-size for trun 2
        v_tfhd = mp4codec._full(
            b"tfhd", 0, 0x020010,
            struct.pack(">II", 1, len(samples[2])),
        )
        trun1 = mp4codec._full(b"trun", 0, 0x000201,
                               struct.pack(">Ii", 2, 0)
                               + struct.pack(">II", len(samples[0]),
                                             len(samples[1])))
        trun2 = mp4codec._full(b"trun", 0, 0x000001,
                               struct.pack(">Ii", 1, 0))
        v_traf = mp4codec._box(b"traf", v_tfhd + trun1 + trun2)
        moof = bytearray(mp4codec._box(b"moof", mfhd + a_traf + v_traf))
        # patch the three data_offsets (moof-start relative)
        mdat_body = len(moof) + extra_base_shift + 8
        p1 = bytes(moof).find(b"trun")          # audio trun
        struct.pack_into(">i", moof, p1 + 12, mdat_body)
        p2 = bytes(moof).find(b"trun", p1 + 1)  # video trun 1
        struct.pack_into(">i", moof, p2 + 12, mdat_body)
        p3 = bytes(moof).find(b"trun", p2 + 1)  # video trun 2
        struct.pack_into(">i", moof, p3 + 12,
                         mdat_body + len(samples[0]) + len(samples[1]))
        return bytes(moof)

    mdat = mp4codec._box(b"mdat", b"".join(samples))
    ref = np.stack([decode_jpeg(s) for s in samples])

    out, fps = mp4codec.decode_mp4(head + build_moof(0) + mdat)
    assert fps == 5 and np.array_equal(out, ref)

    # same fragment under a largesize moof header (+8-byte header)
    moof = build_moof(8)
    large = (struct.pack(">I", 1) + b"moof"
             + struct.pack(">Q", len(moof) + 8) + moof[8:])
    out2, _ = mp4codec.decode_mp4(head + large + mdat)
    assert np.array_equal(out2, ref)


def test_mp4_foreign_major_brands_accepted_and_missing_ftyp_rejected():
    """Round-9 advice fix: real crawled fMP4/DASH carries major brands
    like iso5/iso6/dash — the decoder must not allowlist brand VALUES
    (structure, not branding, is the validation). A file with no ftyp
    box at all is still rejected with the typed error."""
    frames = _frames(2, 8, 8, seed=3)
    ref, _ = mp4codec.decode_mp4(mp4codec.encode_mp4(frames, fps=4))
    for brand in (b"iso5", b"iso6", b"dash", b"msdh", b"XXXX"):
        for fragmented in (False, True):
            data = bytearray(mp4codec.encode_mp4(frames, fps=4,
                                                 fragmented=fragmented))
            assert data[4:8] == b"ftyp"
            data[8:12] = brand
            out, fps = mp4codec.decode_mp4(bytes(data))
            assert fps == 4 and np.array_equal(out, ref)
    # strip the ftyp box entirely -> typed rejection
    data = mp4codec.encode_mp4(frames, fps=4)
    (ftyp_len,) = struct.unpack_from(">I", data, 0)
    with pytest.raises(ValueError, match="ftyp"):
        mp4codec.decode_mp4(data[ftyp_len:])


def _hide_tkhd(data: bytes) -> bytes:
    """Rename every tkhd box to 'free' so the decoder cannot learn the
    video track id from the movie header."""
    out = bytearray(data)
    pos = 0
    while True:
        pos = out.find(b"tkhd", pos)
        if pos < 0:
            return bytes(out)
        out[pos:pos + 4] = b"free"
        pos += 4


def test_fmp4_without_tkhd_single_track_decodes():
    """Advice fix: with no usable tkhd, a single-track fragmented file
    must still decode — all trafs agree on one track id, so that id
    IS the video track."""
    frames = _frames(3, 8, 8, seed=5)
    data = mp4codec.encode_mp4(frames, fps=6, fragmented=True)
    ref, _ = mp4codec.decode_mp4(data)
    out, fps = mp4codec.decode_mp4(_hide_tkhd(data))
    assert fps == 6 and np.array_equal(out, ref)


def test_fmp4_without_tkhd_multi_track_raises_typed_error():
    """Advice fix: with no usable tkhd AND trafs carrying distinct
    track ids (a muxed audio+video file), the decoder must raise the
    typed 'cannot identify video track' error instead of feeding audio
    samples to the JPEG decoder."""
    frames = _frames(4, 8, 8, seed=9)
    data = bytearray(_hide_tkhd(
        mp4codec.encode_mp4(frames, fps=6, fragmented=True)
    ))
    # retag the SECOND fragment's tfhd as track 2
    first = data.find(b"tfhd")
    second = data.find(b"tfhd", first + 1)
    assert second > 0
    struct.pack_into(">I", data, second + 8, 2)
    with pytest.raises(ValueError, match="cannot identify video track"):
        mp4codec.decode_mp4(bytes(data))
