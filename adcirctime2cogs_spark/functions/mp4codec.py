"""Pure-Python MP4 / ISO-BMFF video container — struct only, no media
library.

Closes the compressed-container gap next to videocodec.py's AVI: the
ISO base media file format (public ISO/IEC 14496-12) carrying
Photo-JPEG video samples, each sample a complete baseline JPEG decoded
by functions/jpegcodec.py. The reference has no media surface at all
(its 704 lines are xarray/dask regridding); this is part of the
training-data-pipeline extension, where crawled video arrives in MP4
far more often than AVI. An ffmpeg-equipped cluster swaps
``decode_mp4`` for its demuxer and nothing else changes.

Box tree written here (non-faststart ordering: ftyp, mdat, moov):

    ftyp            major 'isom', minor 0x200, compat ['isom','mp41']
    mdat            concatenated JPEG sample bytes
    moov
      mvhd  (v0)    timescale 1000, duration
      trak
        tkhd (v0)   flags=3 (enabled+in-movie), track 1, w/h 16.16
        mdia
          mdhd (v0) timescale = fps (1 tick per frame), lang 'und'
          hdlr      handler_type 'vide'
          minf
            vmhd (flags=1), dinf > dref > 'url ' (self-contained)
            stbl
              stsd  1 x VisualSampleEntry fourcc 'jpeg'
              stts  1 run (n samples, delta 1)
              stsc  chunk map — samples are grouped THREE per chunk
                    (short last chunk gets its own run), so the reader
                    must really walk first_chunk runs, not assume
                    1 chunk
              stsz  per-sample sizes
              stco  per-chunk absolute file offsets

The reader walks top-level boxes tolerantly (skips unknown boxes,
honors 64-bit largesize), locates the video trak by hdlr type, and
reconstructs per-sample byte ranges from the stsc/stco/stsz tables —
the part of MP4 that actually has teeth. Samples decode via
jpegcodec.decode_jpeg; fps comes from mdhd timescale / stts delta.
Declared sizes past EOF raise ValueError (corruption, not a feature).
"""

from __future__ import annotations

import struct

import numpy as np

_CHUNK_GROUP = 3  # samples per chunk the muxer writes (last may be short)


def _box(kind: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + kind + body


def _full(kind: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(kind, struct.pack(">I", (version << 24) | flags) + body)


def _visual_sample_entry(w: int, h: int) -> bytes:
    """VisualSampleEntry ('jpeg'): 6 reserved + data_reference_index,
    then the fixed visual fields (ISO 14496-12 §12.1.3)."""
    return _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHIII", 0, 0, 0, 0, 0)      # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                        # frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1),                 # depth, pre_defined
    )


def encode_mp4(frames: np.ndarray, fps: int = 10, quality: int = 90,
               fragmented: bool = False) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> MP4 bytes (Photo-JPEG track).

    Every sample is a standalone baseline JPEG (jpegcodec.encode_jpeg),
    i.e. all keyframes — the Motion-JPEG-in-MP4 shape QuickTime calls
    'jpeg'. Chunking is 3 samples per chunk so stsc/stco carry real
    structure. fragmented=True writes the fMP4/CMAF layout instead:
    empty sample tables in moov + mvex/trex defaults, then one
    moof(mfhd/traf(tfhd/trun)) + mdat pair per 3-sample fragment with
    default-base-is-moof addressing — the shape DASH segments and
    crawled streaming video arrive in."""
    from adcirctime2cogs_spark.functions.jpegcodec import encode_jpeg

    frames = np.ascontiguousarray(frames, dtype="u1")
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("encode_mp4 takes (n, h, w, 3) uint8 frames")
    if fps <= 0:
        raise ValueError("fps must be positive")
    n, h, w, _ = frames.shape
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    if fragmented:
        return _encode_fmp4(samples, fps, w, h)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)

    sample_entry = _visual_sample_entry(w, h)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0,
                 struct.pack(">III", 1, n, 1) if n else struct.pack(">I", 0))
    # chunk map: full chunks of _CHUNK_GROUP, plus one short-run entry
    n_full, rem = divmod(n, _CHUNK_GROUP)
    stsc_entries = []
    if n_full:
        stsc_entries.append((1, _CHUNK_GROUP, 1))
    if rem:
        stsc_entries.append((n_full + 1, rem, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                 + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    # absolute file offsets: mdat body starts right after ftyp + header
    base = len(ftyp) + 8
    offsets, pos = [], base
    for i, s in enumerate(samples):
        if i % _CHUNK_GROUP == 0:
            offsets.append(pos)
        pos += len(s)
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(offsets))
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    moov = _moov_spine(stbl, w, h, fps, n_samples=n,
                       duration_ticks=n * 1000 // fps)
    return ftyp + mdat + moov


def _moov_spine(stbl: bytes, w: int, h: int, fps: int, n_samples: int,
                duration_ticks: int, extra: bytes = b"") -> bytes:
    """The moov tree both writers share: trak(tkhd/mdia(mdhd/hdlr/
    minf(vmhd/dinf/<stbl>))) under mvhd, plus optional trailing boxes
    (mvex for the fragmented layout)."""
    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps,
                                            n_samples, 0x55C4, 0))  # 'und'
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIIII", 0, 0, 1, 0,
                                            duration_ticks)
                 + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000,
                                            duration_ticks)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    return _box(b"moov", mvhd + trak + extra)


def _encode_fmp4(samples: list, fps: int, w: int, h: int) -> bytes:
    """Fragmented-MP4 writer: ftyp('iso5') + moov(empty stbl + mvex/
    trex) + per-fragment moof/mdat with tfhd default-base-is-moof and
    a data-offset + sample-size trun."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso5" + b"mp41")
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _visual_sample_entry(w, h))
    empty = b"".join(
        _full(kind, 0, 0, struct.pack(">I", 0))
        for kind in (b"stts", b"stsc", b"stco")
    )
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stbl = _box(b"stbl", stsd + empty + stsz)
    # trex: track 1, sample_description_index 1, default duration 1
    # tick (mdhd timescale = fps -> 1 tick per frame), size/flags 0
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, 0, 0))
    moov = _moov_spine(stbl, w, h, fps, n_samples=0, duration_ticks=0,
                       extra=_box(b"mvex", trex))

    out = [ftyp, moov]
    for seq, i in enumerate(range(0, n, _CHUNK_GROUP), start=1):
        group = samples[i:i + _CHUNK_GROUP]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        tfhd = _full(b"tfhd", 0, 0x020000,        # default-base-is-moof
                     struct.pack(">I", 1))
        # trun flags: data-offset-present | sample-size-present
        trun_body = (struct.pack(">I", len(group))
                     + struct.pack(">i", 0)       # patched below
                     + b"".join(struct.pack(">I", len(x)) for x in group))
        trun = _full(b"trun", 0, 0x000201, trun_body)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        # data_offset: moof start -> mdat body (moof + 8-byte header)
        moof = bytearray(moof)
        struct.pack_into(">i", moof, len(moof) - 4 * len(group) - 4,
                         len(moof) + 8)
        out.append(bytes(moof))
        out.append(_box(b"mdat", b"".join(group)))
    return b"".join(out)


def _walk(data: bytes, pos: int, end: int):
    """Yield (kind, body_start, body_end) for each box in [pos, end).

    Bounds are checked against the PARENT span (`end`), not just the
    file, so a nested box cannot declare a body spanning into sibling
    data; a largesize box must be >= 16 bytes (8-byte header + 8-byte
    size), a plain box >= 8."""
    end = min(end, len(data))
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4:pos + 8]
        body = pos + 8
        hdr = 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            hdr = 16
        elif size == 0:  # box extends to the end of its container
            size = end - pos
        if size < hdr:
            raise ValueError(f"box {kind!r} declares impossible size {size}")
        if pos + size > end:
            raise ValueError(
                f"box {kind!r} declares {size} bytes past its container"
            )
        yield kind, body, pos + size
        pos += size


def _count_field(data: bytes, span: tuple[int, int], kind: str,
                 at: int = 4) -> int:
    """Read a full-box 32-bit count field, bounds-checked against the
    box body (typed error on truncation, never struct.error)."""
    b, e = span
    if b + at + 4 > e:
        raise ValueError(f"truncated {kind} sample table")
    (count,) = struct.unpack_from(">I", data, b + at)
    return count


def _table_entries(data: bytes, span: tuple[int, int], kind: str,
                   skip: int, count: int, entry_bytes: int):
    """Validate that `count` fixed-width entries fit inside a sample
    table's body before unpacking — a corrupt count field must raise
    the module's typed ValueError, never struct.error, and must never
    read bytes belonging to a sibling box."""
    b, e = span
    if count < 0 or b + skip + count * entry_bytes > e:
        raise ValueError(
            f"{kind} declares {count} entries but its box holds "
            f"{max(0, e - b - skip)} bytes"
        )
    return b + skip


def _find(data: bytes, pos: int, end: int, kind: bytes):
    for k, b, e in _walk(data, pos, end):
        if k == kind:
            return b, e
    return None


def _trex_default_duration(data: bytes, moov: tuple[int, int]):
    mvex = _find(data, *moov, b"mvex")
    if mvex is None:
        return None
    trex = _find(data, *mvex, b"trex")
    if trex is None or trex[1] - trex[0] < 24:
        return None
    (_tid, _sdi, dur) = struct.unpack_from(">III", data, trex[0] + 4)
    return dur


def _fragment_spans(data: bytes, track_id: int | None) -> tuple:
    """Walk every top-level moof and rebuild (offset, size) sample
    spans from tfhd/trun — ALL trafs matching the video track and ALL
    truns per traf, default-base-is-moof and explicit base-data-offset
    addressing, per-sample or default sample sizes. Returns
    (spans, sample_duration_or_None). Same typed-error discipline as
    the classic sample tables: bounded counts, no negative or past-EOF
    ranges, no unbounded allocations.

    When the caller could not identify the video track (no tkhd, or a
    truncated one), feeding EVERY traf to the JPEG decoder would turn
    a multiplexed file's audio samples into a confusing JPEG parse
    error. Instead: if all trafs agree on one track id, that id is
    the track; if they differ, raise a typed 'cannot identify video
    track' error."""
    spans: list = []
    duration = None
    if track_id is None:
        seen: set = set()
        for kind, b, e in _walk(data, 0, len(data)):
            if kind != b"moof":
                continue
            for tk, tb, te in _walk(data, b, e):
                if tk != b"traf":
                    continue
                tfhd = _find(data, tb, te, b"tfhd")
                if tfhd is None or tfhd[1] - tfhd[0] < 8:
                    raise ValueError("traf without tfhd")
                seen.add(struct.unpack_from(">I", data, tfhd[0] + 4)[0])
        if len(seen) > 1:
            raise ValueError(
                "cannot identify video track: no usable tkhd and the "
                f"fragments carry {len(seen)} distinct track ids"
            )
        if seen:
            track_id = seen.pop()
    for kind, b, e in _walk(data, 0, len(data)):
        if kind != b"moof":
            continue
        # moof may carry a 64-bit largesize header (16 bytes): detect
        # it so default-base-is-moof addressing points at the true
        # box start, not 8 bytes in
        moof_start = b - 8
        if (b >= 16 and data[b - 16:b - 12] == b"\x00\x00\x00\x01"
                and data[b - 12:b - 8] == b"moof"):
            moof_start = b - 16
        for tk, tb, te in _walk(data, b, e):
            if tk != b"traf":
                continue
            tfhd = _find(data, tb, te, b"tfhd")
            if tfhd is None or tfhd[1] - tfhd[0] < 8:
                raise ValueError("traf without tfhd")
            (tf_flags,) = struct.unpack_from(">I", data, tfhd[0])
            tf_flags &= 0xFFFFFF
            pos = tfhd[0] + 4
            (tf_track,) = struct.unpack_from(">I", data, pos)
            pos += 4
            if track_id is not None and tf_track != track_id:
                continue  # another track's fragment (e.g. audio)
            base = moof_start if tf_flags & 0x020000 else None
            if tf_flags & 0x1:                   # base-data-offset
                if pos + 8 > tfhd[1]:
                    raise ValueError("truncated tfhd base-data-offset")
                (base,) = struct.unpack_from(">Q", data, pos)
                pos += 8
            default_size = None
            if tf_flags & 0x2:                   # sample-description-index
                pos += 4
            if tf_flags & 0x8:                   # default-sample-duration
                if pos + 4 > tfhd[1]:
                    raise ValueError("truncated tfhd default duration")
                (tf_dur,) = struct.unpack_from(">I", data, pos)
                if duration is None and tf_dur:
                    duration = tf_dur
                pos += 4
            if tf_flags & 0x10:                  # default-sample-size
                if pos + 4 > tfhd[1]:
                    raise ValueError("truncated tfhd default-sample-size")
                (default_size,) = struct.unpack_from(">I", data, pos)
            if base is None:
                raise ValueError(
                    "tfhd carries neither base-data-offset nor "
                    "default-base-is-moof"
                )
            for rk, rb, re_ in _walk(data, tb, te):
                if rk != b"trun":
                    continue
                trun = (rb, re_)
                if trun[1] - trun[0] < 8:
                    raise ValueError("truncated trun")
                (tr_flags,) = struct.unpack_from(">I", data, trun[0])
                tr_flags &= 0xFFFFFF
                n_samples = _count_field(data, trun, "trun", at=4)
                pos = trun[0] + 8
                if not tr_flags & 0x1:
                    raise ValueError(
                        "trun without data-offset is unsupported"
                    )
                if pos + 4 > trun[1]:
                    raise ValueError("truncated trun data-offset")
                (data_offset,) = struct.unpack_from(">i", data, pos)
                pos += 4
                if tr_flags & 0x4:               # first-sample-flags
                    pos += 4
                per = (4 * bool(tr_flags & 0x100)
                       + 4 * bool(tr_flags & 0x200)
                       + 4 * bool(tr_flags & 0x400)
                       + 4 * bool(tr_flags & 0x800))
                if n_samples < 0 or pos + n_samples * per > trun[1]:
                    raise ValueError(
                        f"trun declares {n_samples} samples but its box "
                        f"holds {max(0, trun[1] - pos)} bytes"
                    )
                if per == 0 and n_samples * max(default_size or 0, 1) > \
                        len(data):
                    # no per-sample rows to bound the count with — the
                    # declared bytes must exist in the file (the
                    # uniform-stsz guard's fragmented twin)
                    raise ValueError(
                        f"trun declares {n_samples} default-size "
                        f"samples, more than the file holds"
                    )
                cursor = base + data_offset
                for i in range(n_samples):
                    row = pos + i * per
                    off = row
                    if tr_flags & 0x100:         # per-sample duration
                        (sd,) = struct.unpack_from(">I", data, row)
                        if duration is None and sd:
                            duration = sd
                        off += 4
                    if tr_flags & 0x200:
                        (size,) = struct.unpack_from(">I", data, off)
                    elif default_size is not None:
                        size = default_size
                    else:
                        raise ValueError(
                            "no sample size in trun and no tfhd default"
                        )
                    if cursor < 0 or cursor + size > len(data):
                        raise ValueError(
                            "fragment sample range outside the file"
                        )
                    spans.append((cursor, size))
                    cursor += size
    return spans, duration


def decode_mp4(data: bytes) -> tuple[np.ndarray, int]:
    """MP4 bytes -> ((n, h, w, 3) uint8 RGB frames, fps).

    Walks moov/trak/mdia to the video stbl, rebuilds each sample's
    byte range from stsc runs + stco offsets + stsz sizes, and JPEG-
    decodes every sample. Grayscale JPEGs are expanded to RGB to keep
    the (n, h, w, 3) contract. Truncated or corrupt structures raise
    ValueError, never raw struct.error/IndexError — the typed-error
    wrapper every codec in this package carries (review r10: this was
    the one decoder without it)."""
    try:
        return _decode_mp4(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4 structure: {exc!r}") from exc


def _decode_mp4(data: bytes) -> tuple[np.ndarray, int]:
    from adcirctime2cogs_spark.functions.jpegcodec import decode_jpeg

    # ftyp presence is the ISO-BMFF signature; the brand VALUES are
    # deliberately not allowlisted. Real crawled fMP4/DASH content
    # carries major brands like iso5/iso6/dash (our own writer lists
    # iso5 only under compatible_brands), so a major-brand allowlist
    # rejects exactly the files this module exists to read. The box
    # walk + hdlr 'vide' + stsd fourcc checks below are the actual
    # structural validation.
    head = _find(data, 0, len(data), b"ftyp")
    if head is None:
        raise ValueError("not an ISO-BMFF/MP4 file (no ftyp box)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("missing moov box")

    stbl_span = None
    timescale, delta = 0, 1
    video_track_id = None
    for k, b, e in _walk(data, *moov):
        if k != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(data, b, e, b"tkhd")
        if tkhd is not None and tkhd[1] - tkhd[0] >= 24:
            ver = data[tkhd[0]]
            off = tkhd[0] + 4 + (16 if ver == 1 else 8)
            (video_track_id,) = struct.unpack_from(">I", data, off)
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is not None:
            ver = data[mdhd[0]]
            off = mdhd[0] + 4 + (16 if ver == 1 else 8)
            # bounds-check like tkhd above: a truncated mdhd used to
            # read the SIBLING box's bytes as the timescale, or raise
            # raw struct.error at EOF (review r10)
            if off + 4 <= mdhd[1]:
                (timescale,) = struct.unpack_from(">I", data, off)
            else:
                raise ValueError(
                    f"truncated mdhd box ({mdhd[1] - mdhd[0]} bytes "
                    f"for version {ver})"
                )
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl_span = _find(data, *minf, b"stbl")
        break
    if stbl_span is None:
        raise ValueError("no video track (vide hdlr + stbl) found")

    tables: dict[bytes, tuple[int, int]] = {}
    for k, b, e in _walk(data, *stbl_span):
        tables[k] = (b, e)
    for req in (b"stsd", b"stsc", b"stsz", b"stco"):
        if req not in tables and not (req == b"stco" and b"co64" in tables):
            raise ValueError(f"missing {req.decode()} sample table")

    b, _e = tables[b"stsd"]
    fourcc = data[b + 12:b + 16]
    if fourcc not in (b"jpeg", b"mjpa", b"mjpb"):
        raise ValueError(
            f"unsupported sample format {fourcc!r} (have Photo-JPEG)"
        )

    b, e = tables[b"stsz"]
    uniform = _count_field(data, (b, e), "stsz", at=4)
    count = _count_field(data, (b, e), "stsz", at=8)
    if count == 0 and not uniform:
        # empty sample tables: the fragmented (fMP4/DASH) layout — or
        # a genuinely empty classic file, which yields zero fragments.
        # Sample duration preference: trun/tfhd per-fragment values,
        # then the trex default, then 1 tick per frame
        spans, frag_delta = _fragment_spans(data, video_track_id)
        delta = frag_delta or _trex_default_duration(data, moov) or 1
        dec = []
        for off, size in spans:
            px = decode_jpeg(data[off:off + size])
            if px.ndim == 2:
                px = np.repeat(px[:, :, None], 3, axis=2)
            dec.append(px)
        fps = (timescale // delta) if delta else timescale
        out = np.stack(dec) if dec else np.empty((0, 0, 0, 3), dtype="u1")
        return out, int(fps)
    if uniform:
        # no per-entry table to bound the count with — bound it by the
        # file itself (count * uniform sample bytes must exist), which
        # also stops a 4-byte count field from forcing a huge list
        if count * uniform > len(data):
            raise ValueError(
                f"stsz declares {count} samples of {uniform} bytes, "
                f"more than the file holds"
            )
        sizes = [uniform] * count
    else:
        off = _table_entries(data, (b, e), "stsz", 12, count, 4)
        sizes = list(struct.unpack_from(f">{count}I", data, off))

    if b"co64" in tables:
        span = tables[b"co64"]
        n_chunks = _count_field(data, span, "co64")
        off = _table_entries(data, span, "co64", 8, n_chunks, 8)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, off))
    else:
        span = tables[b"stco"]
        n_chunks = _count_field(data, span, "stco")
        off = _table_entries(data, span, "stco", 8, n_chunks, 4)
        offsets = list(struct.unpack_from(f">{n_chunks}I", data, off))

    span = tables[b"stsc"]
    n_runs = _count_field(data, span, "stsc")
    off = _table_entries(data, span, "stsc", 8, n_runs, 12)
    runs = [struct.unpack_from(">III", data, off + 12 * i)
            for i in range(n_runs)]

    if b"stts" in tables:
        span = tables[b"stts"]
        n_tt = _count_field(data, span, "stts")
        if n_tt:
            off = _table_entries(data, span, "stts", 8, n_tt, 8)
            _cnt, delta = struct.unpack_from(">II", data, off)

    # stsc runs -> samples-per-chunk for every chunk index; run chunk
    # indices are 1-based and must stay inside the stco table
    spans: list[tuple[int, int]] = []  # (file_offset, size) per sample
    si = 0
    for ri, (first, per_chunk, _sdi) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
        if first < 1 or last > len(offsets) or first - 1 > last:
            raise ValueError(
                f"stsc run {ri} spans chunks [{first}, {last}] outside "
                f"the {len(offsets)}-chunk stco table"
            )
        for ci in range(first - 1, last):
            pos = offsets[ci]
            for _ in range(per_chunk):
                if si >= count:
                    break
                spans.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
    if si != count:
        raise ValueError(
            f"stsc/stco map covers {si} samples, stsz declares {count}"
        )

    dec = []
    for off, size in spans:
        if off + size > len(data):
            raise ValueError("sample range past EOF")
        px = decode_jpeg(data[off:off + size])
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        dec.append(px)
    fps = (timescale // delta) if delta else timescale
    out = np.stack(dec) if dec else np.empty((0, 0, 0, 3), dtype="u1")
    return out, int(fps)
