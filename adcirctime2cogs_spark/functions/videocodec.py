"""Pure-Python uncompressed-AVI (RIFF) codec — struct + numpy, no
video library.

Companion to imagecodec.py / audiocodec.py for the multimodal operator
family: the AVI container (public Microsoft "AVI RIFF File Reference")
with BI_RGB device-independent-bitmap frames is simple enough to
implement exactly, so the video operators can carry REAL encoded video
through the binary-column plumbing and the frame sampler can really
walk a container — an ffmpeg cluster swaps `decode_avi` for its
demuxer and nothing else changes.

Layout written/read here:

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56)  micro-sec/frame, total frames, streams=1, w, h
        LIST 'strl'
          'strh' (56) fccType='vids', handler='DIB ', scale/rate (fps),
                      length
          'strf' (40) BITMAPINFOHEADER: 24-bit BI_RGB, height > 0
      LIST 'movi'
        '00db' <frame DIB>  x N   (bottom-up rows, BGR, rows pad to 4)
      'idx1'  one entry per frame (flags=AVIIF_KEYFRAME)

The reader walks chunks tolerantly (skips unknown LISTs/chunks, takes
'00db'/'00dc' as frames, honors odd-size chunk padding) so files from
other writers parse too; frames return as (n, h, w, 3) uint8 RGB,
top-down.
"""

from __future__ import annotations

import struct

import numpy as np

AVIIF_KEYFRAME = 0x10


def _dib_encode(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB, top-down -> DIB pixel bytes (bottom-up,
    BGR, rows padded to 4 bytes)."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up + channel swap
    row = np.zeros((h, (w * 3 + 3) & ~3), dtype="u1")
    row[:, : w * 3] = bgr.reshape(h, w * 3)
    return row.tobytes()


def _dib_decode(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype="u1", count=h * stride).reshape(h, stride)
    bgr = arr[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_avi(frames: np.ndarray, fps: int = 10,
               codec: str = "DIB", quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> AVI bytes (with an idx1
    index, like real writers emit). codec='DIB' stores uncompressed
    bottom-up BGR frames in '00db' chunks; codec='MJPG' stores each
    frame as a baseline JPEG (functions/jpegcodec.py) in '00dc'
    chunks with the MJPG fourcc in strh/strf — the Motion-JPEG
    layout real capture tools produce."""
    frames = np.ascontiguousarray(frames, dtype="u1")
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("encode_avi takes (n, h, w, 3) uint8 frames")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unknown AVI codec {codec!r}")
    n, h, w, _ = frames.shape
    if codec == "MJPG":
        from adcirctime2cogs_spark.functions.jpegcodec import encode_jpeg

        dib = [encode_jpeg(f, quality=quality) for f in frames]
    else:
        dib = [_dib_encode(f) for f in frames]
    frame_bytes = max((len(d) for d in dib), default=0)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    handler = b"MJPG" if codec == "MJPG" else b"DIB "
    compression = struct.unpack("<I", b"MJPG")[0] if codec == "MJPG" else 0
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_bytes, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    frame_cid = b"00dc" if codec == "MJPG" else b"00db"
    movi_body = b"".join(chunk(frame_cid, d) for d in dib)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the start of the 'movi' list's kind
    # field (the convention real muxers use)
    idx_entries, off = [], 4
    for d in dib:
        idx_entries.append(struct.pack(
            "<4sIII", frame_cid, AVIIF_KEYFRAME, off, len(d)
        ))
        off += 8 + len(d) + (len(d) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((n, h, w, 3) uint8 RGB frames, fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    scale, rate = 1, 10
    compression = 0
    cur_stream = b""  # stream type of the strl being walked
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        nonlocal w, h, scale, rate, compression, cur_stream
        end = min(end, len(data))
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            # a declared size past the enclosing LIST (or EOF at top
            # level) is corruption, not a feature — raise the typed
            # error rather than read a sibling's bytes
            if body + size > end:
                raise ValueError(
                    f"chunk {cid!r} declares {size} bytes past its "
                    f"container"
                )
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the 4-byte kind
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("truncated avih chunk")
                vals = struct.unpack_from("<10I", data, body)
                w, h = vals[8], vals[9]
            elif cid == b"strh":
                # remember the stream TYPE: the following strf must be
                # parsed per-type — an audio strl's WAVEFORMATEX strf
                # parsed as BITMAPINFOHEADER clobbered the video
                # dimensions on any AVI that also carries audio
                # (review r10)
                cur_stream = data[body:body + 4]
                if cur_stream == b"vids" and size >= 40:
                    _, _, _, _, scale, rate = struct.unpack_from(
                        "<IHHIII", data, body + 8
                    )
            elif cid == b"strf" and size >= 24 and cur_stream == b"vids":
                _bs, bw, bh, _pl, _bc, comp = struct.unpack_from(
                    "<IiiHHI", data, body
                )
                w, h, compression = bw, abs(bh), comp
            elif cid in (b"00db", b"00dc"):
                frames.append(data[body:body + size])
            pos = body + size + (size % 2)  # chunks pad to even

    walk(12, len(data))
    if w is None or h is None:
        raise ValueError("missing avih/strf header")
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise ValueError(f"implausible frame dimensions {w}x{h}")
    fps = rate // scale if scale else rate
    mjpg = compression == struct.unpack("<I", b"MJPG")[0]
    if mjpg:
        from adcirctime2cogs_spark.functions.jpegcodec import decode_jpeg

        dec = []
        for f in frames:
            px = decode_jpeg(f)
            if px.ndim == 2:  # grayscale frame: uphold the RGB contract
                px = np.repeat(px[:, :, None], 3, axis=2)
            dec.append(px)
    elif compression != 0:
        raise ValueError(
            f"unsupported AVI compression fourcc 0x{compression:08X} "
            "(have BI_RGB and MJPG)"
        )
    else:
        dec = [_dib_decode(f, w, h) for f in frames]
    out = np.stack(dec) if dec else np.empty((0, h, w, 3), dtype="u1")
    return out, int(fps)
