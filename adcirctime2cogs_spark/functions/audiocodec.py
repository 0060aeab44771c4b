"""Pure-Python WAV (RIFF/PCM) codec — struct + numpy, no audio
library.

Companion to imagecodec.py for the multimodal operator family: PCM
WAV is a fully public, trivial container (RIFF header + fmt chunk +
raw little-endian samples), so the audio operators can carry REAL
encoded audio through the binary-column plumbing and the decode
kernel can really parse it. A librosa/ffmpeg cluster swaps
`decode_wav` for its loader and nothing else changes.

Layout written/read here (canonical 44-byte header):

    'RIFF' <size> 'WAVE'
    'fmt ' 16 <pcm=1> <channels> <rate> <byte_rate> <block> <bits=16>
    'data' <nbytes> <int16 LE samples>

The reader walks chunks (skipping extras like LIST/fact), so files
from other writers parse too.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono int16 samples -> PCM WAV bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError("encode_wav takes mono 1-D int16 samples")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (mono int16 numpy array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            # the chunk's own declared size must cover the 16 PCM
            # fields too, or a size-0 fmt chunk would silently read
            # the NEXT chunk's bytes as format fields
            if size < 16 or body + 16 > len(data):
                raise ValueError("truncated fmt chunk")
            pcm, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if pcm != 1 or bits != 16:
                raise ValueError(f"only 16-bit PCM supported (fmt={pcm}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", offset=body,
                                    count=size // 2)
        pos = body + size + (size % 2)  # chunks pad to even size
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype("<i2")
    return samples.copy(), rate


def frame_energies(samples: np.ndarray, window: int, hop: int) -> np.ndarray:
    """Integer sum-of-squares energy per frame (int64-exact — the
    cross-engine-hashable form; sqrt/normalize is a trivial epilogue).
    Frames are the standard [i*hop, i*hop+window) slices that fit."""
    s = samples.astype("int64")
    n_frames = max(0, (len(s) - window) // hop + 1)
    return np.array(
        [np.sum(s[i * hop:i * hop + window] ** 2) for i in range(n_frames)],
        dtype="int64",
    )


def audio_fingerprint64(samples, rate: int | None = None,
                        n_fft: int = 256, hop: int = 64) -> int:
    """64-bit audio fingerprint: RMS-normalize (gain invariance by
    construction), Hann-windowed magnitude spectrogram, log dynamic
    range clamped at 1% of the peak magnitude (so requantization
    noise in silent bins cannot flip bits), then the same DCT
    low-frequency median-threshold hash images use
    (imagecodec.phash64 on the freq x time grid). Measured margins on
    the note-structured fixtures: half-volume re-encodes hash
    identically, 8-bit requantization stays within 4 bits, unrelated
    clips sit at 8+ (2000-doc sweep). `rate` is accepted for
    signature symmetry with decode_wav; the hash is rate-agnostic
    (the spectrogram grid is resampled to 32x32 regardless)."""
    import numpy as np

    from adcirctime2cogs_spark.functions.imagecodec import phash64

    x = np.asarray(samples, dtype="float64")
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    x = x / max(float(np.sqrt(np.mean(x * x))), 1e-9)
    n = (len(x) - n_fft) // hop + 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(n_fft)
    mag = np.abs(np.fft.rfft(frames, axis=1))
    floor = 0.01 * float(mag.max()) if mag.size else 1.0
    spec = np.log(np.maximum(mag, max(floor, 1e-12)))
    return phash64(spec.T)
