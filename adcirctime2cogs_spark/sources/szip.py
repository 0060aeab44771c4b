"""Pure-Python szip (CCSDS 121.0-B-2 extended-Rice) codec for the
HDF5 szip filter (filter id 4) — the last natively-undecodable filter
in the NetCDF-4 ingest path (VERDICT r10 #6).

Implemented from public knowledge only: the CCSDS 121.0-B-2 lossless
data compression recommendation (the Rice adaptive entropy coder) and
the documented behavior of the szip/libaec library HDF5 links against.
Reference files for parity: CCSDS 121.0-B-2 sections 3-5 (coding
options, fundamental-sequence codes, zero-block/second-extension/
sample-split-entropy identifiers, preprocessor mapping); HDF5's
H5Zszip.c framing (4-byte little-endian uncompressed-size prefix,
client data = [options_mask, bits_per_pixel, pixels_per_block,
pixels_per_scanline]).

Format conventions (stated explicitly so a divergence is diagnosable):

- The compressed chunk payload after HDF5's 4-byte LE size prefix is
  ONE continuous MSB-first bitstream of entropy-coded blocks of
  J = pixels_per_block samples; no byte alignment between blocks or
  scanlines ("raw" szip mode — HDF5 always sets
  H5_SZIP_RAW_OPTION_MASK, keeping the image header out of stream).
- Block prefix (idlen = 3 bits for n <= 8, 4 for n <= 16, else 5):
    '0' * (idlen+1)        zero-block run (FS-coded run count)
    '0' * idlen + '1'      second extension
    id in [1, 2^idlen - 2]  sample-split with k = id - 1
    '1' * idlen            no compression (raw n-bit samples)
- Fundamental sequence (FS) code of m: m '0' bits then a '1'.
- Zero-block run count z from the FS value f: f <= 3 -> z = f + 1;
  f == 4 -> ROS (remainder of segment); f >= 5 -> z = f. Segments are
  64 blocks, additionally bounded by the scanline (reference sample
  interval) boundary.
- Preprocessing (the szip "NN" option): previous-sample predictor,
  standard CCSDS mapping to non-negative deltas; the FIRST sample of
  each scanline is a reference transmitted as n raw bits immediately
  after the first block's prefix, with that block coding the J-1
  remaining samples (libaec convention). Without NN ("EC" option)
  samples are coded directly and no references exist.
- Short final scanline and short final block are encoder-padded to
  whole blocks; pad samples are DROPPED on decode, so their encoded
  value never affects output (this codec pads by repeating the last
  real sample, which costs 0 bits after NN preprocessing).
- Second extension ON a reference block pairs an odd sample count and
  is convention-ambiguous without the reference implementation; this
  decoder raises the typed SzipOutOfSubset for it and this encoder
  never emits it (a CCSDS encoder may choose options freely).

Supported: bits_per_pixel in {8, 16, 32} (sample storage 1/2/4 bytes,
LSB or MSB byte order per the options mask), even pixels_per_block
4..32, any pixels_per_scanline >= pixels_per_block. Out-of-subset
parameters raise SzipOutOfSubset (-> the caller's typed
unsupported-feature error); corrupt streams raise plain SzipError
(-> the caller's corrupt-data error) — sources/hdf5.py maps them to
UnsupportedHDF5Feature and HDF5Error respectively.
"""

from __future__ import annotations

import numpy as np

# H5Zszip / szlib option mask bits (public H5public.h values)
SZ_ALLOW_K13 = 1
SZ_CHIP = 2
SZ_EC = 4
SZ_LSB = 8
SZ_MSB = 16
SZ_NN = 32
SZ_RAW = 128

_SEGMENT_BLOCKS = 64


class SzipError(ValueError):
    """Malformed/corrupt szip stream (truncation, impossible sample
    values, non-sample-aligned sizes). Callers map this to their
    corrupt-data error class."""


class SzipOutOfSubset(SzipError):
    """Valid szip, but using parameters or constructs outside this
    codec's documented subset (bits_per_pixel not in 8/16/32,
    second-extension on a reference block, ...). Callers map this to
    their unsupported-feature error class — the file is fine, convert
    it offline (review r11: a truncated chunk must not masquerade as
    an out-of-scope feature)."""


def _idlen(n: int) -> int:
    return 3 if n <= 8 else 4 if n <= 16 else 5


def _check_params(n: int, j: int, scanline: int) -> None:
    if n not in (8, 16, 32):
        raise SzipOutOfSubset(
            f"szip bits_per_pixel {n} outside the decoded subset "
            "(8, 16, 32)"
        )
    if j < 4 or j > 32 or j % 2:
        raise SzipOutOfSubset(
            f"szip pixels_per_block {j} invalid (even 4..32)"
        )
    if scanline < j:
        raise SzipOutOfSubset(
            f"szip pixels_per_scanline {scanline} < pixels_per_block {j}"
        )


def _dtype(n: int, options: int) -> np.dtype:
    base = {8: "u1", 16: "u2", 32: "u4"}[n]
    order = ">" if options & SZ_MSB else "<"
    return np.dtype(order + base if n > 8 else base)


class _BitReader:
    __slots__ = ("b", "pos", "acc", "nacc", "nbits")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0          # next byte index
        self.acc = 0          # MSB-first accumulator
        self.nacc = 0         # bits in accumulator
        self.nbits = 8 * len(b)

    def _fill(self, need: int) -> None:
        while self.nacc < need:
            if self.pos >= len(self.b):
                raise SzipError("szip stream truncated")
            self.acc = (self.acc << 8) | self.b[self.pos]
            self.pos += 1
            self.nacc += 8

    def take(self, nbits: int) -> int:
        self._fill(nbits)
        self.nacc -= nbits
        v = self.acc >> self.nacc
        self.acc &= (1 << self.nacc) - 1
        return v

    def fs(self) -> int:
        """Fundamental-sequence decode: count 0-bits to the next 1."""
        m = 0
        while True:
            if self.nacc == 0:
                self._fill(1)
            if self.acc == 0:  # all remaining accumulator bits are 0
                m += self.nacc
                self.nacc = 0
                continue
            top = self.acc.bit_length()
            zeros = self.nacc - top
            m += zeros
            # consume the zeros and the terminating 1
            self.nacc = top - 1
            self.acc &= (1 << self.nacc) - 1
            return m


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def fs(self, m: int) -> None:
        self.put(1, m + 1)

    def bytes(self) -> bytes:
        if self.nacc:
            self.out.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


def _map_deltas(x: np.ndarray, n: int) -> np.ndarray:
    """CCSDS preprocessor over one scanline: previous-sample predictor
    + standard mapping to non-negative values. x[0] is the reference
    (returned unchanged in slot 0 — the caller transmits it raw)."""
    m = (1 << n) - 1
    xi = x.astype(np.int64)
    pred = xi[:-1]
    delta = xi[1:] - pred
    theta = np.minimum(pred, m - pred)
    mapped = np.where(
        np.abs(delta) <= theta,
        np.where(delta >= 0, 2 * delta, -2 * delta - 1),
        theta + np.abs(delta),
    )
    out = np.empty(len(x), dtype=np.int64)
    out[0] = xi[0]
    out[1:] = mapped
    return out


def _unmap_deltas(d: np.ndarray, ref: int, n: int) -> np.ndarray:
    """Inverse preprocessor over one scanline: d[0] is ignored, ref is
    the raw first sample, d[1:] are mapped deltas."""
    m = (1 << n) - 1
    out = np.empty(len(d), dtype=np.int64)
    out[0] = ref
    prev = ref
    for i in range(1, len(d)):
        dv = int(d[i])
        theta = prev if prev <= m - prev else m - prev
        if dv <= 2 * theta:
            delta = dv // 2 if dv % 2 == 0 else -((dv + 1) // 2)
        else:
            mag = dv - theta
            delta = mag if theta == prev else -mag
        prev = prev + delta
        out[i] = prev
    return out


# ------------------------------------------------------------------
# encoder


def _encode_block(w: _BitWriter, vals: list[int], n: int, idlen: int,
                  ref: int | None) -> None:
    """Emit one block: choose the cheapest of k-split / no-compression
    (CCSDS allows any choice; zero-block runs are handled by the
    caller). `vals` are the coded samples (J, or J-1 on a reference
    block); `ref` is the raw reference sample to insert after the
    prefix."""
    kmax = (1 << idlen) - 3
    best_k, best_cost = None, n * len(vals)  # no-comp cost
    for k in range(0, min(kmax, n - 1) + 1):
        cost = sum((v >> k) + 1 + k for v in vals)
        if cost < best_cost:
            best_k, best_cost = k, cost
    if best_k is None:
        w.put((1 << idlen) - 1, idlen)  # no compression
        if ref is not None:
            w.put(ref, n)
        for v in vals:
            w.put(v, n)
    else:
        w.put(best_k + 1, idlen)
        if ref is not None:
            w.put(ref, n)
        for v in vals:
            w.fs(v >> best_k)
        if best_k:
            for v in vals:
                w.put(v, best_k)


def _emit_zero_run(w: _BitWriter, run: int, blocks_to_seg_end: int,
                   idlen: int, ref: int | None, n: int) -> None:
    """Emit `run` consecutive all-zero blocks as one zero-block code.
    `ref` is the reference sample to embed when the run's FIRST block
    is the scanline-leading block (zero-block prefixes still carry the
    reference; only block 0 of a scanline can have one, so a mid-run
    reference is impossible). Runs never cross segment boundaries
    (caller splits)."""
    w.put(0, idlen + 1)  # zero-block identifier
    if ref is not None:
        w.put(ref, n)
    if run == blocks_to_seg_end and run >= 5:
        w.fs(4)  # ROS
    elif run <= 4:
        w.fs(run - 1)
    else:
        w.fs(run)


def encode_szip(data: bytes, options: int, n: int, j: int,
                scanline: int) -> bytes:
    """Compress `data` (samples in LSB/MSB order per options) into a
    raw szip bitstream (no HDF5 size prefix — sources/hdf5.py adds
    it). Short final scanline/block padded by repeating the last
    sample."""
    _check_params(n, j, scanline)
    dt = _dtype(n, options)
    if len(data) % dt.itemsize:
        raise SzipError("szip input not a whole number of samples")
    samples = np.frombuffer(data, dt).astype(np.int64)
    nn = bool(options & SZ_NN)
    w = _BitWriter()
    idlen = _idlen(n)
    for s0 in range(0, len(samples), scanline):
        line = samples[s0:s0 + scanline]
        nblocks = -(-len(line) // j)
        pad = nblocks * j - len(line)
        if pad:
            line = np.concatenate([line, np.repeat(line[-1:], pad)])
        coded = _map_deltas(line, n) if nn else line
        # per-block coded values + per-block reference
        blocks: list[tuple[list[int], int | None]] = []
        for b in range(nblocks):
            seg = coded[b * j:(b + 1) * j]
            if b == 0 and nn:
                blocks.append(([int(v) for v in seg[1:]], int(line[0])))
            else:
                blocks.append(([int(v) for v in seg], None))
        b = 0
        while b < nblocks:
            vals, ref = blocks[b]
            if not any(vals):
                # extend the zero run, bounded by the segment end
                seg_end = min(((b // _SEGMENT_BLOCKS) + 1)
                              * _SEGMENT_BLOCKS, nblocks)
                run = 1
                while (b + run < seg_end
                       and not any(blocks[b + run][0])
                       and blocks[b + run][1] is None):
                    run += 1
                _emit_zero_run(w, run, seg_end - b, idlen, ref, n)
                b += run
            else:
                _encode_block(w, vals, n, idlen, ref)
                b += 1
    return w.bytes()


# ------------------------------------------------------------------
# decoder


def decode_szip(payload: bytes, out_nbytes: int, options: int, n: int,
                j: int, scanline: int) -> bytes:
    """Decompress a raw szip bitstream back to `out_nbytes` of samples
    (HDF5's 4-byte LE size prefix already stripped by the caller)."""
    _check_params(n, j, scanline)
    dt = _dtype(n, options)
    if out_nbytes % dt.itemsize:
        raise SzipError("szip output size not a whole number of samples")
    total = out_nbytes // dt.itemsize
    nn = bool(options & SZ_NN)
    idlen = _idlen(n)
    kmax = (1 << idlen) - 3
    r = _BitReader(payload)
    out = np.empty(total, dtype=np.int64)
    pos = 0
    while pos < total:
        line_n = min(scanline, total - pos)
        nblocks = -(-line_n // j)
        coded = np.zeros(nblocks * j, dtype=np.int64)
        ref = None
        b = 0
        while b < nblocks:
            is_ref = nn and b == 0
            ncoded = j - 1 if is_ref else j
            idv = r.take(idlen)
            if idv == 0:
                if r.take(1):  # second extension
                    if is_ref:
                        raise SzipOutOfSubset(
                            "szip second-extension on a reference "
                            "block is outside the decoded subset"
                        )
                    vals = []
                    for _ in range(j // 2):
                        m = r.fs()
                        # invert m = s(s+1)/2 + v2, v1 = s - v2
                        s = int((np.sqrt(8 * m + 1) - 1) // 2)
                        while s * (s + 1) // 2 > m:
                            s -= 1
                        while (s + 1) * (s + 2) // 2 <= m:
                            s += 1
                        v2 = m - s * (s + 1) // 2
                        vals.extend((s - v2, v2))
                    coded[b * j:(b + 1) * j] = vals
                    b += 1
                else:  # zero-block run
                    if is_ref:
                        ref = r.take(n)
                    f = r.fs()
                    seg_end = min(((b // _SEGMENT_BLOCKS) + 1)
                                  * _SEGMENT_BLOCKS, nblocks)
                    if f == 4:
                        run = seg_end - b
                    elif f <= 3:
                        run = f + 1
                    else:
                        run = f
                    if b + run > seg_end:
                        raise SzipError(
                            "szip zero-block run crosses a segment "
                            "boundary"
                        )
                    # blocks already zero in `coded`
                    b += run
            elif idv == (1 << idlen) - 1:  # no compression
                if is_ref:
                    ref = r.take(n)
                start = b * j + (1 if is_ref else 0)
                for i in range(ncoded):
                    coded[start + i] = r.take(n)
                b += 1
            else:  # k-split
                k = idv - 1
                if k > kmax or k > n - 1:
                    raise SzipError(f"szip split index k={k} invalid")
                if is_ref:
                    ref = r.take(n)
                start = b * j + (1 if is_ref else 0)
                ms = [r.fs() for _ in range(ncoded)]
                if k:
                    for i in range(ncoded):
                        coded[start + i] = (ms[i] << k) | r.take(k)
                else:
                    for i in range(ncoded):
                        coded[start + i] = ms[i]
                b += 1
        if nn:
            line = _unmap_deltas(coded, ref if ref is not None else 0, n)
        else:
            line = coded
        out[pos:pos + line_n] = line[:line_n]
        pos += line_n
    hi = out >> n
    if hi.any():
        raise SzipError("szip decoded sample exceeds bits_per_pixel")
    return out.astype(_dtype(n, options).newbyteorder("=")).astype(
        dt
    ).tobytes()
