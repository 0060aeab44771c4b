"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81) — the
compressed-image leg of the multimodal column family (BASELINE.json
north-star scope; the reference has no media surface at all).

Decoder: a table-driven baseline sequential decoder — SOI/DQT/SOF0/
DHT/SOS/EOI marker walk, canonical Huffman tables rebuilt from each
DHT (so ANY baseline file decodes, whatever tables it carries,
including the standard Annex K ones real encoders emit), interleaved
MCU scan with 0xFF00 byte-unstuffing and restart markers, component
sampling factors up to 2x2 (4:2:0 / 4:2:2 / 4:4:4), dequantize ->
inverse zigzag -> orthonormal IDCT (matrix form) -> level shift ->
BT.601 YCbCr->RGB as JFIF specifies.

Encoder: 4:4:4 baseline with level shift, the same orthonormal DCT,
linear-quality-scaled quantization tables, zigzag, DC-differential +
run-length AC symbols coded with CUSTOM canonical Huffman tables
built from the actual symbol frequencies (two-pass) and written in
the DHT segments — T.81 requires decoders to read tables from the
stream, so the output is a fully valid baseline JPEG without
reproducing the (optional) Annex K tables.

Out of scope (clear errors): progressive (SOF2) and arithmetic-coded
scans, 12-bit precision, DNL.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II basis: C[k, n] = s(k) cos((2n+1) k pi/16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)

# base quantization tables (quality 50). The luminance table is the
# T.81 Annex K.1 example table (normative examples are published in
# the spec); chrominance uses the K.2 example.
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


class JPEGError(ValueError):
    pass


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """The IJG linear quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    # floor(x + 0.5) rather than rint: half-up rounding has an exact
    # SQL mirror (FLOOR(x + 0.5)), which the MJPEG oracle relies on;
    # banker's rounding does not
    return np.clip(np.floor(np.stack([r, g, b], axis=-1) + 0.5), 0, 255
                   ).astype(np.uint8)


# ---------------------------------------------------------- Huffman
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a DHT (bits-per-length, values)
    pair, in T.81 canonical order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits, values) for a canonical Huffman code over the observed
    symbols, lengths capped at 16 (T.81's limit) via the classic
    package-merge-free adjustment, and the all-ones code avoided by
    reserving one dummy slot (the libjpeg convention)."""
    # simple Huffman over (freq, symbol); a reserved pseudo-symbol 256
    # guarantees no real symbol gets the all-1s code
    nodes = sorted(
        ([f, [s]] for s, f in list(freq.items()) + [(256, 1)]),
        key=lambda x: (x[0], x[1][0]),
    )
    depth: dict[int, int] = {s: 0 for s in freq}
    depth[256] = 0
    while len(nodes) > 1:
        a = nodes.pop(0)
        b = nodes.pop(0)
        for s in a[1] + b[1]:
            depth[s] += 1
        merged = [a[0] + b[0], a[1] + b[1]]
        lo, hi = 0, len(nodes)
        while lo < hi:
            mid = (lo + hi) // 2
            if nodes[mid][0] <= merged[0]:
                lo = mid + 1
            else:
                hi = mid
        nodes.insert(lo, merged)
    # cap lengths at 16: push any deeper symbol up by stealing a slot
    # from the deepest available shorter code (count-based adjust)
    counts = [0] * 33
    for s, d in depth.items():
        counts[min(d, 32)] += 1
    for ln in range(32, 16, -1):
        while counts[ln] > 0:
            j = ln - 2
            while counts[j] == 0:
                j -= 1
            counts[ln] -= 2
            counts[ln - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    # drop the reserved slot from the longest used length
    for ln in range(16, 0, -1):
        if counts[ln]:
            counts[ln] -= 1
            break
    # assign values: shorter codes to more frequent symbols
    by_freq = sorted(freq, key=lambda s: (-freq[s], s))
    bits = counts[1:17]
    if sum(bits) != len(by_freq):
        raise JPEGError("huffman length adjustment lost symbols")
    return bits, by_freq


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per T.81


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise JPEGError("scan data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JPEGError("truncated stuffing")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:  # restart marker mid-fill
                raise JPEGError("unexpected restart marker")
            else:
                raise JPEGError(f"marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def peek8(self) -> int:
        """Top 8 buffered bits WITHOUT consuming, or -1 when the
        stream cannot supply 8 bits without raising (end of data or a
        marker byte next) — the huffman LUT fast path (optimization
        r13). Only complete, valid stuffed bytes are ingested, so on
        -1 the reader state is exactly what the serial _fill path
        would produce and the caller's bit-by-bit fallback raises at
        the same point with the same error as before."""
        while self.n < 8:
            p = self.pos
            if p >= len(self.data):
                return -1
            b = self.data[p]
            if b == 0xFF:
                if p + 1 >= len(self.data) or self.data[p + 1] != 0x00:
                    return -1  # marker/truncation: serial path decides
                self.pos = p + 2
            else:
                self.pos = p + 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return (self.acc >> (self.n - 8)) & 0xFF

    def drop(self, k: int) -> None:
        """Consume k already-peeked bits (k <= self.n)."""
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def sync_restart(self):
        """Drop to a byte boundary and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _receive_extend(r: "_BitReader", cat: int) -> int:
    if cat == 0:
        return 0
    v = r.bits(cat)
    if v < (1 << (cat - 1)):
        v -= (1 << cat) - 1
    return v


class _HuffDecoder:
    """Canonical-code decoder: (length-indexed min/max code, symbol
    offset) — the T.81 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        # 8-bit prefix LUT (optimization r13): every code of length
        # <= 8 owns the 2^(8-len) table slots sharing its prefix, so
        # one peek + one index replaces len bit-by-bit reads. Typical
        # baseline tables put the overwhelming majority of symbols at
        # <= 8 bits; longer codes fall through to the serial DECODE
        # procedure below, continuing from the 8 peeked bits.
        self.lut: list[tuple[int, int] | None] = [None] * 256
        code = 0
        k = 0
        for ln in range(1, 9):
            for _ in range(bits[ln - 1]):
                lo = code << (8 - ln)
                for p in range(lo, lo + (1 << (8 - ln))):
                    self.lut[p] = (vals[k], ln)
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        p = r.peek8()
        if p >= 0:
            hit = self.lut[p]
            if hit is not None:
                r.drop(hit[1])
                return hit[0]
            # valid-but-longer code: the 8 peeked bits are its prefix
            r.drop(8)
            code = p
            ln = 8
        else:
            code = r.bits(1)
            ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise JPEGError("invalid huffman code")
            code = (code << 1) | r.bits(1)
            ln += 1
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


# ---------------------------------------------------------- encoder
def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """uint8 RGB (h, w, 3) -> baseline JPEG bytes, 4:4:4 sampling,
    custom frequency-built canonical Huffman tables in the DHT."""
    rgb = np.asarray(rgb)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise JPEGError("encode_jpeg wants uint8 (h, w, 3)")
    h, w = rgb.shape[:2]
    qt = [_quality_scale(_Q_LUMA, quality),
          _quality_scale(_Q_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(rgb)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1:h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1:w]

    # per component: quantized zigzag blocks in MCU (row-major) order.
    # All blocks DCT in ONE broadcast matmul (C @ blocks @ C.T over a
    # (n, 8, 8) stack) — per-block arithmetic identical to the 2-D
    # matmul, an order of magnitude less Python-loop overhead.
    comps: list[list[np.ndarray]] = []
    for c in range(3):
        q = qt[0] if c == 0 else qt[1]
        plane = padded[..., c] - 128.0
        stack = (
            plane.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = _C @ stack @ _C.T
        # half-up quantization (SQL-mirrorable, see decoder)
        qz = np.floor(coefs / q + 0.5).astype(np.int64)
        comps.append(list(qz.reshape(-1, 64)[:, _ZIGZAG]))

    # symbol streams (two-pass: count, build tables, then emit)
    def symbols(blocks):
        prev_dc = 0
        dc_syms, ac_syms = [], []
        per_block = []
        for zz in blocks:
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            dcat = _category(diff)
            dc_syms.append(dcat)
            entry = [(dcat, diff)]
            run = 0
            last_nz = 0
            for i in range(1, 64):
                if zz[i]:
                    last_nz = i
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    if run == 16:
                        ac_syms.append(0xF0)
                        entry.append((0xF0, 0))
                        run = 0
                else:
                    cat = _category(v)
                    sym = (run << 4) | cat
                    ac_syms.append(sym)
                    entry.append((sym, v))
                    run = 0
            if last_nz < 63:
                ac_syms.append(0x00)  # EOB
                entry.append((0x00, 0))
            per_block.append(entry)
        return dc_syms, ac_syms, per_block

    dc_l, ac_l, blocks_l = symbols(comps[0])
    dc_c1, ac_c1, blocks_cb = symbols(comps[1])
    dc_c2, ac_c2, blocks_cr = symbols(comps[2])
    dc_c = dc_c1 + dc_c2
    ac_c = ac_c1 + ac_c2

    def table(syms):
        freq: dict[int, int] = {}
        for s in syms:
            freq[s] = freq.get(s, 0) + 1
        return _build_huffman(freq)

    dc_l_t, ac_l_t = table(dc_l), table(ac_l)
    dc_c_t, ac_c_t = table(dc_c), table(ac_c)
    enc = {
        (0, 0): _canonical_codes(*dc_l_t), (1, 0): _canonical_codes(*ac_l_t),
        (0, 1): _canonical_codes(*dc_c_t), (1, 1): _canonical_codes(*ac_c_t),
    }

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, no thumbnail

    for tid, q in enumerate(qt):
        body = bytes([tid]) + bytes(
            int(q.reshape(64)[_ZIGZAG][i]) for i in range(64)
        )
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body

    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    for (cls, tid), t in (((0, 0), dc_l_t), ((1, 0), ac_l_t),
                          ((0, 1), dc_c_t), ((1, 1), ac_c_t)):
        body = bytes([(cls << 4) | tid]) + bytes(t[0]) + bytes(t[1])
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    sos = struct.pack(">B", 3)
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tt)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    n_mcu = len(blocks_l)
    for i in range(n_mcu):
        for comp, entries in ((0, blocks_l), (1, blocks_cb),
                              (2, blocks_cr)):
            tid = 0 if comp == 0 else 1
            for j, (sym, val) in enumerate(entries[i]):
                code, ln = enc[(0 if j == 0 else 1, tid)][sym]
                bw.write(code, ln)
                cat = sym & 0x0F if j else sym
                if cat:
                    v = val if val > 0 else val + (1 << cat) - 1
                    bw.write(v, cat)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decoder
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 RGB (h, w, 3) (or (h, w) for a
    single-component grayscale frame). Handles interleaved and
    sequential (one scan per component) baseline files, 0xFF fill
    bytes before markers (T.81 B.1.1.2), and restart markers; every
    malformed-input failure surfaces as JPEGError (a ValueError),
    never a raw struct/index/key error."""
    try:
        return _decode_jpeg(data)
    except JPEGError:
        raise
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        # ZeroDivisionError: a crafted SOF with sampling factor 0
        # reaches the MCU geometry division (review r10)
        raise JPEGError(f"malformed JPEG stream: {exc!r}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JPEGError("no SOI marker")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    state = None  # (planes, prev_dc, scanned component ids)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JPEGError(f"expected marker at {pos}")
        while pos < len(data) and data[pos] == 0xFF and \
                pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker (B.1.1.2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 0x0F
                if pq:
                    raise JPEGError("16-bit quant tables unsupported")
                if len(body) - q < 65:
                    # must precede the _UNZIGZAG indexing, which would
                    # raise IndexError first (review r10: the old
                    # post-index size check was dead code)
                    raise JPEGError("truncated DQT")
                tbl = np.frombuffer(
                    body[q + 1:q + 65], dtype=np.uint8
                ).astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                qt[tq] = tbl
                q += 65
        elif marker == 0xC4:  # DHT
            q = 0
            while q < len(body):
                cls, tid = body[q] >> 4, body[q] & 0x0F
                bits = list(body[q + 1:q + 17])
                nv = sum(bits)
                vals = list(body[q + 17:q + 17 + nv])
                if len(bits) != 16 or len(vals) != nv:
                    raise JPEGError("truncated DHT")
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                q += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JPEGError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGError(
                f"non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/arithmetic) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            state, pos = _decode_scan(
                data, pos, frame, scan, qt, huff, restart_interval,
                state,
            )
            fh, fw, comps = frame
            if len(state[2]) == len(comps):
                return _assemble(frame, state[0])
    if frame is not None and state is not None:
        raise JPEGError(
            "stream ended before every component was scanned"
        )
    raise JPEGError("no scan in stream")


def _mcu_geometry(frame):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return hmax, vmax, -(-fw // (8 * hmax)), -(-fh // (8 * vmax))


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval,
                 state):
    """Decode ONE scan (interleaved when it carries several
    components, non-interleaved block order when it carries one) into
    the shared component planes; returns the updated state and the
    stream position of the next marker."""
    fh, fw, comps = frame
    hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
    if state is None:
        planes = {
            cid: np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
            for cid, ch, cv, tq in comps
        }
        state = (planes, {cid: 0 for cid, *_ in comps}, set())
    planes, prev_dc, scanned = state
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    for cid, _, _ in scan:
        if cid not in by_id:
            raise JPEGError(f"scan names unknown component {cid}")
        scanned.add(cid)

    r = _BitReader(data[pos:])

    # Batched-IDCT restructure (optimization r13, bit-identical): the
    # serial huffman loop only RECORDS each block's zigzag
    # coefficients and placement; dequantization, un-zigzag and the
    # 2-D IDCT then run ONCE per component as vectorized numpy over
    # the stacked blocks (np.matmul batches the identical 8x8 gemms,
    # so each slice's floating result is the same as the per-block
    # _idct2). Per-block numpy was ~60% of decode time after the
    # huffman LUT.
    pending: dict[int, tuple[list, list]] = {
        cid: ([], []) for cid, *_ in comps
    }

    def decode_block(cid, dct, act, tq, y0, x0):
        zz = np.zeros(64, dtype=np.int64)
        s = huff[(0, dct)].decode(r)
        if s > 11:  # baseline DC categories are 0..11 (T.81 F.1.2.1)
            raise JPEGError(f"invalid DC category {s}")
        prev_dc[cid] += _receive_extend(r, s)
        zz[0] = prev_dc[cid]
        k = 1
        while k < 64:
            rs = huff[(1, act)].decode(r)
            rr, cat = rs >> 4, rs & 0x0F
            if cat > 10:  # baseline AC categories are 1..10
                raise JPEGError(f"invalid AC category {cat}")
            if cat == 0:
                if rr == 15:
                    k += 16
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise JPEGError("AC index overflow")
            zz[k] = _receive_extend(r, cat)
            k += 1
        zzs, spots = pending[cid]
        zzs.append(zz)
        spots.append((y0, x0))

    def flush_pending():
        for cid, (zzs, spots) in pending.items():
            if not zzs:
                continue
            tq = by_id[cid][2]
            dq = np.stack(zzs) * qt[tq].reshape(64)[_ZIGZAG]
            coefs = dq[:, _UNZIGZAG].reshape(-1, 8, 8)
            px = np.matmul(np.matmul(_C.T, coefs), _C) + 128.0
            plane = planes[cid]
            for i, (y0, x0) in enumerate(spots):
                plane[y0:y0 + 8, x0:x0 + 8] = px[i]
            pending[cid] = ([], [])

    n_done = 0

    def maybe_restart():
        nonlocal n_done
        if restart_interval and n_done and \
                n_done % restart_interval == 0:
            r.sync_restart()
            for c in prev_dc:
                prev_dc[c] = 0
        n_done += 1

    if len(scan) > 1:  # interleaved: MCUs of hxv blocks per component
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for cid, dct, act in scan:
                    ch, cv, tq = by_id[cid]
                    for v in range(cv):
                        for u in range(ch):
                            decode_block(
                                cid, dct, act, tq,
                                (my * cv + v) * 8, (mx * ch + u) * 8,
                            )
    else:  # non-interleaved: the component's own block raster
        cid, dct, act = scan[0]
        ch, cv, tq = by_id[cid]
        bw = -(-(fw * ch) // (8 * hmax))
        bh = -(-(fh * cv) // (8 * vmax))
        for byi in range(bh):
            for bxi in range(bw):
                maybe_restart()
                decode_block(cid, dct, act, tq, byi * 8, bxi * 8)
    flush_pending()

    # bit reader consumed r.pos bytes of entropy data; the next
    # marker starts at the first FF followed by a non-stuffing,
    # non-restart byte at or after it
    end = pos + r.pos
    while end + 1 < len(data):
        if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
            0xD0 <= data[end + 1] <= 0xD7
        ):
            break
        end += 1
    return (planes, prev_dc, scanned), end


def _assemble(frame, planes):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        y = planes[comps[0][0]][:fh, :fw]
        return np.clip(np.floor(y + 0.5), 0, 255).astype(np.uint8)
    full = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:  # upsample to full resolution
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        full.append(p[:fh, :fw])
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
