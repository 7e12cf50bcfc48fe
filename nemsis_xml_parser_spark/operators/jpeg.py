"""Baseline (SOF0) JPEG codec — pure Python, stdlib ``struct`` + numpy.

Closes the JPEG half of the codec seam the same way PNG was closed
(multimodal.decode_png_pixels): a REAL whole-codec implementation, no
image library.  Scope is baseline sequential DCT, 8-bit samples, Huffman
entropy coding, grayscale, 4:4:4 and subsampled 4:2:0/4:2:2 color
(sampling factors 1-2, general interleaved MCU decode with
nearest-neighbor chroma upsampling), and restart intervals (DRI +
RSTn markers: byte alignment, sequence-number checking, DC predictor
resets); progressive (SOF2), arithmetic coding, sampling factors above
2 and video remain explicit ``NotImplementedError`` seams.

The decoder is GENERAL for that scope: it walks the marker stream,
reads quantization and Huffman tables from DQT/DHT (canonical
code reconstruction — it decodes any table a writer embeds, not just
this encoder's), Huffman-decodes DC diffs and AC run/size symbols with
0xFF-stuffing-aware bit reads, dequantizes through the zigzag order,
applies the 2-D IDCT and level shift, and clips to 8 bits.

Exactness lever for oracle-checked queries: a JPEG whose 8×8 blocks are
each CONSTANT, with DC quantizer 8, round-trips bit-exactly — the DCT of
a constant block is DC-only (8·(v−128), AC ≈ 1e-13 quantizes to 0), the
DC quantizes to the integer v−128 with no loss, and the IDCT returns the
constant exactly (float error ~1e-14, far below the round boundary).  So
a corpus of constant-block JPEGs has CLOSED-FORM decoded pixels, giving
the lossy codec the same closed-form SQL oracle contract as the lossless
PNG path, while the decode still exercises the full real machinery.

Huffman tables: canonical tables embedded in DHT and read back by the
decoder — DC categories 0..11 at 4 bits, all 256 AC run/size symbols at
9 bits (code space 256/512, the all-ones code unused as the spec
requires).  Interoperable baseline JPEG: any standard reader decodes
these files.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """The standard JPEG zigzag order, generated from the diagonal rule
    (even diagonals walk up-right, odd walk down-left) instead of a
    transcribed table."""
    order = []
    for d in range(15):
        diag = [(u, d - u) for u in range(max(0, d - 7), min(d, 7) + 1)]
        order.extend(diag if d % 2 == 1 else diag[::-1])
    return order


ZIGZAG = _zigzag()

#: DCT basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16); S = A·s·Aᵀ, s = Aᵀ·S·A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: quantization table (zigzag index order): DC step 8 (makes constant
#: blocks lossless), AC step 16
QTABLE_ZZ = np.array([8] + [16] * 63, dtype=np.int32)

# canonical Huffman specs: {symbol: (code, length)}.  The AC alphabet is
# the standard 162-symbol set (EOB, ZRL, run 0..15 × size 1..10 — a DHT
# BITS entry is one byte, so a single length can carry at most 255
# codes; 162 9-bit codes use 162/512 of the code space and leave the
# all-ones code unused as the spec requires).
_DC_SYMBOLS = list(range(12))  # DC size categories, 4-bit codes
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_CODES = {s: (i, 4) for i, s in enumerate(_DC_SYMBOLS)}
_AC_CODES = {s: (i, 9) for i, s in enumerate(sorted(_AC_SYMBOLS))}

# 12-bit (extended sequential) alphabets: DC categories 0..15 (5-bit
# codes, 16/32 of the space), AC run 0..15 x size 1..14 plus EOB/ZRL
# (226 10-bit codes, 226/1024 — all-ones stays unused as required)
_DC12_SYMBOLS = list(range(16))
_AC12_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
_DC12_CODES = {s: (i, 5) for i, s in enumerate(_DC12_SYMBOLS)}
_AC12_CODES = {s: (i, 10) for i, s in enumerate(sorted(set(_AC12_SYMBOLS)))}


def _dht_payload(table_class: int, table_id: int, codes: dict[int, tuple[int, int]]) -> bytes:
    """DHT segment body: Tc/Th, BITS[1..16], then symbols in code order."""
    by_len: dict[int, list[int]] = {}
    for sym, (code, length) in codes.items():
        by_len.setdefault(length, []).append((code, sym))
    bits = bytes((len(by_len.get(ln, [])) for ln in range(1, 17)))
    vals = bytes(
        sym
        for ln in range(1, 17)
        for _, sym in sorted(by_len.get(ln, []))
    )
    return bytes([(table_class << 4) | table_id]) + bits + vals


# ---------------------------------------------------------------------------
# bit-level I/O (0xFF byte stuffing)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def emit_restart(self, n: int) -> None:
        """Byte-align and append an RSTn marker (marker bytes are raw —
        never 0x00-stuffed)."""
        self.pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self, n: int) -> None:
        """Consume an RSTn marker: discard the 1-padding to the byte
        boundary (``read_bit`` never banks more than 7 bits, so dropping
        the accumulator IS byte alignment), then the two marker bytes,
        checking the 3-bit modulo-8 sequence number the spec cycles."""
        self.acc = 0
        self.nbits = 0
        b0, b1 = self.buf[self.pos], self.buf[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError(
                f"expected RST{n % 8} marker, found 0x{b0:02X}{b1:02X}"
            )
        if b1 - 0xD0 != n % 8:
            raise ValueError(
                f"restart marker out of sequence: RST{b1 - 0xD0}, "
                f"expected RST{n % 8}"
            )
        self.pos += 2


def _receive_extend(r: _BitReader, size: int) -> int:
    """JPEG RECEIVE/EXTEND: ``size`` magnitude bits → signed value."""
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v < (1 << (size - 1)):  # negative branch (one's complement)
        v -= (1 << size) - 1
    return v


def _category(v: int) -> int:
    """Bit length of |v| (JPEG size category)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_baseline_jpeg(px: np.ndarray, restart_interval: int = 0) -> bytes:
    """8-bit baseline JPEG bytes from an (h, w) grayscale array (or
    (h, w, 1)).  Dimensions are padded to 8-multiples by edge
    replication; the decoder crops back using the SOF dimensions.

    ``restart_interval`` > 0 writes a DRI segment and inserts RSTn
    markers every that-many MCUs (grayscale: 1 block = 1 MCU) —
    byte-aligned with 1-bit padding, DC predictors reset, sequence
    numbers cycling RST0..RST7 per the spec — the layout real camera
    JPEGs use so a corrupted scan only loses one interval."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    if px.ndim != 2:
        raise NotImplementedError(
            "encode_baseline_jpeg writes grayscale only (color encode is "
            "outside the fixture scope; the DECODER handles 4:4:4 color)"
        )
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    q = np.empty((8, 8), dtype=np.float64)
    for idx, (u, v) in enumerate(ZIGZAG):
        q[u, v] = QTABLE_ZZ[idx]

    bw = _BitWriter()
    prev_dc = 0
    mcu_count = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.emit_restart(mcu_count // restart_interval - 1)
                prev_dc = 0
            mcu_count += 1
            prev_dc = _encode_block_stream(
                bw, padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q, prev_dc
            )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in QTABLE_ZZ))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(0xC4, _dht_payload(0, 0, _DC_CODES)) + seg(
        0xC4, _dht_payload(1, 0, _AC_CODES)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + scan + b"\xff\xd9"


def encode_jpeg12(px: np.ndarray) -> bytes:
    """12-bit EXTENDED SEQUENTIAL grayscale JPEG (SOF1, precision 12 —
    the medical/scientific-imaging profile): samples in [0, 4095],
    level shift 2048, 16-bit DQT entries (Pq=1, the form 12-bit
    streams use), and the extended Huffman alphabets (DC categories to
    15, AC sizes to 14).  Dimensions pad to 8-multiples by edge
    replication; the decoder crops via the SOF dimensions."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise NotImplementedError("encode_jpeg12 writes grayscale only")
    if px.min() < 0 or px.max() > 4095:
        raise ValueError("12-bit samples must lie in [0, 4095]")
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    q = np.empty((8, 8), dtype=np.float64)
    for idx, (u, v) in enumerate(ZIGZAG):
        q[u, v] = QTABLE_ZZ[idx]

    bw = _BitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            prev_dc = _encode_block_stream(
                bw,
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                q,
                prev_dc,
                level_shift=2048.0,
                dc_codes=_DC12_CODES,
                ac_codes=_AC12_CODES,
            )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(
        0xDB,
        bytes([0x10]) + b"".join(struct.pack(">H", int(x)) for x in QTABLE_ZZ),
    )
    sof = seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, _dht_payload(0, 0, _DC12_CODES)) + seg(
        0xC4, _dht_payload(1, 0, _AC12_CODES)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _build_huffman(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical reconstruction: {(length, code): symbol} from DHT
    BITS/HUFFVAL (the JPEG Generate_size_table/Generate_code_table
    procedure)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in scan")


def decode_baseline_jpeg(buf: bytes) -> np.ndarray:
    """Pixels of a baseline JPEG: (h, w) uint8 for grayscale, (h, w, 3)
    RGB for 4:4:4 color.  Honors DRI restart intervals (RSTn markers
    verified in sequence, DC predictors reset per interval).  Raises
    ``NotImplementedError`` for progressive / arithmetic streams — the
    remaining codec seam (with non-MJPG video)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, qid)])
    scan_comps = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        seglen = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        body = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        body[o + 1 : o + 65], dtype=np.uint8
                    ).astype(np.int32)
                    o += 65
                else:  # Pq=1: 16-bit big-endian entries (12-bit streams)
                    qtables[tq] = np.frombuffer(
                        body[o + 1 : o + 129], dtype=">u2"
                    ).astype(np.int32)
                    o += 129
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = body[o + 1 : o + 17]
                n = sum(bits)
                vals = body[o + 17 : o + 17 + n]
                htables[(tc, th)] = _build_huffman(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if marker == 0xC0 and precision != 8:
                raise ValueError("SOF0 requires 8-bit precision")
            if precision not in (8, 12):
                raise NotImplementedError(f"{precision}-bit precision")
            if precision == 12 and ncomp != 1:
                raise NotImplementedError(
                    "12-bit JPEG decode is grayscale-only here"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} (only 1-2 supported: "
                        "4:4:4, 4:2:0, 4:2:2)"
                    )
                comps.append((cid, tq, hi, vi))
            frame = (h, w, comps, precision)
        elif marker == 0xC2:  # progressive DCT — dedicated multi-scan path
            from .jpeg_progressive import decode_progressive_jpeg

            return decode_progressive_jpeg(buf)
        elif marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/arithmetic progressive JPEG (SOF6/10/14)"
            )
        elif marker in (0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("lossless/arithmetic JPEG variants")
        elif marker == 0xDD:  # DRI — MCUs per restart interval (0 = off)
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            break
        # APPn/COM/others: skipped
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps, precision = frame
    shift = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    out_dtype = np.uint8 if precision == 8 else np.uint16
    qt_by_cid = {cid: qtables[tq] for cid, tq, _, _ in comps}
    hv_by_cid = {cid: (hi, vi) for cid, _, hi, vi in comps}
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    r = _BitReader(buf, pos)
    # MCU grid covers the full image at 8*hmax x 8*vmax pixels per MCU;
    # each component contributes hi x vi blocks per MCU into its own
    # (possibly subsampled) plane
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = {
        cid: np.empty((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for cid, _, hi, vi in comps
    }
    q_spatial = {}
    for cid, _, _, _ in comps:
        qs = np.empty((8, 8), dtype=np.float64)
        for idx, (u, v) in enumerate(ZIGZAG):
            qs[u, v] = qt_by_cid[cid][idx]
        q_spatial[cid] = qs
    prev_dc = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align, swallow RSTn, reset every DC predictor
                r.expect_restart(mcu_count // restart_interval - 1)
                prev_dc = {cid: 0 for cid in prev_dc}
            mcu_count += 1
            for cid, dc_id, ac_id in scan_comps:
                hi, vi = hv_by_cid[cid]
                dc_tab = htables[(0, dc_id)]
                ac_tab = htables[(1, ac_id)]
                for dy in range(vi):
                    for dx in range(hi):
                        s = np.zeros((8, 8), dtype=np.float64)
                        cat = _decode_symbol(r, dc_tab)
                        prev_dc[cid] += _receive_extend(r, cat)
                        s[0, 0] = prev_dc[cid]
                        k = 1
                        while k < 64:
                            sym = _decode_symbol(r, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index out of range"
                                )
                            u, v = ZIGZAG[k]
                            s[u, v] = _receive_extend(r, size)
                            k += 1
                        block = _A.T @ (s * q_spatial[cid]) @ _A + shift
                        py = (my * vi + dy) * 8
                        px = (mx * hi + dx) * 8
                        planes[cid][py : py + 8, px : px + 8] = block
    out = []
    for cid, _, hi, vi in comps:
        plane = planes[cid]
        if hi < hmax or vi < vmax:  # nearest-neighbor chroma upsample
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        out.append(
            np.clip(np.round(plane[:h, :w]), 0, maxval).astype(out_dtype)
        )
    if len(out) == 1:
        return out[0]
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG")
    y, cb, cr = (p.astype(np.float64) for p in out)
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# deterministic fixtures (closed-form decoded pixels)
# ---------------------------------------------------------------------------


def make_jpeg_image(image_id: int) -> bytes:
    """Deterministic REAL baseline JPEG from an integer id: width =
    8·(id%3+1), height = 8·(id%2+1), every 8×8 block CONSTANT at
    v(bx, by) = (id·11 + 13·bx + 29·by) mod 256 — the exact-round-trip
    construction (module docstring), so decoded pixel (x, y) =
    v(x//8, y//8) in closed form for the SQL oracle.

    DRI coverage: restart interval = id mod 4 (0 = no restarts), so the
    fixture corpus mixes plain scans with RST-marker streams of 1-3 MCU
    intervals — the oracle's closed form is unchanged (restart framing
    resets the DC predictor, and a from-zero DC diff of a constant block
    is still lossless), but any drift in byte alignment, RSTn sequence
    numbers or predictor resets breaks the hash."""
    w, h = 8 * (image_id % 3 + 1), 8 * (image_id % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    v = (image_id * 11 + 13 * bx + 29 * by) % 256
    px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    return encode_baseline_jpeg(px, restart_interval=image_id % 4)


# ---------------------------------------------------------------------------
# 4:2:0 color encoder (YCbCr planes / RGB convenience) + fixtures
# ---------------------------------------------------------------------------


def _encode_block_stream(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    prev_dc: int,
    level_shift: float = 128.0,
    dc_codes: dict[int, tuple[int, int]] | None = None,
    ac_codes: dict[int, tuple[int, int]] | None = None,
) -> int:
    """DCT → quantize → Huffman-encode one 8×8 block; returns its DC.
    ``level_shift``/``dc_codes``/``ac_codes`` default to the 8-bit
    baseline; the 12-bit extended-sequential writer passes 2048 and the
    extended alphabets."""
    dc_codes = _DC_CODES if dc_codes is None else dc_codes
    ac_codes = _AC_CODES if ac_codes is None else ac_codes
    coefs = _A @ (block - level_shift) @ _A.T
    qz = np.round(coefs / q).astype(np.int64)
    zz = [int(qz[u, v]) for (u, v) in ZIGZAG]
    diff = zz[0] - prev_dc
    cat = _category(diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        size = _category(zz[k])
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(zz[k] if zz[k] >= 0 else zz[k] + (1 << size) - 1, size)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return zz[0]


#: chroma quantization table (zigzag order): DC 8 (constant-block
#: losslessness), AC 24 — distinct from luma so table-per-component
#: wiring is actually exercised
QTABLE_CHROMA_ZZ = np.array([8] + [24] * 63, dtype=np.int32)


def encode_baseline_jpeg_420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """4:2:0 baseline JPEG from a full-res luma plane (h, w) and
    HALF-RES chroma planes (h/2, w/2).  h and w must be multiples of
    16 (one MCU = 2×2 luma blocks + 1 Cb + 1 Cr).  Two quantization
    tables (luma 0, chroma 1) and two Huffman table pairs (identical
    content, distinct ids) — the standard interleaved layout any JPEG
    reader decodes."""
    y = np.asarray(y, dtype=np.float64)
    cb = np.asarray(cb, dtype=np.float64)
    cr = np.asarray(cr, dtype=np.float64)
    h, w = y.shape
    if h % 16 or w % 16:
        raise NotImplementedError("encode_baseline_jpeg_420 needs 16-multiples")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be half-resolution")

    def spatial(zz_table: np.ndarray) -> np.ndarray:
        q = np.empty((8, 8), dtype=np.float64)
        for idx, (u, v) in enumerate(ZIGZAG):
            q[u, v] = zz_table[idx]
        return q

    qy, qc = spatial(QTABLE_ZZ), spatial(QTABLE_CHROMA_ZZ)
    bw = _BitWriter()
    dc = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in range(2):  # 4 luma blocks, raster order
                for dx in range(2):
                    py, px = my * 16 + dy * 8, mx * 16 + dx * 8
                    dc[1] = _encode_block_stream(
                        bw, y[py : py + 8, px : px + 8], qy, dc[1]
                    )
            py, px = my * 8, mx * 8
            dc[2] = _encode_block_stream(
                bw, cb[py : py + 8, px : px + 8], qc, dc[2]
            )
            dc[3] = _encode_block_stream(
                bw, cr[py : py + 8, px : px + 8], qc, dc[3]
            )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in QTABLE_ZZ)) + seg(
        0xDB, bytes([0x01]) + bytes(int(x) for x in QTABLE_CHROMA_ZZ)
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling, qtable 0
        + bytes([2, 0x11, 1])  # Cb: 1x1, qtable 1
        + bytes([3, 0x11, 1]),  # Cr: 1x1, qtable 1
    )
    dht = (
        seg(0xC4, _dht_payload(0, 0, _DC_CODES))
        + seg(0xC4, _dht_payload(1, 0, _AC_CODES))
        + seg(0xC4, _dht_payload(0, 1, _DC_CODES))
        + seg(0xC4, _dht_payload(1, 1, _AC_CODES))
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def encode_baseline_jpeg_rgb420(rgb: np.ndarray) -> bytes:
    """Convenience: RGB (h, w, 3) → JFIF YCbCr conversion → 2×2 box
    chroma downsample → ``encode_baseline_jpeg_420``."""
    rgb = np.asarray(rgb, dtype=np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def box2(p: np.ndarray) -> np.ndarray:
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    return encode_baseline_jpeg_420(y, box2(cb), box2(cr))


#: chroma fixture values stay in [80, 176): excludes the four
#: (cb, cr) combinations where the JFIF float conversion lands exactly
#: on a .5 rounding boundary (np.round is half-even, SQL ROUND is
#: half-away — verified exhaustively over the full integer domain)
_CHROMA_LO, _CHROMA_SPAN = 80, 96


def make_jpeg420_image(image_id: int) -> bytes:
    """Deterministic REAL 4:2:0 color JPEG: width = 16·(id%3+1), height
    = 16·(id%2+1); every 16×16 MCU is constant in YCbCr at
    Y = (id·5+7mx+11my) mod 256, Cb = 80 + (id·3+13mx+17my) mod 96,
    Cr = 80 + (id·7+19mx+23my) mod 96 — constant blocks with DC
    quantizer 8 decode back to these exact integers, so the decoded
    RGB is the closed form clip(round(JFIF inverse)) per MCU."""
    w, h = 16 * (image_id % 3 + 1), 16 * (image_id % 2 + 1)
    mx = np.arange(w // 16).reshape(1, -1)
    my = np.arange(h // 16).reshape(-1, 1)
    yv = (image_id * 5 + 7 * mx + 11 * my) % 256
    cbv = _CHROMA_LO + (image_id * 3 + 13 * mx + 17 * my) % _CHROMA_SPAN
    crv = _CHROMA_LO + (image_id * 7 + 19 * mx + 23 * my) % _CHROMA_SPAN
    y = np.repeat(np.repeat(yv, 16, axis=0), 16, axis=1)
    cb = np.repeat(np.repeat(cbv, 8, axis=0), 8, axis=1)
    cr = np.repeat(np.repeat(crv, 8, axis=0), 8, axis=1)
    return encode_baseline_jpeg_420(y, cb, cr)


def make_jpeg12_image(image_id: int) -> bytes:
    """Deterministic REAL 12-bit JPEG: (id%3+2) x (id%4+2) grid of
    constant 8x8 blocks, block value v(bx, by) = (id*37 + 131*bx +
    197*by) mod 4096 — constant blocks quantize losslessly under the
    DC-step-8 table, so decoded pixels are closed-form for the SQL
    oracle (wrong level shift, 16-bit DQT parse or extended-alphabet
    decode breaks the hash)."""
    bh, bw = image_id % 3 + 2, image_id % 4 + 2
    by = np.arange(bh).reshape(bh, 1)
    bx = np.arange(bw).reshape(1, bw)
    blocks = (image_id * 37 + 131 * bx + 197 * by) % 4096
    px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint16)
    return encode_jpeg12(px)
