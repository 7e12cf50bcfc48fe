"""Progressive (SOF2) JPEG codec — grayscale, pure Python, closing the
codec seam ``operators/jpeg.py`` left as its largest named raise.

Progressive JPEG splits the quantized DCT coefficients across SCANS
instead of sending each block once: DC and AC travel separately
(spectral selection, Ss..Se) and each can arrive in bit-planes
(successive approximation, Ah/Al).  The decoder therefore keeps a
COEFFICIENT buffer per block and folds every scan into it; pixels only
exist after EOI.  The four scan kinds (ITU T.81 §G):

* DC first (Ss=Se=0, Ah=0): baseline-style Huffman DC diffs, values
  left-shifted by Al into the buffer;
* DC refinement (Ah>0): ONE raw bit per block, OR-ed in at Al;
* AC first (Ss≥1, Ah=0): run/size symbols as baseline plus EOBn — an
  end-of-band RUN of 2^r + extra-bits blocks whose remaining band is
  entirely zero (the key progressive-only device);
* AC refinement (Ah>0): newly significant coefficients arrive as ±1<<Al
  with their zero-HISTORY run length, while every already-nonzero
  coefficient crossed (or covered by an EOB run) contributes one
  appended CORRECTION bit (§G.1.2.3) — the subtle part, exercised by
  the gradient round-trip tests, not just constant fixtures.

Scope: 8-bit single-component (grayscale) streams, any scan script a
writer chooses within that; multi-component progressive and DRI-inside-
progressive raise ``NotImplementedError`` (named seams).  The encoder
emits a 6-scan script (DC Al=1 + refine, two AC bands at Al=1 + their
refinements) so every decode path above is exercised by its own output;
the deterministic fixture keeps the constant-block exactness lever of
the baseline codec, so the oracled query stays closed-form.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    QTABLE_ZZ,
    ZIGZAG,
    _A,
    _BitReader,
    _BitWriter,
    _build_huffman,
    _category,
    _decode_symbol,
    _dht_payload,
    _receive_extend,
)

# progressive AC alphabet: EOBn (r<<4 | 0, r = 0..14), ZRL (0xF0), and
# run/size symbols — 176 canonical 9-bit codes (all-ones unused per spec)
_P_AC_SYMBOLS = sorted(
    [(r << 4) for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_P_AC_CODES = {s: (i, 9) for i, s in enumerate(_P_AC_SYMBOLS)}
_P_DC_CODES = {s: (i, 4) for i, s in enumerate(range(12))}

#: the encoder's scan script: (kind, Ss, Se, Ah, Al)
SCAN_SCRIPT = (
    ("dc", 0, 0, 0, 1),
    ("dc", 0, 0, 1, 0),
    ("ac", 1, 5, 0, 1),
    ("ac", 6, 63, 0, 1),
    ("ac", 1, 5, 1, 0),
    ("ac", 6, 63, 1, 0),
)


def _pt(v: int, al: int) -> int:
    """Point transform: arithmetic shift toward zero (T.81 A.4)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _quantized_blocks(px: np.ndarray) -> tuple[int, int, int, int, list[list[int]]]:
    """(h, w, blocks_y, blocks_x, zigzag coefficient lists) — the same
    DCT/quantization as the baseline encoder."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise NotImplementedError("progressive encoder is grayscale-only")
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    q = np.empty((8, 8), dtype=np.float64)
    for idx, (u, v) in enumerate(ZIGZAG):
        q[u, v] = QTABLE_ZZ[idx]
    blocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coefs = _A @ (blk - 128.0) @ _A.T
            qz = np.round(coefs / q).astype(np.int64)
            blocks.append([int(qz[u, v]) for (u, v) in ZIGZAG])
    return h, w, ph // 8, pw // 8, blocks


def _encode_dc_first(bw: _BitWriter, blocks: list[list[int]], al: int) -> None:
    prev = 0
    for zz in blocks:
        v = zz[0] >> al  # DC point transform is the ARITHMETIC shift (A.4)
        diff = v - prev
        prev = v
        cat = _category(diff)
        code, ln = _P_DC_CODES[cat]
        bw.write(code, ln)
        if cat:
            bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)


def _encode_dc_refine(bw: _BitWriter, blocks: list[list[int]], al: int) -> None:
    for zz in blocks:
        bw.write((zz[0] >> al) & 1, 1)  # two's-complement bit Al


def _flush_eobrun(bw: _BitWriter, eobrun: int, pending: list[int]) -> int:
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = _P_AC_CODES[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
        for bit in pending:
            bw.write(bit, 1)
        pending.clear()
    return 0


def _encode_ac_first(
    bw: _BitWriter, blocks: list[list[int]], ss: int, se: int, al: int
) -> None:
    eobrun = 0
    for zz in blocks:
        band = [_pt(zz[k], al) for k in range(ss, se + 1)]
        if not any(band):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, [])
            continue
        eobrun = _flush_eobrun(bw, eobrun, [])
        run = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i, v in enumerate(band[: last_nz + 1]):
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _P_AC_CODES[0xF0]
                bw.write(code, ln)
                run -= 16
            size = _category(v)
            code, ln = _P_AC_CODES[(run << 4) | size]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < len(band) - 1:
            eobrun += 1
    _flush_eobrun(bw, eobrun, [])


def _encode_ac_refine(
    bw: _BitWriter, blocks: list[list[int]], ss: int, se: int, al: int
) -> None:
    """§G.1.2.3: newly significant coefficients as (zero-history-run, ±1),
    correction bits appended for every nonzero-history coefficient the
    symbol's run crosses; EOB runs carry the remaining correction bits."""
    eobrun = 0
    pending: list[int] = []
    for zz in blocks:
        hist = [_pt(zz[k], al + 1) for k in range(ss, se + 1)]  # known so far
        now = [_pt(zz[k], al) for k in range(ss, se + 1)]
        newly = [
            i for i in range(len(now)) if hist[i] == 0 and now[i] != 0
        ]
        if not newly:
            eobrun += 1
            pending.extend((abs(now[i]) & 1) for i in range(len(now)) if hist[i])
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, pending)
            continue
        eobrun = _flush_eobrun(bw, eobrun, pending)
        pos = 0
        corrections: list[int] = []
        for tgt in newly:
            run = 0
            while pos < tgt:
                if hist[pos] == 0:
                    if run == 15:
                        code, ln = _P_AC_CODES[0xF0]
                        bw.write(code, ln)
                        for bit in corrections:
                            bw.write(bit, 1)
                        corrections = []
                        run = 0
                    else:
                        run += 1
                else:
                    corrections.append(abs(now[pos]) & 1)
                pos += 1
            code, ln = _P_AC_CODES[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if now[tgt] > 0 else 0, 1)
            for bit in corrections:
                bw.write(bit, 1)
            corrections = []
            pos = tgt + 1
        # rest of the band: correction bits ride the (eventual) EOB run
        rest = [
            (abs(now[i]) & 1) for i in range(pos, len(now)) if hist[i]
        ]
        if rest or pos <= len(now) - 1:
            eobrun += 1
            pending.extend(rest)
        elif pos > len(now) - 1:
            pass  # newly significant coefficient was the band's last slot
    _flush_eobrun(bw, eobrun, pending)


def encode_progressive_jpeg(px: np.ndarray, wide_dqt: bool = False) -> bytes:
    """Grayscale progressive JPEG with the 6-scan ``SCAN_SCRIPT``.
    ``wide_dqt=True`` writes the quantization table with Pq=1 (16-bit
    big-endian entries) — same values, wider storage; some encoders
    always emit this form."""
    h, w, _by, _bx, blocks = _quantized_blocks(px)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    if wide_dqt:
        out += seg(
            0xDB,
            bytes([0x10])
            + b"".join(struct.pack(">H", int(x)) for x in QTABLE_ZZ),
        )
    else:
        out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in QTABLE_ZZ))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, _dht_payload(0, 0, _P_DC_CODES))
    out += seg(0xC4, _dht_payload(1, 0, _P_AC_CODES))
    for kind, ss, se, ah, al in SCAN_SCRIPT:
        bw = _BitWriter()
        if kind == "dc":
            if ah == 0:
                _encode_dc_first(bw, blocks, al)
            else:
                _encode_dc_refine(bw, blocks, al)
        else:
            if ah == 0:
                _encode_ac_first(bw, blocks, ss, se, al)
            else:
                _encode_ac_refine(bw, blocks, ss, se, al)
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_first_interleaved(
    bw: _BitWriter, planes: list[list[list[int]]], al: int
) -> None:
    """Interleaved DC-first scan (the only multi-component scan kind
    progressive allows, T.81 §G.1.1): with 1x1 sampling every MCU is one
    block per component in component order; each component keeps its own
    DC predictor."""
    prev = [0] * len(planes)
    for b in range(len(planes[0])):
        for c, blocks in enumerate(planes):
            v = blocks[b][0] >> al
            diff = v - prev[c]
            prev[c] = v
            cat = _category(diff)
            code, ln = _P_DC_CODES[cat]
            bw.write(code, ln)
            if cat:
                bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)


def _encode_dc_refine_interleaved(
    bw: _BitWriter, planes: list[list[list[int]]], al: int
) -> None:
    for b in range(len(planes[0])):
        for blocks in planes:
            bw.write((blocks[b][0] >> al) & 1, 1)


def encode_progressive_jpeg_color(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Three-component (YCbCr, 4:4:4 — no subsampling) progressive JPEG:
    interleaved DC scans (first at Al=1, refine to Al=0) followed by the
    per-component AC scans the spec mandates (AC scans are always
    single-component, §G.1.1), two per component (1..63 at Al=1, then
    the refinement).  All components share quantization table 0 and the
    deterministic one-length Huffman tables.  The 4:2:0 subsampled
    form is encode_progressive_jpeg_420 (r11)."""
    if not (y.shape == cb.shape == cr.shape):
        raise ValueError("color progressive needs equal-size planes (4:4:4)")
    h, w = y.shape
    planes = [_quantized_blocks(p)[4] for p in (y, cb, cr)]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in QTABLE_ZZ))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, _dht_payload(0, 0, _P_DC_CODES))
    out += seg(0xC4, _dht_payload(1, 0, _P_AC_CODES))
    # interleaved DC scans over all three components
    for ah, al in ((0, 1), (1, 0)):
        bw = _BitWriter()
        if ah == 0:
            _encode_dc_first_interleaved(bw, planes, al)
        else:
            _encode_dc_refine_interleaved(bw, planes, al)
        hdr = bytes([3])
        for cid in (1, 2, 3):
            hdr += bytes([cid, 0x00])
        out += seg(0xDA, hdr + bytes([0, 0, (ah << 4) | al]))
        out += bw.flush()
    # per-component AC scans
    for c, blocks in enumerate(planes):
        for ah, al in ((0, 1), (1, 0)):
            bw = _BitWriter()
            if ah == 0:
                _encode_ac_first(bw, blocks, 1, 63, al)
            else:
                _encode_ac_refine(bw, blocks, 1, 63, al)
            out += seg(
                0xDA, bytes([1, c + 1, 0x00, 1, 63, (ah << 4) | al])
            )
            out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_first_seq(bw: _BitWriter, seq, al: int, ncomp: int) -> None:
    """Interleaved DC-first over an explicit (comp, block) MCU-order
    sequence (the encoder twin of _decode_dc_first_seq)."""
    prev = [0] * ncomp
    for c, blk in seq:
        v = blk[0] >> al
        diff = v - prev[c]
        prev[c] = v
        cat = _category(diff)
        code, ln = _P_DC_CODES[cat]
        bw.write(code, ln)
        if cat:
            bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)


def _encode_dc_refine_seq(bw: _BitWriter, seq, al: int) -> None:
    for _c, blk in seq:
        bw.write((blk[0] >> al) & 1, 1)


def encode_progressive_jpeg_420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Three-component 4:2:0-SUBSAMPLED progressive JPEG (the seam the
    r10 verdict named): Y sampled 2x2, chroma 1x1 at half resolution in
    both axes.  Interleaved DC scans walk the T.81 §A.2.3 MCU order
    (four Y blocks left-to-right/top-to-bottom, then Cb, then Cr);
    the per-component AC scans cover each component's own block grid.
    Dimensions must be multiples of 16 so the padded (MCU-aligned) and
    true block grids coincide — the fixture generator guarantees it."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("4:2:0 fixture encoder needs 16-aligned dims")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be half-resolution")
    planes = [_quantized_blocks(p)[4] for p in (y, cb, cr)]
    nbx_y = w // 8
    nbx_c = w // 16

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in QTABLE_ZZ))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, samp in ((1, 0x22), (2, 0x11), (3, 0x11)):
        sof += bytes([cid, samp, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, _dht_payload(0, 0, _P_DC_CODES))
    out += seg(0xC4, _dht_payload(1, 0, _P_AC_CODES))
    seq: list[tuple[int, list[int]]] = []
    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in range(2):
                for dx in range(2):
                    seq.append(
                        (0, planes[0][(2 * my + dy) * nbx_y + 2 * mx + dx])
                    )
            seq.append((1, planes[1][my * nbx_c + mx]))
            seq.append((2, planes[2][my * nbx_c + mx]))
    for ah, al in ((0, 1), (1, 0)):
        bw = _BitWriter()
        if ah == 0:
            _encode_dc_first_seq(bw, seq, al, 3)
        else:
            _encode_dc_refine_seq(bw, seq, al)
        hdr = bytes([3])
        for cid in (1, 2, 3):
            hdr += bytes([cid, 0x00])
        out += seg(0xDA, hdr + bytes([0, 0, (ah << 4) | al]))
        out += bw.flush()
    for c, blocks in enumerate(planes):
        for ah, al in ((0, 1), (1, 0)):
            bw = _BitWriter()
            if ah == 0:
                _encode_ac_first(bw, blocks, 1, 63, al)
            else:
                _encode_ac_refine(bw, blocks, 1, 63, al)
            out += seg(
                0xDA, bytes([1, c + 1, 0x00, 1, 63, (ah << 4) | al])
            )
            out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_dc_first_interleaved(r, planes, nblocks, dc_tab, al):
    prev = [0] * len(planes)
    for b in range(nblocks):
        for c, blocks in enumerate(planes):
            cat = _decode_symbol(r, dc_tab)
            prev[c] += _receive_extend(r, cat)
            blocks[b][0] = prev[c] << al


def _decode_dc_refine_interleaved(r, planes, nblocks, al):
    for b in range(nblocks):
        for blocks in planes:
            if r.read_bit():
                blocks[b][0] |= 1 << al


def _decode_dc_first(r, blocks, nblocks, dc_tab, al):
    prev = 0
    for b in range(nblocks):
        cat = _decode_symbol(r, dc_tab)
        prev += _receive_extend(r, cat)
        blocks[b][0] = prev << al


def _decode_dc_refine(r, blocks, nblocks, al):
    for b in range(nblocks):
        if r.read_bit():
            # bitwise OR accumulates correctly for negative DCs too
            # (Python ints are two's complement of infinite width)
            blocks[b][0] |= 1 << al


def _decode_ac_first(r, blocks, nblocks, ac_tab, ss, se, al):
    eobrun = 0
    for b in range(nblocks):
        if eobrun:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = _decode_symbol(r, ac_tab)
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.read_bits(run)
                break
            k += run
            if k > se:
                raise ValueError("AC first: index past band end")
            blocks[b][k] = _receive_extend(r, size) << al
            k += 1


def _refine_nonzero(r, coef, al):
    """Correction bit for an already-nonzero coefficient."""
    if r.read_bit():
        if coef > 0 and not (coef & (1 << al)):
            return coef + (1 << al)
        if coef < 0 and not (-coef & (1 << al)):
            return coef - (1 << al)
    return coef


def _decode_ac_refine(r, blocks, nblocks, ac_tab, ss, se, al):
    """The libjpeg decode_mcu_AC_refine control flow: per block, decode
    symbols until the band ends or an EOBn arrives; every advance over
    the coefficient band refines crossed nonzero coefficients with their
    correction bits; an active EOB run refines each covered block's
    remaining band and consumes one run unit per block."""
    eobrun = 0
    for b in range(nblocks):
        zz = blocks[b]
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _decode_symbol(r, ac_tab)
                run, size = sym >> 4, sym & 0x0F
                val = 0
                if size == 0:
                    if run != 15:  # EOBn — covers this block's remainder
                        eobrun = 1 << run
                        if run:
                            eobrun += r.read_bits(run)
                        break
                    # ZRL: run stays 15 → skips 16 zero-history slots
                else:
                    if size != 1:
                        raise ValueError("AC refine: magnitude must be ±1")
                    val = (1 << al) if r.read_bit() else -(1 << al)
                while k <= se:
                    if zz[k]:
                        zz[k] = _refine_nonzero(r, zz[k], al)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k]:
                    zz[k] = _refine_nonzero(r, zz[k], al)
                k += 1
            eobrun -= 1


def _decode_dc_first_seq(r, seq, dc_tabs, al, ncomp):
    """Interleaved DC-first over an explicit (comp, block) MCU-order
    sequence — the general-sampling walk (T.81 §A.2.3: within an MCU
    each component contributes Vi x Hi blocks left-to-right,
    top-to-bottom); per-component DC predictors."""
    prev = [0] * ncomp
    for c, blk in seq:
        cat = _decode_symbol(r, dc_tabs[c])
        prev[c] += _receive_extend(r, cat)
        blk[0] = prev[c] << al


def _decode_dc_refine_seq(r, seq, al):
    for _c, blk in seq:
        if r.read_bit():
            blk[0] |= 1 << al


def decode_progressive_jpeg(buf: bytes) -> np.ndarray:
    """Decoded pixels of a progressive JPEG: (h, w) uint8 for a
    single-component stream, (h, w, 3) uint8 of the RAW decoded planes
    (YCbCr, no color conversion — the stats layer works per channel)
    for a three-component stream.  Sampling factors Hi, Vi in {1, 2}
    are supported — 4:4:4, 4:2:0 and 4:2:2 (r11 closed the
    subsampling seam): interleaved DC scans walk the general MCU
    block order, non-interleaved AC scans cover each component's own
    (unpadded) block grid, and subsampled chroma is upsampled by
    sample replication on output."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    planes: list[list[list[int]]] | None = None
    comp_ids: list[int] = []
    comp_tqs: list[int] = []
    comp_samp: list[tuple[int, int]] = []  # (Hi, Vi)
    pad_nbx: list[int] = []  # padded (MCU-aligned) block grid per comp
    pad_nby: list[int] = []
    true_nbx: list[int] = []  # the component's own block grid
    true_nby: list[int] = []
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        body = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq == 1:  # 16-bit big-endian entries (Pq=1)
                    qtables[tq] = np.frombuffer(
                        body[o + 1 : o + 129], dtype=">u2"
                    ).astype(np.int32)
                    o += 129
                elif pq == 0:
                    qtables[tq] = np.frombuffer(
                        body[o + 1 : o + 65], dtype=np.uint8
                    ).astype(np.int32)
                    o += 65
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = body[o + 1 : o + 17]
                n = sum(bits)
                htables[(tc, th)] = _build_huffman(bits, body[o + 17 : o + 17 + n])
                o += 17 + n
        elif marker == 0xC2:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component progressive JPEG")
            comp_ids, comp_tqs, comp_samp = [], [], []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} (only 1 and 2)"
                    )
                comp_ids.append(cid)
                comp_tqs.append(tq)
                comp_samp.append((hi, vi))
            frame = (h, w)
            hmax = max(s[0] for s in comp_samp)
            vmax = max(s[1] for s in comp_samp)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            pad_nbx = [mcux * hi for hi, _ in comp_samp]
            pad_nby = [mcuy * vi for _, vi in comp_samp]
            # a component's own grid covers ceil(comp_dim / 8) where
            # comp_dim = ceil(dim * Si / Smax)  (T.81 A.1.1)
            true_nbx = [
                -(-(-(-w * hi // hmax)) // 8) for hi, _ in comp_samp
            ]
            true_nby = [
                -(-(-(-h * vi // vmax)) // 8) for _, vi in comp_samp
            ]
            planes = [
                [[0] * 64 for _ in range(pad_nby[c] * pad_nbx[c])]
                for c in range(ncomp)
            ]
        elif marker == 0xDD:
            if struct.unpack(">H", body[:2])[0] != 0:
                raise NotImplementedError("restart intervals in progressive")
        elif marker == 0xDA:
            if frame is None or planes is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = []  # (plane index, dc table id, ac table id)
            for s in range(ns):
                cid = body[1 + 2 * s]
                tabs = body[2 + 2 * s]
                scan_comps.append(
                    (comp_ids.index(cid), tabs >> 4, tabs & 0x0F)
                )
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            r = _BitReader(buf, pos)

            def comp_view(ci: int) -> list[list[int]]:
                # the component's own (unpadded) block grid in raster
                # order, as REFERENCES into the padded storage — the
                # non-interleaved scan helpers mutate blocks in place,
                # so a view list needs no writeback
                return [
                    planes[ci][y * pad_nbx[ci] + x]
                    for y in range(true_nby[ci])
                    for x in range(true_nbx[ci])
                ]

            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                if ns == 1:
                    ci, dc_id, _ = scan_comps[0]
                    view = comp_view(ci)
                    if ah == 0:
                        _decode_dc_first(
                            r, view, len(view), htables[(0, dc_id)], al
                        )
                    else:
                        _decode_dc_refine(r, view, len(view), al)
                elif ns == len(planes):
                    # interleaved DC scan: general MCU walk — each
                    # component contributes Vi x Hi padded-grid blocks
                    # per MCU, left-to-right then top-to-bottom
                    hmax = max(s[0] for s in comp_samp)
                    vmax = max(s[1] for s in comp_samp)
                    mcux = -(-frame[1] // (8 * hmax))
                    mcuy = -(-frame[0] // (8 * vmax))
                    seq: list[tuple[int, list[int]]] = []
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for pos_in_scan, (ci, _dc, _ac) in enumerate(
                                scan_comps
                            ):
                                hi, vi = comp_samp[ci]
                                for dy in range(vi):
                                    for dx in range(hi):
                                        seq.append((
                                            pos_in_scan,
                                            planes[ci][
                                                (my * vi + dy)
                                                * pad_nbx[ci]
                                                + mx * hi
                                                + dx
                                            ],
                                        ))
                    dc_tabs = [
                        htables[(0, dc_id)] for _, dc_id, _ in scan_comps
                    ]
                    if ah == 0:
                        _decode_dc_first_seq(r, seq, dc_tabs, al, ns)
                    else:
                        _decode_dc_refine_seq(r, seq, al)
                else:
                    raise NotImplementedError(
                        "partially interleaved progressive DC scan"
                    )
            else:
                if ns != 1:
                    raise ValueError("AC scan must be single-component (G.1.1)")
                ci, _, ac_id = scan_comps[0]
                tab = htables[(1, ac_id)]
                view = comp_view(ci)
                if ah == 0:
                    _decode_ac_first(r, view, len(view), tab, ss, se, al)
                else:
                    _decode_ac_refine(r, view, len(view), tab, ss, se, al)
            # resume the marker walk at the next marker after the scan
            pos = r.pos
            while pos + 1 < len(buf) and not (
                buf[pos] == 0xFF and buf[pos + 1] != 0x00
            ):
                pos += 1
    if frame is None or planes is None:
        raise ValueError("missing SOF2/SOS")
    h, w = frame
    hmax = max(s[0] for s in comp_samp)
    vmax = max(s[1] for s in comp_samp)
    outs = []
    for ci, blocks in enumerate(planes):
        hi, vi = comp_samp[ci]
        ch = -(-h * vi // vmax)  # the component's own pixel dims
        cw = -(-w * hi // hmax)
        q = np.empty((8, 8), dtype=np.float64)
        for idx, (u, v) in enumerate(ZIGZAG):
            q[u, v] = qtables[comp_tqs[ci]][idx]
        out = np.empty(
            (pad_nby[ci] * 8, pad_nbx[ci] * 8), dtype=np.float64
        )
        for b, zz in enumerate(blocks):
            s = np.zeros((8, 8), dtype=np.float64)
            for idx, (u, v) in enumerate(ZIGZAG):
                s[u, v] = zz[idx]
            blk = _A.T @ (s * q) @ _A + 128.0
            by, bx = divmod(b, pad_nbx[ci])
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
        plane = np.clip(np.round(out[:ch, :cw]), 0, 255).astype(np.uint8)
        if (hi, vi) != (hmax, vmax):
            # upsample subsampled chroma by sample replication, then
            # crop the replication overhang of odd dims
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        outs.append(plane)
    if len(outs) == 1:
        return outs[0]
    return np.stack(outs, axis=-1)


def make_progressive_color_jpeg_image(image_id: int) -> bytes:
    """Deterministic REAL three-component (4:4:4) progressive JPEG:
    width 8·(id%3+1), height 8·(id%2+1), plane c's block (bx, by)
    constant at (id·11 + 13·bx + 29·by + 47·c) mod 256 — constant
    blocks are DC-only, so the 8-scan color pipeline (interleaved DC
    first + refine over all three components, then two AC scans per
    component) reconstructs the exact integers per plane; the AC
    refinement machinery is pinned separately by the gradient
    round-trip tests."""
    w, h = 8 * (image_id % 3 + 1), 8 * (image_id % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    planes = []
    for c in range(3):
        v = (image_id * 11 + 13 * bx + 29 * by + 47 * c) % 256
        planes.append(
            np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
        )
    return encode_progressive_jpeg_color(*planes)


def make_progressive_420_jpeg_image(image_id: int) -> bytes:
    """Deterministic REAL 4:2:0 progressive JPEG: width 16·(id%3+1),
    height 16·(id%2+1).  Y block (bx, by) on the FULL-res 8x8 grid is
    constant at (id·11 + 13·bx + 29·by) mod 256; chroma block (bx, by)
    on the HALF-res 8x8 grid is constant at
    (id·11 + 13·bx + 29·by + 47·c) mod 256, c = 1 (Cb), 2 (Cr) — after
    the decoder's replication upsample, pixel (x, y) of chroma c reads
    the law at (x//16, y//16).  Constant blocks are DC-only, so the
    8-scan subsampled pipeline reconstructs exact integers."""
    w, h = 16 * (image_id % 3 + 1), 16 * (image_id % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    yv = (image_id * 11 + 13 * bx + 29 * by) % 256
    yp = np.repeat(np.repeat(yv, 8, axis=0), 8, axis=1).astype(np.uint8)
    cbx = np.arange(w // 16).reshape(1, -1)
    cby = np.arange(h // 16).reshape(-1, 1)
    chroma = []
    for c in (1, 2):
        cv = (image_id * 11 + 13 * cbx + 29 * cby + 47 * c) % 256
        chroma.append(
            np.repeat(np.repeat(cv, 8, axis=0), 8, axis=1).astype(np.uint8)
        )
    return encode_progressive_jpeg_420(yp, *chroma)


def make_progressive_420_gradient_image(image_id: int) -> bytes:
    """Deterministic NON-CONSTANT 4:2:0 progressive JPEG: linear-ramp
    planes (Y(x,y) = (3x + 5y + 11·id) mod 256 full-res; chroma c at
    (5x + 3y + 11·id + 40c) mod 256 half-res), width 16·(id%3+1),
    height 16·(id%2+1).  Every block carries AC energy, so all four AC
    scan kinds — EOB runs, ZRL, newly-significant ±1<<Al and the
    §G.1.2.3 correction bits — travel through the SUBSAMPLED MCU walk
    (the r11 fixtures were constant-block, DC-only).  Decoding is
    lossy-given-quantization: the exact expectation is the dequant+IDCT
    of the quantized ramp, pinned by tests and by the
    reference-reconstruction parity column of the registered query."""
    w, h = 16 * (image_id % 3 + 1), 16 * (image_id % 2 + 1)
    X, Y = np.meshgrid(np.arange(w), np.arange(h))
    yp = ((3 * X + 5 * Y + 11 * image_id) % 256).astype(np.uint8)
    Xc, Yc = np.meshgrid(np.arange(w // 2), np.arange(h // 2))
    chroma = [
        ((5 * Xc + 3 * Yc + 11 * image_id + 40 * c) % 256).astype(np.uint8)
        for c in (1, 2)
    ]
    return encode_progressive_jpeg_420(yp, *chroma)


def reference_reconstruction(plane: np.ndarray) -> np.ndarray:
    """The decoded pixels a correct codec MUST produce for ``plane``:
    forward DCT → quantize → dequantize → IDCT → round/clip, straight
    from the pixel array — no bitstream involved, the independent twin
    the roundtrip tests and the gradient query compare the decoder
    against."""
    h, w, nby, nbx, blocks = _quantized_blocks(plane)
    q = np.empty((8, 8))
    for idx, (u, v) in enumerate(ZIGZAG):
        q[u, v] = QTABLE_ZZ[idx]
    ref = np.empty((nby * 8, nbx * 8))
    for b, zz in enumerate(blocks):
        s = np.zeros((8, 8))
        for idx, (u, v) in enumerate(ZIGZAG):
            s[u, v] = zz[idx]
        blk = _A.T @ (s * q) @ _A + 128.0
        byy, bxx = divmod(b, nbx)
        ref[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = blk
    return np.clip(np.round(ref[:h, :w]), 0, 255).astype(np.uint8)


def make_progressive_jpeg_image(image_id: int) -> bytes:
    """Deterministic REAL progressive JPEG with the SAME closed-form
    pixel law as the baseline fixture (operators/jpeg.py::
    make_jpeg_image): width 8·(id%3+1), height 8·(id%2+1), block
    (bx, by) constant at (id·11 + 13·bx + 29·by) mod 256 — constant
    blocks are DC-only, so the 6-scan progressive pipeline (both DC
    bit-planes and all four AC scans, which carry pure EOB runs here)
    reconstructs the exact integers; the AC refinement machinery is
    pinned separately by the gradient round-trip tests.  Ids with
    id%4==1 store the quantization table 16-bit (Pq=1, same values) —
    the wide-DQT stream variant some encoders always emit."""
    w, h = 8 * (image_id % 3 + 1), 8 * (image_id % 2 + 1)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    v = (image_id * 11 + 13 * bx + 29 * by) % 256
    px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    return encode_progressive_jpeg(px, wide_dqt=image_id % 4 == 1)
