"""JPEG (ITU-T T.81 / ISO 10918-1) — from-scratch numpy codec.

Closes the lossy tier of SURVEY.md §2.1 S3 (reference:
``frmts/jpeg/jpgdataset.cpp``, itself a libjpeg wrapper; this is a clean-room
implementation from the public JPEG specification):

- encoder: 8x8 matrix DCT, Annex-K quantization tables scaled by the libjpeg
  quality convention, zigzag, run-length AC + DC-differential entropy coding.
  Optional chroma subsampling (``4:4:4``/``4:2:2``/``4:2:0`` — box-filter
  downsample, MCU-interleaved blocks), optional restart intervals (DRI +
  byte-aligned RSTn, predictors reset per spec), and optional progressive
  mode (SOF2: spectral selection + one successive-approximation refinement
  pass per band, the scan-script shape libjpeg emits). Huffman tables are
  generated PER SCAN as fixed-length canonical codes over the symbols
  actually used (any decoder reads them from DHT). Byte stuffing (FF 00).
  Defaults (sequential 4:4:4, no restarts) are bit-identical to the
  original baseline-only encoder, so committed goldens are unaffected.
- decoder: marker parser (SOI/APP/COM/DQT 8+16-bit/SOF0/SOF1/SOF2/DHT/DRI/
  SOS/RSTn/EOI), canonical Huffman reconstruction from arbitrary DHT,
  arbitrary per-component sampling factors with MCU-interleaved and
  non-interleaved scans, restart-marker resynchronization, and full
  progressive decoding (DC first/refine, AC first/refine with EOB-run
  correction bits, per T.81 G.2 / the jdphuff.c algorithm). Coefficients
  accumulate across scans; one batched dequantize + IDCT per component at
  EOI, sample-replication chroma upsample, edge-crop to true dimensions.

Progressive transmits the same quantized coefficients as sequential, so
``decode(encode(img, progressive=True))`` is pixel-identical to the
baseline roundtrip at the same quality/subsampling — tests pin that.

PSNR target: >=40 dB at quality>=85 for 4:4:4 (BASELINE.json : input_hint
gate), verified in tests/test_jpeg.py; robustness matrix (subsampling x
restart x progressive) in tests/test_jpeg_robust.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

_QLUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

_QCHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_SUBSAMP = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((y, x) for y in range(8) for x in range(8)),
        key=lambda p: (p[0] + p[1], p[1] if (p[0] + p[1]) % 2 == 0 else p[0]),
    )
    return np.array([y * 8 + x for y, x in order], dtype=np.int64)


_ZZ = _zigzag_order()
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def restart_marker(self, m: int) -> None:
        """Byte-align with 1-fill and emit RSTm (not byte-stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("jpeg bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise EOFError("marker in entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Discard pad bits, consume the expected RSTn marker."""
        self.nbits = 0
        if (self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


# ---------------------------------------------------------------------------
# Huffman (canonical; encoder builds fixed-length tables over used symbols)
# ---------------------------------------------------------------------------

def _build_fixed_table(symbols: list[int]) -> tuple[dict[int, tuple[int, int]], list[int], list[int]]:
    """Equal-length canonical code over `symbols`. Returns (sym->(code,len),
    counts[16], ordered symbols). Keeps one spare code so the all-ones code
    is never assigned (spec safety)."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0]
    length = max((len(syms) + 1 - 1).bit_length(), 1)
    counts = [0] * 16
    counts[length - 1] = len(syms)
    table = {s: (i, length) for i, s in enumerate(syms)}
    return table, counts, syms


def _decode_table(counts: list[int], syms: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical reconstruction per spec F.2.2.3."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_value(v: int) -> tuple[int, int]:
    """(size, bits) per spec F.1.2.1 (negative: v-1 two's-complement low bits)."""
    s = _category(v)
    if s == 0:
        return 0, 0
    return s, v if v >= 0 else v + (1 << s) - 1


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# color / sampling / transform helpers
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _downsample(chan: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-filter fx x fy chroma downsample (edge-padded to factor multiples)."""
    if fx == 1 and fy == 1:
        return chan
    h, w = chan.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(chan, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _quantize_channel(chan: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """chan already padded to 8-multiples. Returns (bh, bw, 64) zigzag int32."""
    h, w = chan.shape
    bh, bw = h // 8, w // 8
    blocks = (chan.astype(np.float64) - 128.0).reshape(
        bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,bjk,lk->bil", _DCT, blocks, _DCT)
    q = np.rint(coef / qtab[None, :, :]).astype(np.int32)
    return q.reshape(bh, bw, 64)[:, :, _ZZ]


# ---------------------------------------------------------------------------
# encoder scan op-streams
#
# A scan encoder emits a flat op list: ("s", tclass, htid, symbol) Huffman
# symbol, ("b", value, nbits) raw bits, ("r", m) restart marker. Pass 1
# collects the "s" ops to build per-scan Huffman tables; pass 2 writes bits.
# ---------------------------------------------------------------------------

def _mcu_blocks(scomps, factors, mcx, mcy):
    """(mcu_index, ci, by, bx) in interleaved MCU order."""
    for my in range(mcy):
        for mx in range(mcx):
            idx = my * mcx + mx
            for ci in scomps:
                hi, vi = factors[ci]
                for v in range(vi):
                    for u in range(hi):
                        yield idx, ci, my * vi + v, mx * hi + u


def _seq_scan_ops(scomps, factors, quant, htids, mcx, mcy, ri):
    """Baseline sequential interleaved scan (full band, Al=0)."""
    ops = []
    prev = {ci: 0 for ci in scomps}
    last_mcu, rstm = -1, 0
    for idx, ci, by, bx in _mcu_blocks(scomps, factors, mcx, mcy):
        if idx != last_mcu:
            if ri and idx and idx % ri == 0:
                ops.append(("r", rstm & 7))
                rstm += 1
                prev = {c: 0 for c in scomps}
            last_mcu = idx
        t = htids[ci]
        zz = quant[ci][by, bx]
        dc = int(zz[0])
        diff = dc - prev[ci]
        prev[ci] = dc
        s, bits = _encode_value(diff)
        ops.append(("s", 0, t, s))
        if s:
            ops.append(("b", bits, s))
        run = 0
        for v in zz[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.append(("s", 1, t, 0xF0))
                run -= 16
            s, bits = _encode_value(v)
            ops.append(("s", 1, t, (run << 4) | s))
            ops.append(("b", bits, s))
            run = 0
        if run:
            ops.append(("s", 1, t, 0x00))
    return ops


def _dc_scan_ops(scomps, factors, quant, htids, mcx, mcy, ri, ah, al):
    """Progressive DC scan: first pass (Ah=0, arithmetic >> Al diff coding)
    or refinement (one raw bit per block at position Al)."""
    ops = []
    prev = {ci: 0 for ci in scomps}
    last_mcu, rstm = -1, 0
    for idx, ci, by, bx in _mcu_blocks(scomps, factors, mcx, mcy):
        if idx != last_mcu:
            if ri and idx and idx % ri == 0:
                ops.append(("r", rstm & 7))
                rstm += 1
                prev = {c: 0 for c in scomps}
            last_mcu = idx
        dc = int(quant[ci][by, bx, 0])
        if ah == 0:
            val = dc >> al  # arithmetic shift per spec (DC point transform)
            diff = val - prev[ci]
            prev[ci] = val
            s, bits = _encode_value(diff)
            ops.append(("s", 0, htids[ci], s))
            if s:
                ops.append(("b", bits, s))
        else:
            ops.append(("b", (dc >> al) & 1, 1))
    return ops


def _ac_first_ops(qc, htid, nbx, nby, ri, ss, se, al):
    """Progressive AC first pass (Ah=0): non-interleaved single component,
    EOB-run coding per T.81 G.1.2.2 / jcphuff.c encode_mcu_AC_first."""
    ops = []
    eobrun = 0
    rstm = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.append(("s", 1, htid, n << 4))
            if n:
                ops.append(("b", eobrun & ((1 << n) - 1), n))
            eobrun = 0

    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if ri and unit and unit % ri == 0:
                flush_eob()
                ops.append(("r", rstm & 7))
                rstm += 1
            unit += 1
            vals = []
            for v in qc[by, bx, ss:se + 1]:
                v = int(v)
                mag = (-v if v < 0 else v) >> al  # magnitude shift (to-zero)
                vals.append(-mag if v < 0 else mag)
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for v in vals:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ops.append(("s", 1, htid, 0xF0))
                    run -= 16
                s, bits = _encode_value(v)
                ops.append(("s", 1, htid, (run << 4) | s))
                ops.append(("b", bits, s))
                run = 0
            if run:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return ops


def _ac_refine_ops(qc, htid, nbx, nby, ri, ss, se, al):
    """Progressive AC refinement (Ah=Al+1): newly-significant coefficients
    plus buffered correction bits for history coefficients, per T.81
    G.1.2.3 / jcphuff.c encode_mcu_AC_refine."""
    ops = []
    eobrun = 0
    # two correction-bit buffers, as in jcphuff.c: bits from COMPLETED blocks
    # of the pending EOB run go right after the EOBn symbol; bits from the
    # CURRENT block go after this block's own next emitted symbol.
    pend_run: list[int] = []
    pend_cur: list[int] = []
    rstm = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.append(("s", 1, htid, n << 4))
            if n:
                ops.append(("b", eobrun & ((1 << n) - 1), n))
            for b in pend_run:
                ops.append(("b", b, 1))
            pend_run.clear()
            eobrun = 0

    def emit_cur():
        for b in pend_cur:
            ops.append(("b", b, 1))
        pend_cur.clear()

    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if ri and unit and unit % ri == 0:
                emit_eobrun()
                ops.append(("r", rstm & 7))
                rstm += 1
            unit += 1
            band = [int(v) for v in qc[by, bx, ss:se + 1]]
            mags = [(-v if v < 0 else v) >> al for v in band]
            eob = 0  # index AFTER the last newly-significant coefficient
            for k, m in enumerate(mags):
                if m == 1:
                    eob = k + 1
            run = 0
            for k, m in enumerate(mags):
                if m == 0:
                    run += 1
                    continue
                while run > 15 and k < eob:
                    emit_eobrun()
                    ops.append(("s", 1, htid, 0xF0))
                    run -= 16
                    emit_cur()
                if m > 1:
                    pend_cur.append(m & 1)  # history coef: correction bit
                    continue
                emit_eobrun()
                ops.append(("s", 1, htid, (run << 4) | 1))
                ops.append(("b", 0 if band[k] < 0 else 1, 1))
                emit_cur()
                run = 0
            if run > 0 or pend_cur:
                eobrun += 1
                pend_run.extend(pend_cur)
                pend_cur.clear()
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()
    return ops


def _write_ops(ops, bw, dc_tabs, ac_tabs):
    for op in ops:
        kind = op[0]
        if kind == "s":
            _, tclass, tid, sym = op
            code, ln = (dc_tabs if tclass == 0 else ac_tabs)[tid][sym]
            bw.write(code, ln)
        elif kind == "b":
            bw.write(op[1], op[2])
        else:
            bw.restart_marker(op[1])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_jpeg(img: np.ndarray, quality: int = 90, *,
                subsampling: str = "4:4:4", restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    img = np.asarray(img)
    gray = img.ndim == 2
    if subsampling not in _SUBSAMP:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMP)}")
    if gray:
        raw = [img.astype(np.float64)]
        factors = [(1, 1)]
        tab_ids = [0]
        qtabs = [_scale_q(_QLUM, quality)]
    else:
        hs, vs = _SUBSAMP[subsampling]
        ycc = _rgb_to_ycbcr(img)
        raw = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
        factors = [(hs, vs), (1, 1), (1, 1)]
        tab_ids = [0, 1, 1]
        qtabs = [_scale_q(_QLUM, quality), _scale_q(_QCHROM, quality)]
    h, w = raw[0].shape
    ncomp = len(raw)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    ri = int(restart_interval)

    quant = []
    nbdims = []  # per comp: true (non-MCU-padded) block dims for AC scans
    for ci, chan in enumerate(raw):
        hi, vi = factors[ci]
        chan = _downsample(chan, hmax // hi, vmax // vi)
        ph, pw = mcy * vi * 8, mcx * hi * 8
        chan = np.pad(chan, ((0, ph - chan.shape[0]), (0, pw - chan.shape[1])),
                      mode="edge")
        quant.append(_quantize_channel(chan, qtabs[tab_ids[ci]]))
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        nbdims.append((-(-cw // 8), -(-ch // 8)))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qtabs):
        zz_tab = qt.reshape(64)[_ZZ].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zz_tab.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, tab_ids[ci]])
    out += seg(0xC2 if progressive else 0xC0, sof)
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))

    allc = list(range(ncomp))
    # scan list: (ops, [(ci, dc_tid_or_None, ac_tid_or_None)], ss, se, ah, al)
    scans = []
    if not progressive:
        ops = _seq_scan_ops(allc, factors, quant, tab_ids, mcx, mcy, ri)
        scans.append((ops, [(ci, tab_ids[ci], tab_ids[ci]) for ci in allc],
                      0, 63, 0, 0))
    else:
        # script: DC first (Al=1) -> AC first per comp (Al=1) ->
        #         DC refine -> AC refine per comp (libjpeg-style shape)
        scans.append((_dc_scan_ops(allc, factors, quant, tab_ids, mcx, mcy,
                                   ri, 0, 1),
                      [(ci, tab_ids[ci], None) for ci in allc], 0, 0, 0, 1))
        for ci in allc:
            nbx, nby = nbdims[ci]
            scans.append((_ac_first_ops(quant[ci], tab_ids[ci], nbx, nby,
                                        ri, 1, 63, 1),
                          [(ci, None, tab_ids[ci])], 1, 63, 0, 1))
        scans.append((_dc_scan_ops(allc, factors, quant, tab_ids, mcx, mcy,
                                   ri, 1, 0),
                      [(ci, tab_ids[ci], None) for ci in allc], 0, 0, 1, 0))
        for ci in allc:
            nbx, nby = nbdims[ci]
            scans.append((_ac_refine_ops(quant[ci], tab_ids[ci], nbx, nby,
                                         ri, 1, 63, 0),
                          [(ci, None, tab_ids[ci])], 1, 63, 1, 0))

    for ops, sccomps, ss, se, ah, al in scans:
        dc_syms: dict[int, list[int]] = {}
        ac_syms: dict[int, list[int]] = {}
        for op in ops:
            if op[0] == "s":
                (dc_syms if op[1] == 0 else ac_syms).setdefault(op[2], []).append(op[3])
        dc_tabs, ac_tabs, dht = {}, {}, b""
        for tid in sorted(set(dc_syms) | set(ac_syms)):
            if tid in dc_syms:
                tab, counts, syms = _build_fixed_table(dc_syms[tid])
                dc_tabs[tid] = tab
                dht += bytes([0x00 | tid]) + bytes(counts) + bytes(syms)
            if tid in ac_syms:
                tab, counts, syms = _build_fixed_table(ac_syms[tid])
                ac_tabs[tid] = tab
                dht += bytes([0x10 | tid]) + bytes(counts) + bytes(syms)
        if dht:
            out += seg(0xC4, dht)
        sos = bytes([len(sccomps)])
        for ci, dct, act in sccomps:
            sos += bytes([ci + 1, ((dct or 0) << 4) | (act or 0)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        _write_ops(ops, bw, dc_tabs, ac_tabs)
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _scan_end(buf: bytes, start: int) -> int:
    """Index of the first marker after `start` that terminates entropy data
    (not byte-stuffing FF00, not a restart marker)."""
    j = start
    n = len(buf)
    while True:
        j = buf.find(b"\xff", j)
        if j < 0 or j + 1 >= n:
            return n
        nxt = buf[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            j += 2
            continue
        return j


def _decode_scan(br, progressive, comps, coeffs, scomps, ss, se, ah, al,
                 ri, huff, mcx, mcy):
    """Entropy-decode one scan into the per-component coefficient arrays.

    scomps: list of (ci, dc_tid, ac_tid). Interleaved when len > 1 (restart
    interval counts MCUs), else non-interleaved raster over the component's
    own block grid (restart interval counts blocks).
    """
    def read_symbol(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("bad huffman code")

    def tab(tc, tid):
        t = huff.get((tc, tid))
        if t is None:
            raise ValueError(f"missing huffman table ({tc},{tid})")
        return t

    pred = {ci: 0 for ci, _, _ in scomps}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def block_full(zz, dct, act, ci):
        s = read_symbol(dct)
        diff = _extend(br.read_bits(s), s)
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = read_symbol(act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC overflow")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1

    def block_dc(zz, dct, ci):
        if ah == 0:
            s = read_symbol(dct)
            diff = _extend(br.read_bits(s), s)
            pred[ci] += diff
            zz[0] = pred[ci] << al
        elif br.read_bit():
            zz[0] = int(zz[0]) | p1

    def block_ac_first(zz, act):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = read_symbol(act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # current block included in the run
                if r:
                    eobrun += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC overflow")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def refine_nonzero(zz, k):
        # correction bit for an already-nonzero coefficient
        if br.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] = int(zz[k]) + (p1 if zz[k] >= 0 else m1)

    def block_ac_refine(zz, act):
        # T.81 G.2 / jdphuff.c decode_mcu_AC_refine
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = read_symbol(act)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement size")
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(zz, k)
                k += 1
            eobrun -= 1

    def decode_block(ci, dct_id, act_id, by, bx):
        zz = coeffs[ci][by, bx]
        if not progressive:
            block_full(zz, tab(0, dct_id), tab(1, act_id), ci)
        elif ss == 0:
            block_dc(zz, tab(0, dct_id) if ah == 0 else None, ci)
        elif ah == 0:
            block_ac_first(zz, tab(1, act_id))
        else:
            block_ac_refine(zz, tab(1, act_id))

    def do_restart():
        nonlocal eobrun
        br.restart()
        for ci in pred:
            pred[ci] = 0
        eobrun = 0

    if len(scomps) > 1:
        by_ci = {ci: (d, a) for ci, d, a in scomps}
        last_mcu = -1
        for idx, ci, by, bx in _mcu_blocks(
                [ci for ci, _, _ in scomps],
                {ci: (comps[ci]["h"], comps[ci]["v"]) for ci, _, _ in scomps},
                mcx, mcy):
            if idx != last_mcu:
                if ri and idx and idx % ri == 0:
                    do_restart()
                last_mcu = idx
            d, a = by_ci[ci]
            decode_block(ci, d, a, by, bx)
    else:
        ci, d, a = scomps[0]
        nbx, nby = comps[ci]["nbx"], comps[ci]["nby"]
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                if ri and unit and unit % ri == 0:
                    do_restart()
                unit += 1
                decode_block(ci, d, a, by, bx)


def decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    coeffs: list[np.ndarray] = []
    h = w = 0
    hmax = vmax = 1
    mcx = mcy = 0
    ri = 0
    progressive = False
    saw_frame = saw_scan = False
    n = len(buf)
    while i + 1 < n:
        if buf[i] != 0xFF:
            raise ValueError("bad marker")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated segment")
        (ln,) = struct.unpack(">H", buf[i + 2:i + 4])
        payload = buf[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq == 0:
                    tab = np.zeros(64)
                    tab[_ZZ] = np.frombuffer(payload[p + 1:p + 65], np.uint8)
                    p += 65
                else:  # 16-bit precision entries, big-endian
                    tab = np.zeros(64)
                    tab[_ZZ] = np.frombuffer(
                        payload[p + 1:p + 129], ">u2").astype(np.float64)
                    p += 129
                qtabs[tq] = tab.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c:9 + 3 * c]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad sampling factor")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcx = -(-w // (8 * hmax))
            mcy = -(-h // (8 * vmax))
            for c in comps:
                c["cw"] = -(-w * c["h"] // hmax)
                c["ch"] = -(-h * c["v"] // vmax)
                c["nbx"] = -(-c["cw"] // 8)
                c["nby"] = -(-c["ch"] // 8)
                coeffs.append(np.zeros(
                    (mcy * c["v"], mcx * c["h"], 64), dtype=np.int32))
            saw_frame = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported SOF (lossless/arithmetic/hierarchical)")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1:p + 17])
                nsym = sum(counts)
                syms = list(payload[p + 17:p + 17 + nsym])
                huff[(tc, th)] = _decode_table(counts, syms)
                p += 17 + nsym
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            if not saw_frame:
                raise ValueError("scan before frame header")
            ns = payload[0]
            by_id = {c["id"]: k for k, c in enumerate(comps)}
            scomps = []
            for c in range(ns):
                cid, tabs = payload[1 + 2 * c], payload[2 + 2 * c]
                if cid not in by_id:
                    raise ValueError("scan references unknown component")
                scomps.append((by_id[cid], tabs >> 4, tabs & 0xF))
            ss, se, ahal = payload[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            end = _scan_end(buf, i)
            br = _BitReader(buf[i:end])
            _decode_scan(br, progressive, comps, coeffs, scomps,
                         ss, se, ah, al, ri, huff, mcx, mcy)
            saw_scan = True
            i = end
        # APPn / COM / others: skipped
    if not saw_scan:
        raise ValueError("no scan")

    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")
        nby_p, nbx_p = coeffs[ci].shape[:2]
        nat = np.zeros((nby_p * nbx_p, 64))
        nat[:, _ZZ] = coeffs[ci].reshape(-1, 64)
        blocks = nat.reshape(-1, 8, 8) * qtabs[c["tq"]][None, :, :]
        pix = np.einsum("ji,bjk,kl->bil", _DCT, blocks, _DCT) + 128.0
        plane = pix.reshape(nby_p, nbx_p, 8, 8).transpose(0, 2, 1, 3).reshape(
            nby_p * 8, nbx_p * 8)[:c["ch"], :c["cw"]]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # sample-replication upsample
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(np.stack(planes, axis=2))
