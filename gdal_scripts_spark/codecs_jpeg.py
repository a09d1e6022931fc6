"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) — from-scratch numpy codec.

Closes the lossy tier of SURVEY.md §2.1 S3 (reference:
``frmts/jpeg/jpgdataset.cpp``, itself a libjpeg wrapper; this is a clean-room
implementation from the public JPEG specification):

- encoder: 4:4:4 (no chroma subsampling — keeps PSNR>=40 at q>=85 on the
  fixture corpus), 8x8 matrix DCT, Annex-K quantization tables scaled by the
  libjpeg quality convention, zigzag, run-length AC + DC-differential
  entropy coding. Huffman tables are generated PER IMAGE as fixed-length
  canonical codes over the symbols actually used (any decoder reads them
  from DHT; simpler than hand-copying Annex-K code tables and bit-exactly
  valid). Byte stuffing (FF 00) per spec.
- decoder: marker parser (SOI/APP/DQT/SOF0/DHT/SOS/EOI), canonical Huffman
  reconstruction from arbitrary DHT, MCU entropy decode, dequantize, IDCT,
  YCbCr->RGB, edge-crop to the true dimensions. Baseline sequential,
  components with identical sampling factors (what this encoder emits).

PSNR target: >=40 dB at quality>=85 (BASELINE.json : input_hint gate),
verified in tests/test_jpeg.py.
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
# encoder
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


def _blocks(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(chan, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8), bh, bw


def _quantize_channel(chan: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks, _, _ = _blocks(chan.astype(np.float64) - 128.0)
    coef = np.einsum("ij,bjk,lk->bil", _DCT, blocks, _DCT)
    q = np.rint(coef / qtab[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZZ]


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    img = np.asarray(img)
    gray = img.ndim == 2
    if gray:
        chans = [img.astype(np.float64)]
        qtabs = [_scale_q(_QLUM, quality)]
        tab_ids = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        chans = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
        qtabs = [_scale_q(_QLUM, quality), _scale_q(_QCHROM, quality)]
        tab_ids = [0, 1, 1]
    h, w = chans[0].shape
    quant = [_quantize_channel(c, qtabs[tab_ids[i]]) for i, c in enumerate(chans)]

    # gather symbols for Huffman tables (one DC + one AC table per class:
    # table 0 = luma/gray, table 1 = chroma)
    def symbols_for(comp_idxs):
        dc_syms, ac_syms = [], []
        for ci in comp_idxs:
            zz = quant[ci]
            prev = 0
            for blk in zz:
                diff = int(blk[0]) - prev
                prev = int(blk[0])
                dc_syms.append(_category(diff))
                run = 0
                for v in blk[1:]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_syms.append(0xF0)
                        run -= 16
                    ac_syms.append((run << 4) | _category(int(v)))
                    run = 0
                if run:
                    ac_syms.append(0x00)
        return dc_syms, ac_syms

    groups = [[0]] if gray else [[0], [1, 2]]
    dc_tabs, ac_tabs, dht_payload = [], [], b""
    for tclass_id, comp_idxs in enumerate(groups):
        dc_syms, ac_syms = symbols_for(comp_idxs)
        dtab, dcounts, dsyms = _build_fixed_table(dc_syms)
        atab, acounts, asyms = _build_fixed_table(ac_syms)
        dc_tabs.append(dtab)
        ac_tabs.append(atab)
        dht_payload += bytes([0x00 | tclass_id]) + bytes(dcounts) + bytes(dsyms)
        dht_payload += bytes([0x10 | tclass_id]) + bytes(acounts) + bytes(asyms)

    # entropy-code interleaved MCUs (4:4:4 -> one block per component)
    bw_ = _BitWriter()
    nblocks = quant[0].shape[0]
    prev_dc = [0] * len(chans)
    for b in range(nblocks):
        for ci in range(len(chans)):
            tid = 0 if ci == 0 else 1
            zz = quant[ci][b]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s, bits = _encode_value(diff)
            code, ln = dc_tabs[tid][s]
            bw_.write(code, ln)
            if s:
                bw_.write(bits, s)
            run = 0
            for v in zz[1:]:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tabs[tid][0xF0]
                    bw_.write(code, ln)
                    run -= 16
                s, bits = _encode_value(v)
                code, ln = ac_tabs[tid][(run << 4) | s]
                bw_.write(code, ln)
                bw_.write(bits, s)
                run = 0
            if run:
                code, ln = ac_tabs[tid][0x00]
                bw_.write(code, ln)
    entropy = bw_.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qtabs):
        zz_tab = qt.reshape(64)[_ZZ].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zz_tab.tobytes())
    ncomp = len(chans)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, tab_ids[ci]])
    out += seg(0xC0, sof)
    out += seg(0xC4, dht_payload)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = []
    h = w = 0
    scan_comps = []
    entropy_start = None
    while i < len(buf):
        if buf[i] != 0xFF:
            raise ValueError("bad marker")
        marker = buf[i + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
        payload = buf[i + 4 : i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit qtab unsupported")
                tab = np.zeros(64)
                tab[_ZZ] = np.frombuffer(payload[p + 1 : p + 65], np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampling unsupported")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1 : p + 17])
                n = sum(counts)
                syms = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_table(counts, syms)
                p += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            for c in range(ns):
                cid, tabs = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_comps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            entropy_start = i
            break
    if entropy_start is None:
        raise ValueError("no scan")
    # entropy data runs to EOI
    end = buf.rfind(b"\xff\xd9")
    br = _BitReader(buf[entropy_start:end])

    def read_symbol(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("bad huffman code")

    nc = len(comps)
    bh, bw_n = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_n * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    for by in range(bh):
        for bx in range(bw_n):
            for ci in range(nc):
                sc = scan_comps[ci]
                dct = huff[(0, sc["dc"])]
                act = huff[(1, sc["ac"])]
                zz = np.zeros(64, dtype=np.float64)
                s = read_symbol(dct)
                diff = _extend(br.read_bits(s), s)
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
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
                blk = np.zeros(64)
                blk[_ZZ] = zz
                coef = blk.reshape(8, 8) * qtabs[comps[ci]["tq"]]
                pix = _DCT.T @ coef @ _DCT + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=2))
