"""numpy image codecs + image hashes — the pixel layer of the engine.

Spark-first role: these functions run ONLY inside Arrow batches
(``mapInPandas`` / scalar ``pandas_udf``) — a batch of rows arrives as a
``pd.Series`` of ``bytes``, each element is decoded to a numpy ``(h, w, c)``
array, processed, and re-encoded. Never row-at-a-time Python in the hot path
(BASELINE.json : input_hint — "no per-row Python").

Reference parity (public GDAL 3.8.x tree; formats themselves are public
specs):
- PPM/PGM:  ``frmts/raw/pnmdataset.cpp`` (netpbm P5/P6, binary, maxval 255)
- PNG:      ``frmts/png/pngdataset.cpp`` — here a from-scratch stdlib-``zlib``
            implementation of the PNG spec (RFC 2083): 8-bit gray (color
            type 0) and RGB (color type 2), all five scanline filters on
            decode, filter 0 on encode.
- checksum: ``alg/gdalchecksum.cpp : GDALChecksumImage (≈L40)`` — EXACT
            per-band reimplementation of GDAL's prime-weighted 16-bit
            checksum (see ``gdal_checksum_band``: 11-prime table {7..43},
            C truncated remainder, mod-65536 running sum — the autotest
            golden convention, e.g. gcore/data/byte.tif -> 4672). Only the
            multiband single-int reduction (sum of per-band checksums mod
            65536) is this engine's convention, documented at
            ``gdal_style_checksum``.
- aHash:    mean-threshold 8x8 average hash (public pHash family) for the
            ``phash`` column of the input table (BASELINE.json : input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6, RGB) / PGM (P5, gray) — binary netpbm, maxval 255
# ---------------------------------------------------------------------------

def encode_pnm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError(f"unsupported shape {img.shape}")


def decode_pnm(buf: bytes) -> np.ndarray:
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    # header = magic, width, height, maxval (whitespace/comment separated)
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while buf[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        fields.append(buf[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(x) for x in fields)
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    n = w * h * (3 if buf[:2] == b"P6" else 1)
    data = np.frombuffer(buf, dtype=np.uint8, count=n, offset=i)
    return data.reshape((h, w, 3) if buf[:2] == b"P6" else (h, w)).copy()


# ---------------------------------------------------------------------------
# PNG — RFC 2083 subset: bit depth 8, color type 0 (gray) / 2 (RGB)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 3) -> bytes:
    # level 3 default: identical pixels (lossless at any level), ~2-3x less
    # deflate CPU than 6 in the tile-sink hot path; callers needing minimum
    # size pass level explicitly
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        ctype, nch = 0, 1
        raw = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        ctype, nch = 2, 3
        raw = img
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    # filter byte 0 per scanline
    scan = np.empty((h, 1 + w * nch), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw.reshape(h, w * nch)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(scan: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4 (sequential per spec §6).

    Fast path first: all-filter-0 (what our own encoder emits) is a pure
    slice copy; the per-scanline Python loop only runs for foreign PNGs
    that use filters 1-4."""
    stride = w * bpp
    ftypes = scan[:, 0]
    if not ftypes.any():  # every scanline filter 0
        return scan[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(scan[y, 0])
        cur = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-recurrence
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    line[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = line.astype(np.uint8)
    return out


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = ctype = -1
    idat = bytearray()
    while i < len(buf):
        (length,) = struct.unpack(">I", buf[i : i + 4])
        tag = buf[i + 4 : i + 8]
        payload = buf[i + 8 : i + 8 + length]
        i += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    nch = 3 if ctype == 2 else 1
    scan = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    scan = scan.reshape(h, 1 + w * nch)
    px = _unfilter(scan, h, w, nch)
    img = px.reshape(h, w, nch)
    return img[:, :, 0].copy() if nch == 1 else img.copy()


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def encode(img: np.ndarray, fmt: str) -> bytes:
    fmt = fmt.lower()
    if fmt in ("ppm", "pgm", "pnm"):
        return encode_pnm(img)
    if fmt == "png":
        return encode_png(img)
    if fmt in ("jpeg", "jpg"):
        from . import codecs_jpeg

        # quality 97 keeps the PSNR>=40 lossy gate on the whole fixture
        # corpus (q=95 left the noisiest fixture at 39.8 dB)
        return codecs_jpeg.encode_jpeg(img, quality=97)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, fmt: str) -> np.ndarray:
    fmt = fmt.lower()
    if fmt in ("ppm", "pgm", "pnm"):
        return decode_pnm(buf)
    if fmt == "png":
        return decode_png(buf)
    if fmt in ("jpeg", "jpg"):
        from . import codecs_jpeg

        return codecs_jpeg.decode_jpeg(buf)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------------------
# hashes / invariants
# ---------------------------------------------------------------------------

_CHECKSUM_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43],
                            dtype=np.int64)


def gdal_checksum_band(band: np.ndarray) -> int:
    """EXACT ``alg/gdalchecksum.cpp : GDALChecksumImage`` integer path for
    one band: pixels visited row-major as Int32; per pixel i,
    ``checksum += pixel % primes[i % 11]`` with C truncated remainder
    (negative pixels keep their sign) and ``checksum &= 0xffff`` each step
    — algebraically (sum of remainders) mod 65536. The 11-prime table
    {7..43} is GDAL's. This is the autotest golden-checksum convention
    (e.g. gcore/data/byte.tif -> 4672)."""
    flat = np.asarray(band).astype(np.int64).ravel()
    primes = _CHECKSUM_PRIMES[np.arange(flat.size, dtype=np.int64) % 11]
    rem = np.fmod(flat, primes)  # trunc remainder == C's %
    return int(rem.sum() % 65536)


def gdal_style_checksum(img: np.ndarray) -> int:
    """Golden-test checksum invariant. 2-D input: exactly GDAL's
    GDALChecksumImage (see ``gdal_checksum_band``). 3-D (h, w, c): GDAL
    reports one checksum PER band; this single-int helper reduces them as
    (sum of per-band checksums) mod 65536 — the reduction is this engine's
    convention, each component is GDAL-exact."""
    a = np.asarray(img)
    if a.ndim == 2:
        return gdal_checksum_band(a)
    return int(sum(gdal_checksum_band(a[:, :, b]) for b in range(a.shape[2])) % 65536)


def ahash64(img: np.ndarray) -> int:
    """Mean-threshold 8x8 average hash -> signed int64 (phash column)."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    # integral-image 8x8 block means (no scipy): pad-crop to multiples of 8
    ys = (np.arange(9) * h // 8).astype(int)
    xs = (np.arange(9) * w // 8).astype(int)
    small = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            small[r, c] = a[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
    bits = (small > small.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return int(np.int64(np.uint64(v)))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(((a - b) ** 2).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
