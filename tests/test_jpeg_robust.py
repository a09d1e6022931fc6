"""Foreign-stream JPEG robustness: chroma subsampling, restart markers,
progressive (spectral selection + successive approximation), 16-bit DQT.

Oracle strategy: progressive / restart streams carry the SAME quantized
coefficients as the baseline stream at equal quality, so their decodes must
be pixel-IDENTICAL to the baseline roundtrip — an exact equality oracle, not
a PSNR gate. Default-parameter encodes are pinned by hash so the committed
engine goldens (psnr_gate, translate_fmt) can never drift silently.

Reference behavior: frmts/jpeg/jpgdataset.cpp (libjpeg wrapper); algorithms
from ITU-T T.81 Annex F/G and the public libjpeg jcphuff.c/jdphuff.c
structure (clean-room reimplementation, no code copied).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_scripts_spark import codecs, codecs_jpeg


def _fixture_img(i, w=40, h=48):
    ys, xs = np.mgrid[0:h, 0:w]
    return ((xs[:, :, None] * 3 + ys[:, :, None] * 5
             + np.arange(3)[None, None, :] * 7 + i) % 256).astype(np.uint8)


def _smooth(w=40, h=48):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([((xs + ys) // 2) % 256, (xs * 2) % 200,
                     (ys * 2) % 200], axis=2).astype(np.uint8)


# --------------------------------------------------------------------------
# default-output stability: committed goldens depend on these bytes
# --------------------------------------------------------------------------

def test_default_encode_bytes_pinned():
    pins = {
        (0, 90): "ca32482a65f19415271d7ee8ab40d39e41cc562883da0a718c76f03b32d826dd",
        (7, 90): "e6ee429b7471f2740b7a5f9183e34270ab4394a810dccea4d707551fb793bcef",
        (123, 90): "f5b102a1d15f4d67ecbca3d33fb04ef634b3d1fa75abfd26bf8d0efe7ef5a2e7",
        (3, 97): "7a416019559e961ddf182604059d49ddf54cdb4e470216461c5e634feb5aaa9b",
    }
    for (i, q), want in pins.items():
        got = hashlib.sha256(codecs_jpeg.encode_jpeg(_fixture_img(i), q)).hexdigest()
        assert got == want, (i, q)
    g = ((np.mgrid[0:33, 0:41][1] * 7 + np.mgrid[0:33, 0:41][0] * 3) % 256
         ).astype(np.uint8)
    assert hashlib.sha256(codecs_jpeg.encode_jpeg(g, 90)).hexdigest() == \
        "2ca43cf8b801d82a2b8f29d9d71eba3c59a35aae85c266bd5ba03676e493c2b0"


# --------------------------------------------------------------------------
# progressive: pixel-exact vs baseline (same coefficients, different order)
# --------------------------------------------------------------------------

def test_progressive_exact_vs_baseline_rgb():
    img = _fixture_img(5)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(img, 90))
    prog = codecs_jpeg.decode_jpeg(
        codecs_jpeg.encode_jpeg(img, 90, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_exact_vs_baseline_gray():
    g = ((np.mgrid[0:33, 0:41][1] * 7 + np.mgrid[0:33, 0:41][0] * 3) % 256
         ).astype(np.uint8)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(g, 90))
    prog = codecs_jpeg.decode_jpeg(
        codecs_jpeg.encode_jpeg(g, 90, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_exact_high_frequency():
    # noise maximizes ZRL runs, EOB runs, and refinement correction bits —
    # the hard paths of T.81 G.1.2.3/G.2
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, (37, 29, 3)).astype(np.uint8)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(noisy, 75))
    for ri in (0, 2):
        prog = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(
            noisy, 75, progressive=True, restart_interval=ri))
        assert np.array_equal(base, prog), ri


def test_progressive_stream_is_sof2_multiscan():
    buf = codecs_jpeg.encode_jpeg(_fixture_img(1), 90, progressive=True)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    assert buf.count(b"\xff\xda") == 8  # DC first + 3xAC + DC ref + 3xAC ref


# --------------------------------------------------------------------------
# restart markers
# --------------------------------------------------------------------------

def test_restart_interval_exact_and_markers_present():
    img = _fixture_img(5)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(img, 90))
    buf = codecs_jpeg.encode_jpeg(img, 90, restart_interval=2)
    assert b"\xff\xdd" in buf  # DRI segment
    assert any(bytes([0xFF, 0xD0 + m]) in buf for m in range(8))
    assert np.array_equal(base, codecs_jpeg.decode_jpeg(buf))


def test_restart_resets_dc_predictor():
    # a strong horizontal gradient makes DC predictions large; interval 1
    # forces a reset before every MCU — any missed reset shifts whole blocks
    ys, xs = np.mgrid[0:16, 0:64]
    img = np.repeat((xs * 4 % 256).astype(np.uint8)[:, :, None], 3, axis=2)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(img, 90))
    rst = codecs_jpeg.decode_jpeg(
        codecs_jpeg.encode_jpeg(img, 90, restart_interval=1))
    assert np.array_equal(base, rst)


# --------------------------------------------------------------------------
# chroma subsampling
# --------------------------------------------------------------------------

def test_subsampled_roundtrip_psnr():
    img = _smooth()
    for sub, floor in (("4:2:2", 40.0), ("4:2:0", 38.0)):
        out = codecs_jpeg.decode_jpeg(
            codecs_jpeg.encode_jpeg(img, 90, subsampling=sub))
        assert out.shape == img.shape
        assert codecs.psnr(img, out) >= floor, sub


def test_subsampling_gray_content_metamorphic():
    # r=g=b content has constant chroma (Cb=Cr=128): subsampling must be
    # lossless relative to 4:4:4 at the same quality
    ys, xs = np.mgrid[0:48, 0:40]
    img = np.repeat(((xs * 3 + ys * 5) % 256).astype(np.uint8)[:, :, None],
                    3, axis=2)
    base = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(img, 90))
    for sub in ("4:2:0", "4:2:2"):
        out = codecs_jpeg.decode_jpeg(
            codecs_jpeg.encode_jpeg(img, 90, subsampling=sub))
        assert np.array_equal(base, out), sub


def test_subsampled_sof_sampling_factors():
    buf = codecs_jpeg.encode_jpeg(_smooth(), 90, subsampling="4:2:0")
    k = buf.find(b"\xff\xc0")
    # SOF0: len(2) prec(1) h(2) w(2) nc(1) then (id, hv, tq) triples
    assert buf[k + 11] == 0x22 and buf[k + 14] == 0x11 and buf[k + 17] == 0x11


def test_combined_matrix_exact():
    # progressive and restarts never change pixels for fixed subsampling
    img = _smooth()
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        ref = codecs_jpeg.decode_jpeg(
            codecs_jpeg.encode_jpeg(img, 85, subsampling=sub))
        for kw in (dict(progressive=True), dict(restart_interval=3),
                   dict(progressive=True, restart_interval=3)):
            out = codecs_jpeg.decode_jpeg(
                codecs_jpeg.encode_jpeg(img, 85, subsampling=sub, **kw))
            assert np.array_equal(ref, out), (sub, kw)


@settings(max_examples=12, deadline=None)
@given(w=st.integers(1, 34), h=st.integers(1, 34), seed=st.integers(0, 999))
def test_any_size_any_mode_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w]
    base = (xs * rng.integers(1, 5) + ys * rng.integers(1, 5)) % 256
    img = np.stack([(base + c * 9) % 256 for c in range(3)],
                   axis=2).astype(np.uint8)
    for kw in (dict(subsampling="4:2:0"), dict(progressive=True),
               dict(subsampling="4:2:2", progressive=True,
                    restart_interval=1)):
        out = codecs_jpeg.decode_jpeg(codecs_jpeg.encode_jpeg(img, 92, **kw))
        assert out.shape == img.shape, kw
        assert codecs.psnr(img, out) >= 25.0, kw


# --------------------------------------------------------------------------
# decoder-only surfaces
# --------------------------------------------------------------------------

def _widen_dqt_to_16bit(buf: bytes) -> bytes:
    """Rewrite every 8-bit DQT segment as 16-bit precision (pq=1)."""
    out = bytearray()
    i = 0
    while i < len(buf):
        if buf[i] == 0xFF and i + 1 < len(buf) and buf[i + 1] == 0xDB:
            (ln,) = struct.unpack(">H", buf[i + 2:i + 4])
            payload = buf[i + 4:i + 2 + ln]
            new = bytearray()
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                assert pq == 0
                new.append((1 << 4) | tq)
                for v in payload[p + 1:p + 65]:
                    new += struct.pack(">H", v)
                p += 65
            out += bytes([0xFF, 0xDB]) + struct.pack(">H", len(new) + 2) + new
            i += 2 + ln
            continue
        out.append(buf[i])
        i += 1
    return bytes(out)


def test_decode_16bit_dqt():
    img = _fixture_img(9)
    buf = codecs_jpeg.encode_jpeg(img, 90)
    wide = _widen_dqt_to_16bit(buf)
    assert wide != buf
    assert np.array_equal(codecs_jpeg.decode_jpeg(buf),
                          codecs_jpeg.decode_jpeg(wide))


def test_reject_lossless_and_arithmetic_sof():
    buf = bytearray(codecs_jpeg.encode_jpeg(_fixture_img(1), 90))
    k = buf.find(b"\xff\xc0")
    for sof in (0xC3, 0xC9, 0xCB):
        buf[k + 1] = sof
        with pytest.raises(ValueError):
            codecs_jpeg.decode_jpeg(bytes(buf))


def test_reject_truncated_entropy():
    buf = codecs_jpeg.encode_jpeg(_fixture_img(1), 90)
    with pytest.raises((ValueError, EOFError)):
        codecs_jpeg.decode_jpeg(buf[:len(buf) // 2] )
