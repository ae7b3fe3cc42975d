"""Provenance script for the lossy-VP8 WebP conformance fixtures.

Encodes deterministic synthetic artwork (plus the engine's committed
third-party artwork ``conformance_pal.png``) with the system libwebp
(libwebp.so.7, the reference implementation of RFC 6386) via ctypes,
and records libwebp's own decoded YUV planes as goldens.  The goldens
are the NORMATIVE decoder output — post loop filter, before any
YUV->RGB conversion, which RFC 6386 does not standardise — so
``kernels/vp8.py`` must match them bit-for-bit.

Run once on a box with libwebp; the outputs are committed to
``tests/data/`` so the test suite never needs the library:

    tests/data/vp8_*.webp          the encoded fixtures
    tests/data/vp8_goldens.npz     {name}_Y / _U / _V uint8 planes
                                   (+ {name}_A for alpha fixtures)

The CPython test fixture ``python.webp`` (VP8X + ALPH + VP8, 16x16
RGBA) is also copied in, with libwebp's RGBA decode as its golden —
it pins the extended-container + compressed-alpha path against a
file this repo did not encode.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import sys

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
CPY_WEBP = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.webp"


def _bind(lw):
    lw.WebPEncodeRGB.restype = ctypes.c_size_t
    lw.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.argtypes = lw.WebPEncodeRGB.argtypes
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeYUV.argtypes = (
        [ctypes.c_char_p, ctypes.c_size_t]
        + [ctypes.POINTER(ctypes.c_int)] * 2
        + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
        + [ctypes.POINTER(ctypes.c_int)] * 2)
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def decode_yuv(lw, buf: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st, uvst = ctypes.c_int(), ctypes.c_int()
    yp = lw.WebPDecodeYUV(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(st), ctypes.byref(uvst))
    if not yp:
        raise RuntimeError("libwebp YUV decode failed")
    cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
    Y = np.ctypeslib.as_array(yp, shape=(h.value, st.value))[:, :w.value].copy()
    U = np.ctypeslib.as_array(up, shape=(ch, uvst.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(vp, shape=(ch, uvst.value))[:, :cw].copy()
    return Y, U, V


def decode_rgba(lw, buf: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lw.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("libwebp RGBA decode failed")
    return np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()


def synth_rgb(w: int, h: int) -> np.ndarray:
    """Deterministic artwork mixing flat fields, gradients, hard edges
    and pseudo-random texture — chosen so the encoder uses both 16x16
    and 4x4 intra modes and every coefficient token category."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = np.full((h, w), 32, np.uint8)
    # hard-edged checker quadrant (forces strong AC energy / B_PRED)
    checker = (((xx // 3) + (yy // 3)) % 2 * 255).astype(np.uint8)
    q = (xx >= w // 2) & (yy < h // 2)
    r = np.where(q, checker, r)
    # LCG texture quadrant (dense residuals, big tokens at low quality)
    t = ((xx * 7919 + yy * 104729 + (xx * yy) % 251) % 256).astype(np.uint8)
    q2 = (xx < w // 2) & (yy >= h // 2)
    g = np.where(q2, t, g)
    return np.dstack([r, g, b])


def main():
    lw = ctypes.CDLL(LIB)
    _bind(lw)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from irivermetrics_spark.kernels import png

    goldens = {}

    def encode(name, rgb, quality, alpha=None):
        h, w = rgb.shape[:2]
        out = ctypes.c_void_p()
        if alpha is not None:
            rgba = np.dstack([rgb, alpha]).astype(np.uint8)
            n = lw.WebPEncodeRGBA(np.ascontiguousarray(rgba).tobytes(),
                                  w, h, w * 4, float(quality),
                                  ctypes.byref(out))
        else:
            n = lw.WebPEncodeRGB(np.ascontiguousarray(rgb).tobytes(),
                                 w, h, w * 3, float(quality),
                                 ctypes.byref(out))
        if not n:
            raise RuntimeError(f"libwebp encode failed for {name}")
        buf = ctypes.string_at(out, n)
        with open(os.path.join(OUT, f"{name}.webp"), "wb") as f:
            f.write(buf)
        Y, U, V = decode_yuv(lw, buf)
        goldens[f"{name}_Y"], goldens[f"{name}_U"], goldens[f"{name}_V"] = Y, U, V
        if alpha is not None:
            goldens[f"{name}_A"] = decode_rgba(lw, buf)[:, :, 3]
        print(name, len(buf), "bytes", Y.shape)

    art = png.decode_png(
        open(os.path.join(OUT, "conformance_pal.png"), "rb").read())
    art_rgb = np.transpose(art[:3], (1, 2, 0)).astype(np.uint8)

    encode("vp8_art_q75", art_rgb, 75)
    big = synth_rgb(80, 48)
    encode("vp8_synth_q10", big, 10)
    encode("vp8_synth_q75", big, 75)
    encode("vp8_synth_q95", big, 95)
    odd = synth_rgb(50, 34)          # crops: 50=3*16+2, 34=2*16+2
    encode("vp8_odd_q50", odd, 50)
    tall = synth_rgb(17, 63)         # 2x4 MB grid, heavy crop both axes
    encode("vp8_tall_q30", tall, 30)
    amask = ((np.mgrid[0:48, 0:80][0] * 5 + np.mgrid[0:48, 0:80][1] * 3)
             % 256).astype(np.uint8)
    encode("vp8_alpha_q75", big, 75, alpha=amask)

    cpy = open(CPY_WEBP, "rb").read()
    with open(os.path.join(OUT, "vp8_python.webp"), "wb") as f:
        f.write(cpy)
    goldens["vp8_python_RGBA"] = decode_rgba(lw, cpy)
    print("vp8_python", len(cpy), "bytes", goldens["vp8_python_RGBA"].shape)

    np.savez_compressed(os.path.join(OUT, "vp8_goldens.npz"), **goldens)
    print("goldens:", sorted(goldens))


if __name__ == "__main__":
    main()
