"""From-scratch PNG codec (RFC 2083), numpy + stdlib zlib.

Closes the ``png`` leg of the external-codec seam
(operators/multimodal.py:_decode_any): the web's second format after
JPEG. DEFLATE comes from the Python standard library's zlib — the only
compression dependency, and one that ships with every CPython — while
chunk framing, scanline unfiltering (all five filter types incl. the
Paeth predictor), palette/tRNS expansion and encoding live here.

Scope: bit depth 8 (plus 1/2/4-bit palette), color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); no Adam7 interlace and
no 16-bit depth — both rejected with clear errors. The encoder writes
color types 0/2/4/6 with per-row filter 0 and zlib level 6.

Conformance: committed third-party files (CPython test suite / IDLE
icons) decode, and the SAME 16x16 Python-logo artwork committed as
both python.png and python.jpg must agree across the two independent
from-scratch decoders to lossy-JPEG tolerance (tests/test_png.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: h rows of (1 filter byte + stride data bytes) -> (h, stride)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: prefix sum with lag bpp, vectorized per phase
            rec = line.copy()
            for ph in range(bpp):
                rec[ph::bpp] = np.cumsum(rec[ph::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (line + prior) % 256
        elif ftype == 3:  # Average (left dependency -> per-byte)
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + (left + prior[i]) // 2) % 256
        elif ftype == 4:  # Paeth (left dependency -> per-byte)
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + _paeth(int(left), int(prior[i]), int(ul))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def _unpack_bits(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """(h, stride) packed sub-byte samples -> (h, w) indices."""
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    mask = (1 << depth) - 1
    expanded = (row_bytes[:, :, None] >> shifts[None, None, :]) & mask
    return expanded.reshape(row_bytes.shape[0], -1)[:, :w]


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (channels, h, w) uint8 (palette expanded to RGB[A])."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    i = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while i + 8 <= len(buf):
        ln, typ = struct.unpack(">I4s", buf[i:i + 8])
        data = buf[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if inter:
                raise ValueError("Adam7 interlaced PNG not supported")
            if comp or filt:
                raise ValueError("non-standard compression/filter method")
            if depth == 16:
                raise ValueError("16-bit PNG not supported")
            if color not in _CHANNELS:
                raise ValueError(f"unknown color type {color}")
            if depth != 8 and color != 3 and not (color == 0 and depth in (1, 2, 4)):
                raise ValueError(f"depth {depth} only supported for palette/gray")
            ihdr = (w, h, depth, color)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = bytes(data)  # palette: u8 alphas; gray/RGB: >u2 key(s)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color = ihdr
    nch = _CHANNELS[color]
    bits_per_px = depth * nch
    stride = (w * bits_per_px + 7) // 8
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.shape[0] != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    bpp = max(1, bits_per_px // 8)
    rows = _unfilter(raw, h, stride, bpp)

    if depth < 8:  # packed gray or palette indices
        samples = _unpack_bits(rows, depth, w)
        if color == 0:  # scale to 8-bit
            scale = 255 // ((1 << depth) - 1)
            g = (samples * scale).astype(np.uint8)[None, :, :]
            if trns is not None:
                # tRNS for grayscale: one 16-bit sample key; sub-byte
                # depths key on the RAW (pre-scale) sample value
                key = struct.unpack(">H", trns[:2])[0] & ((1 << depth) - 1)
                a = np.where(samples == key, 0, 255).astype(np.uint8)
                return np.ascontiguousarray(np.concatenate([g, a[None]], axis=0))
            return g
        idx = samples
    elif color == 3:
        idx = rows[:, :w]
    else:
        img = rows.reshape(h, w, nch).transpose(2, 0, 1)
        if trns is not None and color in (0, 2):
            # tRNS for gray (1 key) / RGB (3 keys): 16-bit sample values;
            # pixels matching the key become fully transparent, emitted
            # as an extra alpha channel (ADVICE r3: previously dropped)
            keys = np.frombuffer(trns, dtype=">u2")[:nch].astype(np.uint16)
            match = np.all(img.astype(np.uint16) == keys[:, None, None], axis=0)
            a = np.where(match, 0, 255).astype(np.uint8)
            img = np.concatenate([img, a[None, :, :]], axis=0)
        return np.ascontiguousarray(img)

    if plte is None:
        raise ValueError("palette image without PLTE")
    rgb = plte[idx]  # (h, w, 3)
    if trns is not None:
        t = np.frombuffer(trns, dtype=np.uint8)
        alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
        alpha[: t.shape[0]] = t
        a = alpha[idx]
        out = np.concatenate([rgb, a[:, :, None]], axis=2)
        return np.ascontiguousarray(out.transpose(2, 0, 1))
    return np.ascontiguousarray(rgb.transpose(2, 0, 1))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(1|2|3|4, h, w) uint8 -> PNG bytes (filter 0, zlib level 6)."""
    if arr.ndim != 3 or arr.shape[0] not in (1, 2, 3, 4):
        raise ValueError(f"expected (1|2|3|4, h, w) uint8, got {arr.shape}")
    nch, h, w = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    interleaved = np.ascontiguousarray(arr.transpose(1, 2, 0)).reshape(h, w * nch)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), interleaved.astype(np.uint8)], axis=1
    ).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    out = bytearray(_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    out += chunk(b"IDAT", zlib.compress(raw, level))
    out += chunk(b"IEND", b"")
    return bytes(out)
