"""Animated WebP (VP8X + ANIM/ANMF) container codec — from scratch.

Implements the public "WebP Container Specification" animation layout:
a VP8X chunk with the animation flag, one ANIM chunk (background color,
loop count) and a chain of ANMF chunks, each carrying a frame rectangle
(x, y, w, h — x/y stored halved, so offsets are even), a duration, a
disposal bit and a blending bit, followed by an optional ALPH subchunk
and a VP8 or VP8L bitstream subchunk.  Frames decode through the
engine's own from-scratch codecs (kernels/vp8 for lossy keyframes,
kernels/webp for VP8L) and are composited onto the canvas with
libwebp-compatible semantics (``anim_decode.c``):

- the canvas starts fully-transparent black,
- blending method 0 alpha-blends the frame over the canvas inside the
  frame rectangle using non-premultiplied integer src-over
  (``blend_a = src_a + dst_a*(255-src_a)/255``,
  ``scale = src_a*255/blend_a``, C truncating division),
- blending method 1 overwrites the rectangle,
- disposal method 1 clears the rectangle back to transparent black
  AFTER the frame is emitted (libwebp disposes to transparent, not to
  the ANIM background color).

The reference repo (tayerthiaggo/irivermetrics) has no WebP surface at
all — this closes the engine's last quarantined image subformat so a
web-crawl image table's animated rows decode (first frame for still
consumers, every frame for the frame-sampling operator) instead of
diverting to the dead-letter sink.

``encode_webp_anim`` assembles a spec-conforming animation from VP8L
frames produced by the engine's own lossless encoder; it exists so
round-trip and cross-codec tests can pin every decoder path (the
embedded per-frame bitstreams are additionally verified against the
system libwebp in tests/test_webp_anim.py) and doubles as a sink for
the frame-sampling operator's inverse.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_MAX_PIXELS_DEFAULT = 1 << 26


@dataclass
class AnimFrame:
    """One parsed ANMF record (payloads still encoded)."""

    x: int
    y: int
    w: int
    h: int
    duration_ms: int
    dispose_background: bool
    blend: bool  # True = alpha-blend over canvas, False = overwrite
    alph: bytes | None
    tag: bytes  # b"VP8 " or b"VP8L"
    payload: bytes


@dataclass
class AnimInfo:
    """Parsed animation container metadata."""

    canvas_w: int
    canvas_h: int
    bgcolor_bgra: tuple[int, int, int, int]
    loop_count: int
    frames: list[AnimFrame]


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _p24(v: int) -> bytes:
    if not 0 <= v < 1 << 24:
        raise ValueError(f"value {v} out of 24-bit range")
    return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))


def iter_chunks(buf: bytes, start: int = 12):
    """Yields (tag, payload) for each RIFF subchunk; validates sizes."""
    p = start
    n = len(buf)
    while p + 8 <= n:
        tag = buf[p : p + 4]
        (size,) = struct.unpack("<I", buf[p + 4 : p + 8])
        if p + 8 + size > n:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, buf[p + 8 : p + 8 + size]
        p += 8 + size + (size & 1)


def parse_webp_anim(buf: bytes) -> AnimInfo:
    """Animated .webp bytes -> AnimInfo (no pixel decode)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP RIFF container")
    vp8x = None
    bg = (255, 255, 255, 255)
    loop = 0
    saw_anim = False
    frames: list[AnimFrame] = []
    for tag, body in iter_chunks(buf):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("short VP8X chunk")
            vp8x = body
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("short ANIM chunk")
            bg = tuple(body[0:4])  # spec order: B, G, R, A
            (loop,) = struct.unpack("<H", body[4:6])
            saw_anim = True
        elif tag == b"ANMF":
            frames.append(_parse_anmf(body))
    if vp8x is None or not (vp8x[0] & 0x02) or not saw_anim:
        raise ValueError("not an animated WebP (no VP8X animation flag/ANIM)")
    cw = _u24(vp8x, 4) + 1
    ch = _u24(vp8x, 7) + 1
    for f in frames:
        if f.x + f.w > cw or f.y + f.h > ch:
            raise ValueError(
                f"frame rect {f.w}x{f.h}@{f.x},{f.y} exceeds canvas {cw}x{ch}")
    return AnimInfo(cw, ch, bg, loop, frames)


def _parse_anmf(body: bytes) -> AnimFrame:
    if len(body) < 16:
        raise ValueError("short ANMF chunk")
    x = _u24(body, 0) * 2
    y = _u24(body, 3) * 2
    w = _u24(body, 6) + 1
    h = _u24(body, 9) + 1
    dur = _u24(body, 12)
    flags = body[15]
    alph = None
    tag = payload = None
    for ctag, cbody in iter_chunks(body, 16):
        if ctag == b"ALPH" and alph is None:
            alph = cbody
        elif ctag in (b"VP8 ", b"VP8L") and tag is None:
            tag, payload = ctag, cbody
    if tag is None:
        raise ValueError("ANMF frame has no VP8/VP8L bitstream")
    return AnimFrame(x, y, w, h, dur, bool(flags & 1), not (flags & 2),
                     alph, tag, payload)


def _decode_frame_rgba(frame: AnimFrame, max_pixels: int) -> np.ndarray:
    """ANMF payload -> (4, h, w) uint8 ARGB planes."""
    from . import vp8 as _vp8
    from . import webp as _webp

    if frame.tag == b"VP8L":
        # an ANMF VP8L payload is a FULL stream (signature byte + 14-bit
        # dims), unlike ALPH's headerless form — rewrap as a still
        still = b"WEBP" + _chunk(b"VP8L", frame.payload)
        argb = _webp.decode_vp8l(
            b"RIFF" + struct.pack("<I", len(still)) + still,
            max_pixels=max_pixels)
        if argb.shape != (4, frame.h, frame.w):
            raise ValueError("VP8L frame dims disagree with ANMF header")
        return argb
    Y, U, V = _vp8.decode_vp8(frame.payload, max_pixels=max_pixels)
    h, w = Y.shape
    if (w, h) != (frame.w, frame.h):
        raise ValueError("VP8 frame dims disagree with ANMF header")
    rgb = _vp8.yuv420_to_rgb(Y, U, V)
    out = np.empty((4, h, w), dtype=np.uint8)
    out[0] = _vp8.decode_alpha(frame.alph, w, h) if frame.alph is not None else 255
    out[1:] = rgb
    return out


def _blend_nonpremult(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """libwebp BlendPixelRowNonPremult: integer src-over on ARGB planes.

    All intermediates are non-negative, so numpy floor division equals
    C's truncating division.  Pixels with src alpha 0 keep dst whole.
    """
    sa = src[0].astype(np.int32)
    da = dst[0].astype(np.int32)
    blend_a = sa + (da * (255 - sa)) // 255
    safe = np.maximum(blend_a, 1)
    scale = (sa * 255) // safe
    out = np.empty_like(src)
    out[0] = blend_a.astype(np.uint8)
    out[1:] = ((src[1:].astype(np.int32) * scale
                + dst[1:].astype(np.int32) * (255 - scale)) // 255).astype(np.uint8)
    keep = sa == 0
    if keep.any():
        out[:, keep] = dst[:, keep]
    return out


def decode_webp_anim(
    buf: bytes,
    max_pixels: int = _MAX_PIXELS_DEFAULT,
    max_frames: int = 4096,
    every_k: int = 1,
) -> tuple[np.ndarray, list[int], AnimInfo]:
    """Animated .webp -> (frames, durations_ms, info).

    ``frames`` is (n, 4, canvas_h, canvas_w) uint8 ARGB — each entry is
    the fully-composited canvas snapshot for that frame, matching what
    libwebp's WebPAnimDecoder emits.  ``every_k`` keeps only every k-th
    snapshot (compositing still walks EVERY frame — disposal/blending
    are stateful — so sampling saves memory, not decode work).
    ``max_pixels`` bounds total composited output (n_kept * canvas
    pixels) AND each embedded bitstream, so adversarial headers cannot
    balloon memory.
    """
    info = parse_webp_anim(buf)
    if len(info.frames) > max_frames:
        raise ValueError(f"{len(info.frames)} frames exceeds cap {max_frames}")
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    n_keep = (len(info.frames) + every_k - 1) // every_k
    if n_keep * info.canvas_w * info.canvas_h > max_pixels:
        raise ValueError("animation exceeds max_pixels budget")
    canvas = np.zeros((4, info.canvas_h, info.canvas_w), dtype=np.uint8)
    out = np.empty((n_keep, 4, info.canvas_h, info.canvas_w), dtype=np.uint8)
    durations: list[int] = []
    kept = 0
    for i, f in enumerate(info.frames):
        rgba = _decode_frame_rgba(f, max_pixels)
        ys, xs = slice(f.y, f.y + f.h), slice(f.x, f.x + f.w)
        if f.blend:
            canvas[:, ys, xs] = _blend_nonpremult(rgba, canvas[:, ys, xs])
        else:
            canvas[:, ys, xs] = rgba
        if i % every_k == 0:
            out[kept] = canvas
            durations.append(f.duration_ms)
            kept += 1
        if f.dispose_background:
            canvas[:, ys, xs] = 0
    return out, durations, info


def decode_webp_anim_first(buf: bytes,
                           max_pixels: int = _MAX_PIXELS_DEFAULT) -> np.ndarray:
    """First composited frame as (4, canvas_h, canvas_w) uint8 ARGB —
    the still-image view of an animation (what image-level consumers
    like resize/embed see)."""
    info = parse_webp_anim(buf)
    if not info.frames:
        raise ValueError("animation has no frames")
    info.frames = info.frames[:1]
    f = info.frames[0]
    if f.w * f.h > max_pixels or info.canvas_w * info.canvas_h > max_pixels:
        raise ValueError("animation exceeds max_pixels budget")
    canvas = np.zeros((4, info.canvas_h, info.canvas_w), dtype=np.uint8)
    rgba = _decode_frame_rgba(f, max_pixels)
    if f.blend:
        canvas[:, f.y : f.y + f.h, f.x : f.x + f.w] = _blend_nonpremult(
            rgba, canvas[:, f.y : f.y + f.h, f.x : f.x + f.w])
    else:
        canvas[:, f.y : f.y + f.h, f.x : f.x + f.w] = rgba
    return canvas


def _still_vp8l_payload(frame_argb: np.ndarray, **enc_opts) -> bytes:
    """Encode (4,h,w) ARGB with the engine's VP8L encoder and return the
    bare VP8L chunk payload for embedding into an ANMF chunk."""
    from . import webp as _webp

    still = _webp.encode_vp8l(frame_argb, **enc_opts)
    for tag, body in iter_chunks(still):
        if tag == b"VP8L":
            return body
    raise AssertionError("encoder produced no VP8L chunk")


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def encode_webp_anim(
    frames,
    durations_ms,
    offsets=None,
    blend=None,
    dispose=None,
    canvas_wh: tuple[int, int] | None = None,
    loop_count: int = 0,
    bgcolor_bgra: tuple[int, int, int, int] = (0, 0, 0, 0),
    **enc_opts,
) -> bytes:
    """Assemble an animated .webp from (4,h,w) uint8 ARGB frames.

    ``offsets`` are (x, y) per frame and must be even (the container
    stores them halved); ``blend[i]`` True = alpha-blend (flag bit
    clear), ``dispose[i]`` True = dispose-to-background.  Frames are
    VP8L-encoded losslessly by the engine's own encoder, so
    decode(encode(...)) is exact.
    """
    n = len(frames)
    if len(durations_ms) != n:
        raise ValueError("durations length mismatch")
    offsets = offsets or [(0, 0)] * n
    blend = [True] * n if blend is None else list(blend)
    dispose = [False] * n if dispose is None else list(dispose)
    if canvas_wh is None:
        cw = max(off[0] + f.shape[2] for off, f in zip(offsets, frames))
        ch = max(off[1] + f.shape[1] for off, f in zip(offsets, frames))
    else:
        cw, ch = canvas_wh
    has_alpha = any((np.asarray(f)[0] != 255).any() for f in frames)
    anmfs = []
    for f, (x, y), bl, dsp, dur in zip(frames, offsets, blend, dispose, durations_ms):
        f = np.ascontiguousarray(np.asarray(f, dtype=np.uint8))
        _, fh, fw = f.shape
        if x % 2 or y % 2:
            raise ValueError("frame offsets must be even")
        if x + fw > cw or y + fh > ch:
            raise ValueError("frame exceeds canvas")
        head = (_p24(x // 2) + _p24(y // 2) + _p24(fw - 1) + _p24(fh - 1)
                + _p24(int(dur)) + bytes([(0 if bl else 2) | (1 if dsp else 0)]))
        body = head + _chunk(b"VP8L", _still_vp8l_payload(f, **enc_opts))
        anmfs.append(_chunk(b"ANMF", body))
    flags = 0x02 | (0x10 if has_alpha else 0)
    vp8x = bytes([flags, 0, 0, 0]) + _p24(cw - 1) + _p24(ch - 1)
    anim = bytes(bgcolor_bgra) + struct.pack("<H", loop_count)
    riff = b"WEBP" + _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim) + b"".join(anmfs)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
