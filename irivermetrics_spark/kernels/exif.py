"""From-scratch EXIF metadata kernel — header-only parse of the TIFF
IFD tree embedded in JPEG APP1 segments (and in bare TIFF files), plus
the orientation transform and a writer for synthesis/tests.

Why it matters at 100 TB: camera metadata drives image curation —
orientation must be applied before any perceptual hash or embedding
(a rotated duplicate otherwise hashes differently), capture timestamps
drive dedup windows, and GPS tags are PII that must be inventoried and
strippable. All of that has to come from a HEADER-ONLY read: the APP1
segment is ≤ 64 KB by JPEG framing, so the probe never touches pixel
data (same contract as codecs.probe_image_info).

Structure (public EXIF 2.3 / TIFF 6.0 spec, reimplemented):
JPEG APP1 payload = ``Exif\\0\\0`` + a self-contained TIFF blob whose
offsets are relative to the blob start. IFD0 carries camera tags and
pointers to the Exif sub-IFD (tag 34665) and GPS IFD (tag 34853). GPS
coordinates are degree/minute/second RATIONAL triples with N/S/E/W
sign refs.

Never raises: ``parse_exif`` returns a dict with whatever was
parseable and an ``error`` note otherwise. Bounds-checked throughout —
a truncated or hostile blob yields fields, not exceptions.
"""

from __future__ import annotations

import struct

# tag -> friendly name (IFD0 + Exif sub-IFD + GPS)
_IFD0_TAGS = {271: "make", 272: "model", 274: "orientation",
              305: "software", 306: "datetime"}
_EXIF_TAGS = {33434: "exposure_time", 33437: "f_number", 34855: "iso",
              36867: "datetime_original", 37386: "focal_length",
              40962: "pixel_width", 40963: "pixel_height"}
_GPS_TAGS = {1: "gps_lat_ref", 2: "gps_lat_dms", 3: "gps_lon_ref",
             4: "gps_lon_dms", 6: "gps_altitude"}

_EXIF_IFD_PTR = 34665
_GPS_IFD_PTR = 34853

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_value(blob: bytes, endian: str, off: int):
    """Decode one 12-byte IFD entry's value (bounds-safe; None on any
    overflow)."""
    if off + 12 > len(blob):
        return None, None
    tag, typ, count = struct.unpack(endian + "HHI", blob[off:off + 8])
    unit = _TYPE_SIZE.get(typ)
    if unit is None or count > 1 << 20:
        return tag, None
    size = unit * count
    if size <= 4:
        raw = blob[off + 8:off + 8 + size]
    else:
        (voff,) = struct.unpack(endian + "I", blob[off + 8:off + 12])
        if voff + size > len(blob):
            return tag, None
        raw = blob[voff:voff + size]
    if len(raw) < size:
        return tag, None
    if typ == 2:  # ASCII
        return tag, raw.split(b"\x00", 1)[0].decode("latin-1", "replace")
    if typ == 3:
        vals = struct.unpack(f"{endian}{count}H", raw)
    elif typ == 4:
        vals = struct.unpack(f"{endian}{count}I", raw)
    elif typ == 9:
        vals = struct.unpack(f"{endian}{count}i", raw)
    elif typ in (5, 10):  # (S)RATIONAL pairs
        kind = "I" if typ == 5 else "i"
        flat = struct.unpack(f"{endian}{2 * count}{kind}", raw)
        vals = tuple((flat[2 * i], flat[2 * i + 1]) for i in range(count))
    else:  # BYTE/UNDEFINED
        return tag, raw
    return tag, vals[0] if count == 1 else list(vals)


def _parse_ifd(blob: bytes, endian: str, off: int, names: dict) -> dict:
    out = {}
    if off + 2 > len(blob):
        return out
    (n,) = struct.unpack(endian + "H", blob[off:off + 2])
    for i in range(min(n, 512)):  # cap: a real IFD has dozens of tags
        tag, val = _read_value(blob, endian, off + 2 + i * 12)
        if tag is None:
            break
        if tag in names and val is not None:
            out[names[tag]] = val
        elif tag in (_EXIF_IFD_PTR, _GPS_IFD_PTR) and isinstance(val, int):
            out[tag] = val
    return out


def _dms_to_deg(dms, ref) -> float | None:
    try:
        if isinstance(dms, tuple):  # single rational (degenerate)
            dms = [dms]
        parts = []
        for num, den in dms[:3]:
            if den == 0:
                return None
            parts.append(num / den)
        while len(parts) < 3:
            parts.append(0.0)
        deg = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
        if ref in ("S", "W"):
            deg = -deg
        return deg
    except (TypeError, ValueError):
        return None


def parse_tiff_exif(blob: bytes) -> dict:
    """Parse a bare TIFF/EXIF blob (offsets relative to blob start)."""
    out: dict = {}
    if blob[:4] == b"II*\x00":
        endian = "<"
    elif blob[:4] == b"MM\x00*":
        endian = ">"
    else:
        return {"error": "no TIFF header"}
    if len(blob) < 8:
        return {"error": "truncated TIFF header"}
    (ifd0_off,) = struct.unpack(endian + "I", blob[4:8])
    ifd0 = _parse_ifd(blob, endian, ifd0_off, _IFD0_TAGS)
    exif_ptr = ifd0.pop(_EXIF_IFD_PTR, None)
    gps_ptr = ifd0.pop(_GPS_IFD_PTR, None)
    out.update(ifd0)
    if exif_ptr is not None:
        out.update(_parse_ifd(blob, endian, exif_ptr, _EXIF_TAGS))
    if gps_ptr is not None:
        gps = _parse_ifd(blob, endian, gps_ptr, _GPS_TAGS)
        lat = _dms_to_deg(gps.get("gps_lat_dms"), gps.get("gps_lat_ref"))
        lon = _dms_to_deg(gps.get("gps_lon_dms"), gps.get("gps_lon_ref"))
        if lat is not None:
            out["gps_lat"] = lat
        if lon is not None:
            out["gps_lon"] = lon
        alt = gps.get("gps_altitude")
        if isinstance(alt, tuple) and alt[1]:
            out["gps_altitude"] = alt[0] / alt[1]
    # rationals -> floats for the scalar photo tags
    for k in ("exposure_time", "f_number", "focal_length"):
        v = out.get(k)
        if isinstance(v, tuple):
            out[k] = (v[0] / v[1]) if v[1] else None
    return out


def parse_exif(buf: bytes) -> dict:
    """EXIF fields from JPEG bytes (APP1 walk) or a bare TIFF blob.
    Header-only: the JPEG walk stops at SOS and reads no entropy data.
    Returns {} when no EXIF is present; {'error': ...} on malformed
    containers; never raises."""
    try:
        b = bytes(buf) if buf is not None else b""
        if b[:4] in (b"II*\x00", b"MM\x00*"):
            return parse_tiff_exif(b)
        if b[:2] != b"\xff\xd8":
            return {}
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return {"error": f"marker desync at {i}"}
            marker = b[i + 1]
            if marker == 0xDA or marker == 0xD9:  # SOS / EOI: no EXIF
                return {}
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # bare markers
                i += 2
                continue
            (seg,) = struct.unpack(">H", b[i + 2:i + 4])
            if marker == 0xE1 and b[i + 4:i + 10] == b"Exif\x00\x00":
                return parse_tiff_exif(b[i + 10:i + 2 + seg])
            i += 2 + seg
        return {}
    except Exception as e:  # hostile input: quarantine, don't fail tasks
        return {"error": f"{type(e).__name__}: {e}"}


def apply_orientation(arr, orientation: int):
    """Undo the EXIF orientation so pixels are display-upright. Works
    on (..., h, w) arrays (band-first or 2-D). Orientation semantics
    are the EXIF 2.3 table; 1/None = already upright."""
    import numpy as np

    o = int(orientation or 1)
    if o == 1:
        return arr
    if o == 2:
        return arr[..., :, ::-1]
    if o == 3:
        return np.rot90(arr, 2, axes=(-2, -1))
    if o == 4:
        return arr[..., ::-1, :]
    if o == 5:
        return np.rot90(arr[..., :, ::-1], 1, axes=(-2, -1))
    if o == 6:
        return np.rot90(arr, -1, axes=(-2, -1))
    if o == 7:
        return np.rot90(arr[..., :, ::-1], -1, axes=(-2, -1))
    if o == 8:
        return np.rot90(arr, 1, axes=(-2, -1))
    raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")


# ---------------------------------------------------------------- writer

def _entry(tag: int, typ: int, count: int, value_or_off: bytes) -> bytes:
    return struct.pack("<HHI", tag, typ, count) + value_or_off.ljust(4, b"\x00")


def build_tiff_exif(*, orientation: int | None = None, make: str | None = None,
                    model: str | None = None, datetime_original: str | None = None,
                    gps: tuple[float, float] | None = None) -> bytes:
    """Serialize a minimal little-endian EXIF TIFF blob (IFD0 +
    optional Exif/GPS sub-IFDs). Used by synthesis and tests; the
    parser is exercised against hand-built streams too."""
    overflow = bytearray()
    ifd0: list[tuple[int, int, int, bytes | None, bytes | None]] = []

    def add(entries, tag, typ, count, inline=None, data=None):
        entries.append((tag, typ, count, inline, bytes(data) if data is not None else None))

    if make:
        add(ifd0, 271, 2, len(make) + 1, data=make.encode() + b"\x00")
    if model:
        add(ifd0, 272, 2, len(model) + 1, data=model.encode() + b"\x00")
    if orientation is not None:
        add(ifd0, 274, 3, 1, inline=struct.pack("<H", orientation))

    exif_entries = []
    if datetime_original:
        s = datetime_original.encode() + b"\x00"
        add(exif_entries, 36867, 2, len(s), data=s)
    gps_entries = []
    if gps is not None:
        lat, lon = gps

        def dms(v: float) -> bytes:
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return struct.pack("<6I", d, 1, m, 1, s, 10000)

        add(gps_entries, 1, 2, 2, inline=(b"N\x00" if lat >= 0 else b"S\x00"))
        add(gps_entries, 2, 5, 3, data=dms(lat))
        add(gps_entries, 3, 2, 2, inline=(b"E\x00" if lon >= 0 else b"W\x00"))
        add(gps_entries, 4, 5, 3, data=dms(lon))

    # layout: header(8) IFD0 [ExifIFD] [GPSIFD] overflow
    n0 = len(ifd0) + (1 if exif_entries else 0) + (1 if gps_entries else 0)
    ifd0_off = 8
    exif_off = ifd0_off + 2 + n0 * 12 + 4
    gps_off = exif_off + ((2 + len(exif_entries) * 12 + 4) if exif_entries else 0)
    data_off = gps_off + ((2 + len(gps_entries) * 12 + 4) if gps_entries else 0)

    def serialize(entries, extra_ptrs=()):
        body = b""
        all_entries = list(entries) + list(extra_ptrs)
        all_entries.sort(key=lambda e: e[0])  # tags ascend per spec
        for tag, typ, count, inline, data in all_entries:
            if data is not None and len(data) > 4:
                off = data_off + len(overflow)
                overflow.extend(data)
                body += _entry(tag, typ, count, struct.pack("<I", off))
            else:
                # TIFF 6.0: values that fit in 4 bytes go INLINE in the
                # value field (a reader treats the field as data, not an
                # offset, whenever unit*count <= 4)
                body += _entry(tag, typ, count, data if data is not None else inline)
        return struct.pack("<H", len(all_entries)) + body + struct.pack("<I", 0)

    ptrs = []
    if exif_entries:
        ptrs.append((_EXIF_IFD_PTR, 4, 1, struct.pack("<I", exif_off), None))
    if gps_entries:
        ptrs.append((_GPS_IFD_PTR, 4, 1, struct.pack("<I", gps_off), None))
    blob = struct.pack("<2sHI", b"II", 42, ifd0_off) + serialize(ifd0, ptrs)
    if exif_entries:
        blob += serialize(exif_entries)
    if gps_entries:
        blob += serialize(gps_entries)
    return bytes(blob) + bytes(overflow)


def insert_exif_app1(jpeg: bytes, tiff_blob: bytes) -> bytes:
    """Splice an EXIF APP1 segment right after SOI (before any APP0)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    payload = b"Exif\x00\x00" + tiff_blob
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF blob too large for one APP1 segment")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]
