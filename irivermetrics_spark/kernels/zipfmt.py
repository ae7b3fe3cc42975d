"""From-scratch ZIP archive kernel — central-directory reader +
deterministic writer (PKWARE APPNOTE public spec, reimplemented).

Why it matters at 100 TB: after tar (WebDataset), zip is the other
container training corpora actually arrive in (scraped dataset dumps,
Kaggle-style bundles, office formats). The reader is
central-directory-driven — the authoritative index at the END of the
file — so member listing is O(directory), and per-member access is
exact (local headers with zero sizes + data descriptors, the streaming
writer norm, are handled by trusting the CD values, as the spec
directs). Stored (0) and deflate (8) methods cover essentially all
real archives; anything else surfaces as a per-member error, not a
task failure. CRC-32 and size are verified on every extraction, and
an expansion cap bounds zip bombs (the reader never materializes past
the cap).

Writer determinism: fixed DOS timestamp (1980-01-01), no extra
fields, UTF-8 names flagged (bit 11), version-needed 20 — archive
bytes are a pure function of the (name, payload, method) list.
Zip64 is out of scope both ways (rejected with a clear error at >4 GiB
or when the zip64 EOCD locator is present); the Spark grain is
many ≤1 GiB archives, not one huge one.
"""

from __future__ import annotations

import struct
import zlib

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"
_ZIP64_LOC_SIG = b"PK\x06\x07"


def list_zip(blob: bytes) -> list[dict]:
    """Parse the central directory: [{'name', 'method', 'crc32',
    'comp_size', 'size', 'header_off'}, ...]. Raises ValueError on
    structural corruption (no/garbled EOCD or CD, zip64)."""
    blob = bytes(blob)
    # EOCD: fixed 22 bytes + up to 64 KiB comment — search backwards
    tail_start = max(0, len(blob) - 22 - 65535)
    pos = blob.rfind(_EOCD_SIG, tail_start)
    if pos < 0 or pos + 22 > len(blob):
        raise ValueError("no end-of-central-directory record")
    (n_disk, cd_disk, n_here, n_total, cd_size, cd_off, comment_len) = \
        struct.unpack("<HHHHIIH", blob[pos + 4:pos + 22])
    if blob.rfind(_ZIP64_LOC_SIG, max(0, pos - 20), pos) >= 0:
        raise ValueError("zip64 archives not supported")
    if n_disk or cd_disk:
        raise ValueError("multi-disk archives not supported")
    if cd_off + cd_size > len(blob):
        raise ValueError("central directory extends past the archive")
    out = []
    i = cd_off
    for _ in range(n_total):
        if blob[i:i + 4] != _CD_SIG or i + 46 > len(blob):
            raise ValueError(f"bad central-directory entry at {i}")
        (ver_made, ver_need, flags, method, mtime, mdate, crc, comp_size,
         size, name_len, extra_len, comment_len2, disk_no, int_attr,
         ext_attr, header_off) = struct.unpack("<HHHHHHIIIHHHHHII",
                                               blob[i + 4:i + 46])
        name_raw = blob[i + 46:i + 46 + name_len]
        enc = "utf-8" if flags & 0x800 else "cp437"
        out.append(dict(name=name_raw.decode(enc, "replace"), method=method,
                        crc32=crc, comp_size=comp_size, size=size,
                        header_off=header_off))
        i += 46 + name_len + extra_len + comment_len2
    return out


def read_member(blob: bytes, entry: dict,
                max_bytes: int = 1 << 30) -> bytes:
    """Extract + verify one member located by its central-directory
    entry. Sizes/CRC come from the CD (local headers may carry zeros
    under the streaming-writer flag); ValueError on corruption,
    unsupported method, or the expansion cap."""
    blob = bytes(blob)
    off = entry["header_off"]
    if blob[off:off + 4] != _LOCAL_SIG or off + 30 > len(blob):
        raise ValueError(f"bad local header for {entry['name']!r}")
    name_len, extra_len = struct.unpack("<HH", blob[off + 26:off + 30])
    data_off = off + 30 + name_len + extra_len
    comp = blob[data_off:data_off + entry["comp_size"]]
    if len(comp) != entry["comp_size"]:
        raise ValueError(f"member {entry['name']!r} truncated")
    if entry["size"] > max_bytes:
        raise ValueError(f"member {entry['name']!r} exceeds the "
                         f"{max_bytes}-byte expansion cap")
    if entry["method"] == 0:
        data = comp
    elif entry["method"] == 8:
        d = zlib.decompressobj(wbits=-15)
        data = d.decompress(comp, entry["size"] + 1)
        if len(data) > entry["size"] or (d.decompress(b"", 1) if not d.eof else b""):
            raise ValueError(f"member {entry['name']!r} inflates past "
                             "its declared size")
    else:
        raise ValueError(f"unsupported compression method {entry['method']}")
    if len(data) != entry["size"]:
        raise ValueError(f"member {entry['name']!r} size mismatch")
    if zlib.crc32(data) & 0xFFFFFFFF != entry["crc32"]:
        raise ValueError(f"member {entry['name']!r} CRC mismatch")
    return data


def iter_zip(blob: bytes, max_bytes: int = 1 << 30):
    """Yield (name, payload) for every regular member (directory
    entries — trailing '/' with empty payload — are skipped)."""
    for entry in list_zip(blob):
        if entry["name"].endswith("/") and entry["size"] == 0:
            continue
        yield entry["name"], read_member(blob, entry, max_bytes)


# ---------------------------------------------------------------- writer

def write_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """Serialize (name, payload) pairs deterministically. ``compress``
    deflates members (level 6, raw stream) when that actually shrinks
    them; stored otherwise — the same decision every real writer
    makes, and it exercises both read paths."""
    if len(members) > 0xFFFF:
        raise ValueError("zip64-sized member counts (>65535) not supported")
    out = bytearray()
    cd = bytearray()
    for name, data in members:
        data = bytes(data)
        raw_name = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        comp = None
        method = 0
        if compress and data:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            cand = c.compress(data) + c.flush()
            if len(cand) < len(data):
                comp, method = cand, 8
        if comp is None:
            comp = data
        if max(len(data), len(comp)) >= 0xFFFFFFFF or len(out) >= 0xFFFFFFFF:
            raise ValueError("zip64-sized inputs not supported")
        header_off = len(out)
        # flags 0x800 = UTF-8 names; dostime 0 / dosdate 0x21 =
        # 1980-01-01 00:00:00 (deterministic)
        out += _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0x800, method, 0, 0x21,
            crc, len(comp), len(data), len(raw_name), 0) + raw_name
        out += comp
        cd += _CD_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0x800, method, 0, 0x21,
            crc, len(comp), len(data), len(raw_name), 0, 0, 0, 0,
            0, header_off) + raw_name
    cd_off = len(out)
    out += cd
    out += _EOCD_SIG + struct.pack("<HHHHIIH", 0, 0, len(members),
                                   len(members), len(cd), cd_off, 0)
    return bytes(out)
