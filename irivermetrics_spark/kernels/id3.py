"""From-scratch ID3v2 tag kernel — header-only text-frame parse for
mp3 payloads (the audio analog of the EXIF probe in kernels/exif.py).

Why it matters at 100 TB: audio curation keys on creator/title/date
metadata exactly the way image curation keys on EXIF — dedup windows
(same recording re-encoded), source attribution, and PII-adjacent
fields (artist/comment) that must be inventoried before publishing a
corpus. The tag sits at the FRONT of the file with a length-framed
header, so the probe is O(tag), never O(payload) — same contract as
codecs.probe_image_info.

Structure (public id3.org specs v2.2/2.3/2.4, reimplemented):
header = "ID3" ver(2) flags(1) size(4, syncsafe). Frames follow:
v2.3/2.4 = id(4) size(4) flags(2); v2.2 = id(3) size(3). Frame size is
syncsafe in v2.4 only. Text frames (T***/T**) start with an encoding
byte: 0 latin-1, 1 utf-16 with BOM, 2 utf-16-be, 3 utf-8. The v2.3
extended header (flag 0x40) is size-prefixed and skipped; the
unsynchronisation flag (0x80) applies FF 00 -> FF de-stuffing over the
tag body.

``parse_id3`` never raises: malformed/hostile input yields whatever
fields were parseable plus an ``error`` note. A deterministic writer
(v2.3) serves synthesis and tests; the parser is additionally pinned
on hand-built v2.2/v2.4 streams so it never depends on its own writer.
"""

from __future__ import annotations

import struct

# frame id (v2.3/2.4) -> friendly name; v2.2 3-byte ids mapped below
_TEXT_FRAMES = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TYER": "year", "TDRC": "year",  # v2.3 vs v2.4 recording time
    "TCON": "genre", "TRCK": "track", "TLEN": "length_ms",
    "TSSE": "encoder", "TLAN": "language",
}
_V22_FRAMES = {"TT2": "title", "TP1": "artist", "TAL": "album",
               "TYE": "year", "TCO": "genre", "TRK": "track"}

_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(raw: bytes) -> int:
    n = 0
    for b in raw:
        if b & 0x80:
            raise ValueError("non-syncsafe byte in syncsafe field")
        n = (n << 7) | b
    return n


def _decode_text(payload: bytes) -> str | None:
    if not payload:
        return None
    enc = _ENCODINGS.get(payload[0])
    if enc is None:
        return None
    s = payload[1:].decode(enc, "replace")
    # values are NUL-terminated (possibly multi-valued in v2.4: keep
    # the first value — the curation-relevant one)
    return s.split("\x00", 1)[0].strip() or None


def parse_id3(buf) -> dict:
    """Text-frame fields from a leading ID3v2 tag. Returns {} when no
    tag is present; partial fields + 'error' on malformed tags; never
    raises. Also reports 'id3_version' and 'id3_size' (total tag bytes
    including header — what the audio probes skip)."""
    out: dict = {}
    try:
        b = bytes(buf) if buf is not None else b""
        if len(b) < 10 or b[:3] != b"ID3":
            return {}
        ver_major, flags = b[3], b[5]
        if ver_major not in (2, 3, 4) or b[4] == 0xFF:
            return {"error": f"unsupported ID3v2.{ver_major} tag"}
        try:
            size = _syncsafe(b[6:10])
        except ValueError as e:
            return {"error": str(e)}
        out["id3_version"] = f"2.{ver_major}"
        out["id3_size"] = 10 + size + (10 if flags & 0x10 else 0)  # footer
        body = b[10:10 + size]
        if flags & 0x80:  # unsynchronisation: FF 00 -> FF
            body = body.replace(b"\xff\x00", b"\xff")
        i = 0
        if ver_major in (3, 4) and flags & 0x40:  # extended header
            if len(body) < 4:
                out["error"] = "truncated extended header"
                return out
            ehs = (struct.unpack(">I", body[:4])[0]
                   if ver_major == 3 else _syncsafe(body[:4]))
            i = (4 + ehs) if ver_major == 3 else ehs
        id_len = 3 if ver_major == 2 else 4
        size_len = 3 if ver_major == 2 else 4
        head_len = id_len + size_len + (0 if ver_major == 2 else 2)
        names = _V22_FRAMES if ver_major == 2 else _TEXT_FRAMES
        while i + head_len <= len(body):
            fid = body[i:i + id_len]
            if fid.strip(b"\x00") == b"":  # padding reached
                break
            raw_size = body[i + id_len:i + id_len + size_len]
            if ver_major == 4:
                fsize = _syncsafe(raw_size)
            elif ver_major == 3:
                (fsize,) = struct.unpack(">I", raw_size)
            else:
                fsize = (raw_size[0] << 16) | (raw_size[1] << 8) | raw_size[2]
            if fsize < 0 or i + head_len + fsize > len(body):
                out["error"] = f"frame {fid!r} overruns tag body"
                break
            name = names.get(fid.decode("latin-1", "replace"))
            if name and name not in out:
                payload = body[i + head_len:i + head_len + fsize]
                if ver_major in (3, 4):
                    # frame-format flags (2nd flag byte): compressed/
                    # encrypted frames can't be text-decoded — skip;
                    # grouping adds 1 id byte, v2.4 DLI adds 4 size
                    # bytes, v2.4 per-frame unsync re-stuffs FF 00
                    ff = body[i + id_len + size_len + 1]
                    if ver_major == 3:
                        skip_frame = ff & 0xC0  # compression | encryption
                        if ff & 0x20:  # grouping identity byte
                            payload = payload[1:]
                    else:
                        skip_frame = ff & 0x0C  # compression | encryption
                        if ff & 0x40:  # grouping
                            payload = payload[1:]
                        if ff & 0x01:  # data-length indicator
                            payload = payload[4:]
                        if ff & 0x02:  # per-frame unsynchronisation
                            payload = payload.replace(b"\xff\x00", b"\xff")
                    if skip_frame:
                        payload = None
                val = _decode_text(payload) if payload else None
                if val is not None:
                    out[name] = val
            i += head_len + fsize
        return out
    except Exception as e:  # hostile input: inventory, don't fail tasks
        return {"error": f"{type(e).__name__}: {e}"}


# ---------------------------------------------------------------- writer

def build_id3v23(**fields: str) -> bytes:
    """Serialize a minimal ID3v2.3 tag from friendly field names
    (title/artist/album/year/genre/track). Deterministic (fields
    sorted by frame id); utf-8-unsafe values fall back to utf-16."""
    rev = {}
    for fid, name in _TEXT_FRAMES.items():
        if fid != "TDRC":  # v2.3 uses TYER
            rev.setdefault(name, fid)
    frames = b""
    for name in sorted(fields, key=lambda n: rev.get(n, "")):
        fid = rev.get(name)
        if fid is None:
            raise ValueError(f"unknown ID3 field {name!r}")
        val = str(fields[name])
        try:
            payload = b"\x00" + val.encode("latin-1") + b"\x00"
        except UnicodeEncodeError:
            payload = b"\x01" + val.encode("utf-16") + b"\x00\x00"
        frames += fid.encode() + struct.pack(">I", len(payload)) + b"\x00\x00"
        frames += payload
    size = len(frames)
    ss = bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3\x03\x00\x00" + ss + frames
