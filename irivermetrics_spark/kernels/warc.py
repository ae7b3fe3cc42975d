"""From-scratch WARC (Web ARChive, ISO 28500) reader/writer kernel —
the container format web crawls actually arrive in (Common Crawl ships
~64k ``*.warc.gz`` files per crawl). Pure Python + stdlib zlib, no
Spark imports: the Spark plumbing lives in operators/warcingest.py.

Format notes (public spec, reimplemented):

- A WARC file is a sequence of records. Each record: a version line
  (``WARC/1.0`` or ``WARC/1.1``), CRLF-terminated ``Name: value``
  header lines (continuation lines start with SP/HT), a blank line,
  exactly ``Content-Length`` payload bytes, then CRLF CRLF. Length
  framing means payloads may legally CONTAIN ``WARC/1.0`` — the parser
  never scans for magic inside a record.
- Compressed WARCs gzip each record as its OWN member and concatenate
  the members, so records can be located independently; readers must
  loop on ``unused_data``. (That per-member framing is also why a
  plain byte-range split cannot start mid-file without an external
  index — the Spark operator documents file-grain parallelism.)
- ``response`` records hold the raw HTTP response bytes, including
  status line, headers, and possibly chunked transfer encoding.

Robustness contract: parse functions never raise on malformed input —
they yield what they could parse plus an ``error`` marker, mirroring
the codec quarantine contract. Decompression is bomb-guarded.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

CRLF = b"\r\n"
_VERSION_RE = re.compile(rb"^WARC/(\d+\.\d+)$")

# per-member inflate cap (a crawl record is ~MBs; 256 MB is a bomb)
MEMBER_CAP = 256 * 1024 * 1024


class WarcError(ValueError):
    pass


def iter_gzip_members(data: bytes, cap: int = MEMBER_CAP) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one member at
    a time. Raises WarcError on corrupt/truncated/oversized members
    (callers convert to a dead-letter row)."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:], cap + 1)
        except zlib.error as e:
            raise WarcError(f"gzip member at {pos}: {e}") from None
        if len(out) > cap:
            raise WarcError(f"gzip member at {pos} exceeds {cap} bytes")
        if not d.eof:
            raise WarcError(f"gzip member at {pos} truncated")
        yield out
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # zero-byte member would loop forever
            raise WarcError(f"gzip member at {pos} consumed no input")
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    """CRLF header block -> dict (names lowercased, last wins,
    continuation lines folded with a single space)."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue  # tolerate stray junk lines
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


_INCOMPLETE = "incomplete"


def _try_parse_one(buf: bytes, pos: int, offset_base: int):
    """Attempt to parse one record at ``pos``. Returns
    (record_dict_or_None, new_pos, state) where state is None (parsed),
    ``_INCOMPLETE`` (need more bytes — only meaningful mid-stream) or
    an error message (malformed, stop)."""
    n = len(buf)
    while pos < n and buf[pos : pos + 2] == CRLF:  # inter-record padding
        pos += 2
    if pos >= n:
        return None, pos, _INCOMPLETE
    start = pos
    eol = buf.find(CRLF, pos)
    if eol < 0:
        if n - pos > 64:  # a version line is short; long tail = junk
            return None, pos, f"no WARC version line at offset {offset_base + start}"
        return None, pos, _INCOMPLETE
    if not _VERSION_RE.match(buf[pos:eol]):
        return None, pos, f"no WARC version line at offset {offset_base + start}"
    hdr_end = buf.find(CRLF + CRLF, eol)
    if hdr_end < 0:
        if n - eol > 64 * 1024:  # header blocks are small
            return None, pos, f"unterminated header block at offset {offset_base + start}"
        return None, pos, _INCOMPLETE
    headers = _parse_headers(buf[eol + 2 : hdr_end])
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None, pos, f"bad Content-Length at offset {offset_base + start}"
    if length < 0:
        return None, pos, f"bad Content-Length at offset {offset_base + start}"
    body_start = hdr_end + 4
    body_end = body_start + length
    if body_end > n:
        return None, pos, _INCOMPLETE
    rec = {"headers": headers, "payload": buf[body_start:body_end],
           "offset": offset_base + start, "error": None}
    return rec, body_end, None


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Parse an UNCOMPRESSED WARC byte stream. Yields dicts with
    ``headers`` (lowercased dict), ``payload`` (bytes), ``offset``
    (record start) and ``error`` (None, or a message on the final
    yielded stub when the stream desyncs — parsing stops there).
    Payloads are length-framed: a record body containing the literal
    bytes ``WARC/1.0`` never desyncs the parser."""
    pos = 0
    n = len(data)
    while pos < n:
        rec, pos, state = _try_parse_one(data, pos, 0)
        if rec is not None:
            yield rec
            continue
        if state == _INCOMPLETE:
            # end of a complete stream: leftover bytes = truncation,
            # pure CRLF padding tail = clean EOF
            if data[pos:].strip(b"\r\n"):
                yield {"headers": {}, "payload": b"", "offset": pos,
                       "error": f"truncated record at offset {pos}"}
            return
        yield {"headers": {}, "payload": b"", "offset": pos, "error": state}
        return


def iter_records(raw: bytes) -> Iterator[dict]:
    """Parse a WARC file's raw bytes, gzipped (member-per-record or
    whole-file) or plain. Never raises: container-level failures yield
    one error stub. Memory is bounded by the largest RECORD, not the
    file — complete records are drained from the inflate buffer as
    each gzip member lands."""
    if raw[:2] != b"\x1f\x8b":
        yield from parse_warc_records(raw)
        return
    buf = bytearray()
    consumed_total = 0
    gz_error = None
    members = iter_gzip_members(raw)
    while True:
        try:
            member = next(members)
        except StopIteration:
            break
        except WarcError as e:
            gz_error = str(e)
            break
        buf += member
        pos = 0
        # materialize the inflate buffer ONCE per gzip member: rebuilding
        # bytes(buf) inside the record loop re-copied the whole buffer per
        # parsed record — O(n_records x member_size) memcpy on whole-file-
        # gzipped WARCs, where one member inflates the entire file
        chunk = bytes(buf)
        while True:
            rec, pos, state = _try_parse_one(chunk, pos, consumed_total)
            if rec is not None:
                yield rec
                continue
            if state == _INCOMPLETE:
                break
            yield {"headers": {}, "payload": b"", "offset": consumed_total + pos,
                   "error": state}
            return
        del buf[:pos]
        consumed_total += pos
    # end of members: flush the tail
    for rec in parse_warc_records(bytes(buf)):
        rec["offset"] += consumed_total
        yield rec
    if gz_error is not None:
        yield {"headers": {}, "payload": b"", "offset": -1, "error": gz_error}


_STATUS_RE = re.compile(rb"^HTTP/\d\.\d[ \t]+(\d{3})")


def split_http_response(payload: bytes) -> tuple[int | None, dict[str, str], bytes, str | None]:
    """Split a raw HTTP response into (status, headers, body, error).
    Chunked transfer encoding is decoded; on any malformation the raw
    bytes after the header block are returned with an error note."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return None, {}, payload, "no HTTP header terminator"
    head = payload[:sep]
    body = payload[sep + 4 :]
    eol = head.find(CRLF)
    status_line = head if eol < 0 else head[:eol]
    m = _STATUS_RE.match(status_line)
    if not m:
        return None, {}, payload, "no HTTP status line"
    status = int(m.group(1))
    headers = _parse_headers(head[len(status_line) + 2 :] if eol >= 0 else b"")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        decoded, err = _dechunk(body)
        if err is None:
            return status, headers, decoded, None
        return status, headers, body, err
    return status, headers, body, None


def _dechunk(body: bytes) -> tuple[bytes, str | None]:
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(CRLF, pos)
        if eol < 0:
            return bytes(out), "truncated chunk size line"
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(out), f"bad chunk size {size_tok[:16]!r}"
        pos = eol + 2
        if size == 0:
            return bytes(out), None  # trailers ignored
        if pos + size > n:
            return bytes(out), "truncated chunk data"
        out += body[pos : pos + size]
        pos += size + 2  # chunk data CRLF


_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", re.IGNORECASE
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", re.IGNORECASE)


def detect_charset(body: bytes, content_type: str | None = None) -> str:
    """Charset sniff, in priority order: BOM, Content-Type header,
    HTML ``<meta charset>`` in the first 4 KB, strict-UTF-8 probe,
    latin-1 fallback (which never fails — every byte decodes)."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be"
    for source in (content_type or "",):
        m = _CT_CHARSET_RE.search(source)
        if m:
            cs = m.group(1).lower()
            if _codec_exists(cs):
                return cs
    m = _META_CHARSET_RE.search(body[:4096])
    if m:
        cs = m.group(1).decode("latin-1").lower()
        if _codec_exists(cs):
            return cs
    try:
        body.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def _codec_exists(name: str) -> bool:
    import codecs as _c

    try:
        _c.lookup(name)
        return True
    except LookupError:
        return False


def decode_text(body: bytes, content_type: str | None = None) -> tuple[str, str]:
    """(text, charset_used); decode errors are replaced, never raised."""
    cs = detect_charset(body, content_type)
    return body.decode(cs, "replace"), cs


# ---------------------------------------------------------------- writer

def build_record(warc_type: str, payload: bytes, *, target_uri: str | None = None,
                 date: str = "2020-01-01T00:00:00Z", record_id: str | None = None,
                 content_type: str = "application/octet-stream",
                 extra: dict[str, str] | None = None) -> bytes:
    """Serialize one WARC/1.0 record (used by the example/synth path;
    tests build their bytes independently)."""
    if record_id is None:
        # content digest, not Python hash(): hash() is salted per process,
        # which made synthesized WARC bytes differ across runs — the repo's
        # writers (tar/zip) are bit-stable and this one should match
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        for part in (warc_type, target_uri or "", date):
            h.update(part.encode("utf-8", "replace") + b"\x00")
        h.update(payload)
        record_id = f"<urn:uuid:{h.hexdigest()}>"
    rid = record_id
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode(),
             b"WARC-Date: " + date.encode(),
             b"WARC-Record-ID: " + rid.encode(),
             b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(payload)).encode()]
    if target_uri:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    for k, v in (extra or {}).items():
        lines.append(f"{k}: {v}".encode())
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def build_http_response(body: bytes, *, status: int = 200,
                        content_type: str = "text/html; charset=utf-8",
                        chunked: bool = False) -> bytes:
    """Serialize a raw HTTP/1.1 response payload for a response record."""
    if chunked:
        wire = b""
        for i in range(0, len(body), 11):  # odd size exercises the loop
            chunk = body[i : i + 11]
            wire += f"{len(chunk):x}".encode() + CRLF + chunk + CRLF
        wire += b"0" + CRLF + CRLF
        te = b"Transfer-Encoding: chunked" + CRLF
        cl = b""
    else:
        wire = body
        te = b""
        cl = b"Content-Length: " + str(len(body)).encode() + CRLF
    return (b"HTTP/1.1 " + str(status).encode() + b" OK" + CRLF
            + b"Content-Type: " + content_type.encode() + CRLF + te + cl
            + CRLF + wire)


def write_warc_gz(records: list[bytes]) -> bytes:
    """Concatenate records as per-record gzip members (the Common
    Crawl layout iter_gzip_members expects)."""
    import gzip

    return b"".join(gzip.compress(r) for r in records)
