"""Pure-Python WARC (ISO 28500) reader/writer — the web-archive
container a web-scale training pipeline actually ingests (Common Crawl
ships WARC). Records are
``WARC/1.0`` + CRLF header lines + blank line + Content-Length payload
block + CRLF CRLF; files are either plain concatenated records or (the
Common Crawl convention) one gzip member per record, concatenated.

This module parses both forms and extracts HTTP-response payload bodies,
so WARC → (url, html/pdf bytes) → the engine's existing
format-sniffing extraction seam (sources.extract_fetched_documents) is
one narrow pipeline. The writer exists for deterministic fixtures and
as an archive sink.

Reference analogue: none (the reference starts at a URL manifest,
main.py:29-42); WARC is part of this engine's training-data extension
surface.
"""

from __future__ import annotations

import zlib
from typing import Any

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → concatenated plaintext (Common Crawl
    writes one member per record)."""
    out = []
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        rest = d.unused_data
    if rest.strip(b"\r\n\x00"):
        raise ValueError("trailing garbage after gzip members")
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict[str, Any]]:
    """WARC bytes (plain or member-gzipped) → list of records:
    {warc_type, uri, date, record_id, content_type, block}. Raises
    ValueError on malformed input (bad version line, missing
    Content-Length, truncated block)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict[str, Any]] = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            key, sep, val = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[key.strip().lower().decode("latin-1")] = (
                val.strip().decode("latin-1")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/bad Content-Length") from e
        block = data[pos:pos + length]
        if len(block) != length:
            raise ValueError("truncated record block")
        pos += length
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "record_id": headers.get("warc-record-id", ""),
                "content_type": headers.get("content-type", ""),
                "block": block,
            }
        )
    return records


def http_response_body(block: bytes) -> tuple[bytes, str]:
    """HTTP-response record block → (body bytes, Content-Type header).
    Raises ValueError when the block is not an HTTP response."""
    if not block.startswith(b"HTTP/"):
        raise ValueError("record block is not an HTTP response")
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("HTTP response without header terminator")
    ctype = ""
    for line in head.split(_CRLF)[1:]:
        key, s, val = line.partition(b":")
        if s and key.strip().lower() == b"content-type":
            ctype = val.strip().decode("latin-1")
    return body, ctype


def response_documents(data: bytes) -> list[dict[str, Any]]:
    """WARC bytes → the fetchable documents inside: one dict
    {url, content_type, payload, seq} per well-formed ``response``
    record (non-response records and non-HTTP blocks are skipped, as a
    crawl processor does). ``seq`` is the record's ordinal among ALL
    records in the archive — the stable key both the whole-file and the
    CDX ranged-read ingestion paths derive doc_ids from, so the two
    paths mint identical ids."""
    docs = []
    for seq, rec in enumerate(parse_warc(data)):
        if rec["warc_type"] != "response":
            continue
        try:
            body, ctype = http_response_body(rec["block"])
        except ValueError:
            continue
        docs.append({"url": rec["uri"], "content_type": ctype,
                     "payload": body, "seq": seq})
    return docs


def cdx_index(data: bytes) -> list[dict[str, Any]]:
    """CDX-style offset index of a WARC file: one row per record with
    {offset, length, warc_type, uri} — for the member-gzipped layout,
    offset/length address the record's own gzip MEMBER (exactly what
    Common Crawl's CDX publishes), so a reader can fetch and decompress
    one record without touching the rest of the archive. For plain
    files, offsets address the record bytes directly. This is the
    production lever for splitting archives bigger than one task."""
    out: list[dict[str, Any]] = []
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data) and data[pos:pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                plain = d.decompress(data[pos:])
            except zlib.error as e:
                raise ValueError(f"corrupt gzip member: {e}") from e
            if not d.eof:
                raise ValueError("truncated gzip member")
            consumed = len(data) - pos - len(d.unused_data)
            # record_ix disambiguates the (rare) whole-file-gzip layout
            # where one member holds many records and every row shares
            # the member's byte range
            for ix, rec in enumerate(parse_warc(plain)):
                out.append({"offset": pos, "length": consumed,
                            "record_ix": ix,
                            "warc_type": rec["warc_type"], "uri": rec["uri"]})
            pos += consumed
        for seq, row in enumerate(out):
            row["record_seq"] = seq
        return out
    # plain layout: one header walk tracking byte offsets
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        start = pos
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hpos = eol + 2
        headers: dict[str, str] = {}
        while True:
            e2 = data.find(_CRLF, hpos)
            if e2 < 0:
                raise ValueError("unterminated WARC header block")
            line = data[hpos:e2]
            hpos = e2 + 2
            if not line:
                break
            key, sep, val = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[key.strip().lower().decode("latin-1")] = (
                val.strip().decode("latin-1")
            )
        try:
            body_len = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/bad Content-Length") from e
        end = hpos + body_len
        if end > n:
            raise ValueError("truncated record block")
        # the two terminating CRLFs are part of the record (ISO 28500 §4)
        while end - (hpos + body_len) < 4 and data[end:end + 2] == _CRLF:
            end += 2
        out.append({"offset": start, "length": end - start,
                    "record_ix": 0,
                    "warc_type": headers.get("warc-type", ""),
                    "uri": headers.get("warc-target-uri", "")})
        pos = end
    for seq, row in enumerate(out):
        row["record_seq"] = seq
    return out


def _parse_header_block(head: bytes) -> dict[str, str]:
    """CRLF-joined WARC header block (version line included, no blank
    terminator) → lowercase header dict. Raises ValueError on a missing
    version line or malformed header line."""
    lines = head.split(_CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError("expected WARC version line")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        key, sep, val = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed WARC header line {line!r}")
        headers[key.strip().lower().decode("latin-1")] = (
            val.strip().decode("latin-1")
        )
    return headers


_MAX_HEADER_BLOCK = 1 << 20  # sanity cap: no real WARC header nears 1 MiB


def _iter_stream_records(chunks) -> "Any":
    """Walk WARC records over an iterator of byte chunks, holding at
    most one header block + one chunk in memory — payload bytes are
    DISCARDED as they stream past, which is what lets the CDX index
    pass run in bounded memory over archives of any size. Yields
    {warc_type, uri} per record; raises ValueError exactly where
    parse_warc would (bad version line, missing Content-Length,
    truncated block)."""
    it = iter(chunks)
    buf = bytearray()
    eof = False

    def fill() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            buf.extend(next(it))
            return True
        except StopIteration:
            eof = True
            return False

    while True:
        # skip inter-record CRLFs
        while True:
            while len(buf) < 2 and fill():
                pass
            if buf[:2] == _CRLF:
                del buf[:2]
            else:
                break
        if not buf:
            if not fill():
                return
            continue
        # accumulate the header block up to its blank-line terminator
        while True:
            term = buf.find(b"\r\n\r\n")
            if term >= 0:
                break
            if len(buf) > _MAX_HEADER_BLOCK:
                raise ValueError("WARC header block too large")
            if not fill():
                raise ValueError("unterminated WARC header block")
        headers = _parse_header_block(bytes(buf[:term]))
        del buf[:term + 4]
        try:
            remaining = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/bad Content-Length") from e
        # discard the payload without accumulating it
        while remaining > 0:
            if not buf and not fill():
                raise ValueError("truncated record block")
            take = min(remaining, len(buf))
            del buf[:take]
            remaining -= take
        yield {
            "warc_type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri", ""),
        }


def cdx_index_stream(f, chunk_size: int = 1 << 20):
    """Streaming CDX index over a SEEKABLE binary file object: yields
    the same rows as ``cdx_index`` (offset, length, record_ix,
    record_seq, warc_type, uri) while never holding more than one
    compressed chunk + one decompression window in memory — gzip
    members decompress incrementally and plain records are walked with
    seeks, so the index pass itself honours the no-whole-archive-in-one-
    task rule that the ranged-read fetch stage relies on."""
    head2 = f.read(2)
    f.seek(0)
    seq = 0
    if head2 == b"\x1f\x8b":
        member_off = 0   # absolute compressed offset of current member
        fed_abs = 0      # absolute offset of compressed bytes handed out
        pending = b""    # compressed bytes read past the previous member
        while True:
            if not pending:
                pending = f.read(chunk_size)
                fed_abs += len(pending)
            if not pending:
                return  # clean EOF at a member boundary
            if pending[:2] != b"\x1f\x8b":
                # not another member: tolerate trailing CRLF/NUL padding,
                # reject real bytes (parity with _gunzip_members) —
                # drained chunk-by-chunk, never accumulated
                tail = pending
                while True:
                    if tail.strip(b"\r\n\x00"):
                        raise ValueError("trailing garbage after gzip members")
                    tail = f.read(chunk_size)
                    if not tail:
                        return
            d = zlib.decompressobj(wbits=31)

            def plain_chunks():
                nonlocal pending, fed_abs
                while not d.eof:
                    if pending:
                        data, pending = pending, b""
                    else:
                        data = f.read(chunk_size)
                        if not data:
                            raise ValueError("truncated gzip member")
                        fed_abs += len(data)
                    try:
                        out = d.decompress(data)
                    except zlib.error as e:
                        raise ValueError(f"corrupt gzip member: {e}") from e
                    if out:
                        yield out

            recs = list(_iter_stream_records(plain_chunks()))
            if not d.eof:
                # zero records AND member never finished (e.g. empty file
                # tail) — drain to detect truncation
                raise ValueError("truncated gzip member")
            pending = d.unused_data
            member_end = fed_abs - len(pending)
            for ix, rec in enumerate(recs):
                yield {"offset": member_off, "length": member_end - member_off,
                       "record_ix": ix, "record_seq": seq,
                       "warc_type": rec["warc_type"], "uri": rec["uri"]}
                seq += 1
            member_off = member_end
    else:
        f.seek(0, 2)
        size = f.tell()
        pos = 0
        while pos < size:
            f.seek(pos)
            while f.read(2) == _CRLF:
                pos += 2
            if pos >= size:
                break
            f.seek(pos)
            head = b""
            while True:
                chunk = f.read(chunk_size)
                if not chunk:
                    raise ValueError("unterminated WARC header block")
                head += chunk
                term = head.find(b"\r\n\r\n")
                if term >= 0:
                    break
                if len(head) > _MAX_HEADER_BLOCK:
                    raise ValueError("WARC header block too large")
            if not head.startswith(b"WARC/"):
                raise ValueError(f"expected WARC version line at offset {pos}")
            headers = _parse_header_block(head[:term])
            try:
                body_len = int(headers["content-length"])
            except (KeyError, ValueError) as e:
                raise ValueError("missing/bad Content-Length") from e
            end = pos + term + 4 + body_len
            if end > size:
                raise ValueError("truncated record block")
            # the two terminating CRLFs are part of the record (ISO 28500 §4)
            f.seek(end)
            tail = f.read(4)
            add = 0
            while add < 4 and tail[add:add + 2] == _CRLF:
                add += 2
            end += add
            yield {"offset": pos, "length": end - pos, "record_ix": 0,
                   "record_seq": seq,
                   "warc_type": headers.get("warc-type", ""),
                   "uri": headers.get("warc-target-uri", "")}
            seq += 1
            pos = end


def read_record_at(data: bytes, offset: int, length: int,
                   record_ix: int = 0) -> dict[str, Any]:
    """Random access: fetch ONE record via its cdx_index row without
    parsing the rest of the archive (the byte range is all a remote
    reader needs to request). ``record_ix`` selects within the range for
    the whole-file-gzip layout where one member holds many records."""
    chunk = data[offset:offset + length]
    recs = parse_warc(chunk)
    if record_ix >= len(recs):
        raise ValueError("no record at offset")
    return recs[record_ix]


def build_warc(records: list[dict[str, Any]], gzip_members: bool = False) -> bytes:
    """Deterministic WARC writer (fixtures + archive sink). ``records``:
    dicts with warc_type, uri, block (bytes) and optional date/
    content_type. gzip_members=True emits the Common Crawl one-member-
    per-record layout."""
    out = []
    for i, rec in enumerate(records):
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["warc_type"].encode(),
            b"WARC-Record-ID: <urn:uuid:%08d>" % i,
            b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode(),
        ]
        if rec.get("uri"):
            headers.append(b"WARC-Target-URI: " + rec["uri"].encode())
        if rec.get("content_type"):
            headers.append(b"Content-Type: " + rec["content_type"].encode())
        block = rec["block"]
        headers.append(b"Content-Length: %d" % len(block))
        raw = _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def http_response_block(body: bytes, content_type: str,
                        status: str = "200 OK") -> bytes:
    """Wrap a payload as the HTTP-response block of a WARC response
    record (fixture helper)."""
    return (
        b"HTTP/1.1 " + status.encode() + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: %d" % len(body) + _CRLF + _CRLF
        + body
    )
