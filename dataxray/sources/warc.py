"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl container.

The north-star input is "Common-Crawl-style web pages"; the native wire
format for that corpus is WARC: concatenated records, each a header block
(`WARC/1.0` + RFC-822-style fields + blank line) followed by
`Content-Length` bytes of payload. Crawl `response` records carry a full
HTTP response whose body is the page HTML. Files ship either plain or as
per-record gzip members concatenated into one `.warc.gz` (the Common
Crawl layout — member boundaries are the only split points, so the
standard parallelism is ONE TASK PER FILE, ~1 GiB each in the real
corpus; a 100 TB crawl is ~100k files = 100k independent decode tasks).

``read_warc(paths)`` returns a Dataset of (url, warc_ts, html, warc_type)
rows — exactly the engine's web-page WAL payload shape, ready for
html_to_text / replay. Parsing is stdlib-only (gzip + byte scanning);
per-record Python iteration is the honest shape for a byte-protocol
decode stage (same contract as the multimodal decoders: state-free,
C-speed find/slice inner loop, parallel across files).

Reference analog: DataX's unstructured file readers
(`plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java`)
hand each file to one Task and stream records; `warcreader` plugs into
the same CLI job surface here.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout) — the
    gzip module consumes multi-member streams natively."""
    if not data.startswith(_GZ_MAGIC):
        return data
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        while True:
            chunk = gz.read(1 << 22)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the WARC/1.x version line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
    return headers


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP response block (after the header section); a block
    that doesn't look like HTTP is returned whole (warc_type=resource)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(_CRLF2)
    return payload[sep + 4:] if sep >= 0 else b""


def _parse_ts(s: str | None):
    if not s:
        return None
    try:  # WARC-Date is ISO-8601 UTC, e.g. 2026-08-18T10:00:00Z
        return datetime.fromisoformat(s.replace("Z", "+00:00")) \
            .astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def parse_warc_bytes(data: bytes,
                     keep_types: tuple[str, ...] = ("response",)) -> pa.Table:
    """One WARC file's records as (url, warc_ts, html, warc_type).

    ``keep_types`` filters on WARC-Type (crawls interleave request /
    response / metadata records; only responses carry page HTML).
    """
    data = _maybe_gunzip(data)
    urls: list[str | None] = []
    tss: list = []
    bodies: list[bytes] = []
    types: list[str] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"malformed WARC: expected record header at byte {pos}")
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError("malformed WARC: unterminated header block")
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("malformed WARC: missing Content-Length")
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        pos = body_start + length
        wtype = headers.get("warc-type", "")
        if wtype in keep_types:
            urls.append(headers.get("warc-target-uri"))
            tss.append(_parse_ts(headers.get("warc-date")))
            bodies.append(_http_body(payload))
            types.append(wtype)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(bodies, pa.large_binary()),
        "warc_type": pa.array(types, pa.string()),
    })


def read_warc(paths: list[str] | str,
              keep_types: tuple[str, ...] = ("response",),
              filesystem=None):
    """Dataset of (url, warc_ts, html, warc_type) over WARC file(s).

    One decode task per file (gzip members make files the only split
    unit, as in the real Common Crawl corpus); downstream stages see
    ordinary Arrow batches and stream as usual.
    """
    import ray.data

    ds = ray.data.read_binary_files(paths, filesystem=filesystem)
    return ds.map_batches(
        lambda t: pa.concat_tables(
            [parse_warc_bytes(b.as_py() if hasattr(b, "as_py") else b,
                              keep_types)
             for b in t["bytes"]]),
        batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# writer (tests / fixtures / export)
# ---------------------------------------------------------------------------


def build_warc_bytes(rows: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize (url, warc_ts, html) dicts into a WARC byte stream —
    response records wrapping a minimal HTTP/1.1 200. With
    ``gzip_members`` each record is its own gzip member (.warc.gz
    layout). Deterministic: byte output is a pure function of the rows."""
    out = io.BytesIO()
    for r in rows:
        html = r["html"] if isinstance(r["html"], bytes) \
            else str(r["html"]).encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode() + html)
        ts = r["warc_ts"]
        ts_s = (ts if isinstance(ts, str)
                else ts.strftime("%Y-%m-%dT%H:%M:%SZ"))
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               + f"WARC-Target-URI: {r['url']}\r\n".encode()
               + f"WARC-Date: {ts_s}\r\n".encode()
               + f"Content-Length: {len(http)}\r\n".encode()
               + b"\r\n" + http + b"\r\n\r\n")
        out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return out.getvalue()
