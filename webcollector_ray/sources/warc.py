"""WARC source: Common-Crawl-style web archives as a Dataset input.

Pure-stdlib ISO 28500 reader/writer. Common Crawl's layout is
supported exactly: a .warc.gz file is a sequence of INDEPENDENT gzip
members, one per record (so byte-range fetches can decompress a single
record); plain .warc is the concatenated record stream. `response`
records carry a full HTTP/1.x message in the block; `read_warc` parses
it and emits one row per response with the engine's page columns
(url, warc_ts, code, content_type, html) — the input_hint table shape.

Scale shape: one read task per WARC file (the natural CC unit, ~1 GB
gz); the parse generator yields a bounded Arrow table every
`rows_per_block` records, so a file never materializes as one giant
block and the streaming executor can pipeline downstream stages while
a file is still being read. No Ray state lives here — tasks are pure
path -> tables."""

from __future__ import annotations

import gzip
import io
from datetime import datetime
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

WARC_VERSION = b"WARC/1.0"

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("code", pa.int32()),
        ("location", pa.string()),  # HTTP Location header (redirects)
        ("content_type", pa.string()),
        ("html", pa.binary()),
    ]
)


# ------------------------------------------------------------ records


def _read_headers(stream) -> Optional[dict]:
    """Read a CRLF-terminated header block; None at clean EOF."""
    line = stream.readline()
    # tolerate record-separator blank lines before the version line
    while line in (b"\r\n", b"\n"):
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict = {}
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        if line[:1] in (b" ", b"\t") and headers:
            # obs-fold continuation
            headers[last] += " " + line.strip().decode("latin-1")  # noqa: F821
            continue
        name, _, value = line.decode("latin-1").partition(":")
        last = name.strip().lower()
        headers[last] = value.strip()
    return headers


def iter_warc_records(stream) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, block_bytes) from a raw WARC byte stream.
    Handles both plain streams and anything file-like; gzip layering is
    the caller's job (see open_warc)."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        length = int(headers.get("content-length", 0))
        block = stream.read(length)
        if len(block) < length:
            raise ValueError("truncated WARC block")
        yield headers, block


def open_warc(path: str):
    """Open .warc or .warc.gz for record iteration. gzip's stdlib
    reader concatenates the per-record members transparently."""
    raw = open(path, "rb")
    head = raw.read(2)
    raw.seek(0)
    if head == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw)
    return raw


# ----------------------------------------------------- HTTP payloads


def parse_http_response(block: bytes) -> Tuple[int, dict, bytes]:
    """Split an HTTP/1.x response message into (status, headers, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        head, body = block[:sep], block[sep + 2 :]
    else:
        head, body = block[:sep], block[sep + 4 :]
    lines = head.split(b"\n")
    status_line = lines[0].strip().decode("latin-1")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP response: {status_line[:40]!r}")
    status = int(parts[1])
    headers: dict = {}
    for ln in lines[1:]:
        name, _, value = ln.decode("latin-1").partition(":")
        if _:
            headers[name.strip().lower()] = value.strip()
    return status, headers, body


def _parse_warc_ts(s: str) -> Optional[datetime]:
    """WARC-Date is always Zulu; returned naive-UTC to match the
    tz-less timestamp("us") page column."""
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def iter_response_rows(path: str) -> Iterator[dict]:
    """One dict per `response` record: url / warc_ts / code /
    content_type / html. Non-response records (warcinfo, request,
    metadata) are skipped, like every CC processing pipeline does."""
    with open_warc(path) as f:
        for headers, block in iter_warc_records(f):
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            try:
                status, http_headers, body = parse_http_response(block)
            except ValueError:
                continue  # damaged payload: skip the record, not the file
            yield {
                "url": url,
                "warc_ts": _parse_warc_ts(headers.get("warc-date", "")),
                "code": status,
                "location": http_headers.get("location"),
                "content_type": http_headers.get("content-type"),
                "html": body,
            }


# -------------------------------------------------------- Ray Dataset


def _rows_to_table(rows: List[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.timestamp("us")
            ),
            "code": pa.array([r["code"] for r in rows], pa.int32()),
            "location": pa.array(
                [r["location"] for r in rows], pa.string()
            ),
            "content_type": pa.array(
                [r["content_type"] for r in rows], pa.string()
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        },
        schema=PAGE_SCHEMA,
    )


def read_warc(paths, *, rows_per_block: int = 256):
    """ray.data Dataset of response pages from WARC file(s).

    One task per file; the task is a GENERATOR that emits a table every
    `rows_per_block` records so large archives stream through the
    object store in bounded blocks instead of one block per file.
    Tune rows_per_block down for payload-heavy archives (pages are
    ~tens of KB; 256 rows ~ a few MB per block)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def parse_file(batch: pa.Table) -> Iterator[pa.Table]:
        for path in batch["path"].to_pylist():
            rows: List[dict] = []
            for row in iter_response_rows(path):
                rows.append(row)
                if len(rows) >= rows_per_block:
                    yield _rows_to_table(rows)
                    rows = []
            if rows:
                yield _rows_to_table(rows)

    files = rd.from_items([{"path": p} for p in paths]).repartition(
        len(paths)
    )
    return files.map_batches(
        parse_file, batch_format="pyarrow", batch_size=None
    )


# ------------------------------------------------------------ writer


def write_warc_record(
    out,
    *,
    warc_type: str,
    headers: dict,
    block: bytes,
) -> None:
    buf = io.BytesIO()
    buf.write(WARC_VERSION + b"\r\n")
    buf.write(f"WARC-Type: {warc_type}\r\n".encode("latin-1"))
    for k, v in headers.items():
        buf.write(f"{k}: {v}\r\n".encode("latin-1"))
    buf.write(f"Content-Length: {len(block)}\r\n".encode("latin-1"))
    buf.write(b"\r\n")
    buf.write(block)
    buf.write(b"\r\n\r\n")
    out.write(buf.getvalue())


def write_response_warc(
    path: str,
    pages: List[dict],
    *,
    compress: Optional[bool] = None,
) -> None:
    """Write pages (url / warc_ts / code / content_type / html dicts)
    as WARC response records. compress=None infers from the extension;
    True writes one gzip member PER RECORD (the Common Crawl layout)."""
    if compress is None:
        compress = path.endswith(".gz")
    with open(path, "wb") as raw:
        for p in pages:
            ctype = p.get("content_type") or "text/html"
            body = p.get("html") or b""
            loc = p.get("location")
            loc_hdr = f"Location: {loc}\r\n" if loc else ""
            http = (
                f"HTTP/1.1 {p.get('code', 200)} OK\r\n"
                f"Content-Type: {ctype}\r\n{loc_hdr}"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("latin-1") + body
            ts = p.get("warc_ts")
            if isinstance(ts, datetime):
                ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            else:
                ts_s = ts or "2020-01-01T00:00:00Z"
            rec = io.BytesIO()
            write_warc_record(
                rec,
                warc_type="response",
                headers={
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": ts_s,
                    "Content-Type": "application/http; msgtype=response",
                },
                block=http,
            )
            data = rec.getvalue()
            if compress:
                raw.write(gzip.compress(data, mtime=0))
            else:
                raw.write(data)
