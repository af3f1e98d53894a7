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
import json
import os
import zlib
from collections import OrderedDict
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


# ------------------------------------------- CDX index + random access
#
# Common Crawl pairs every .warc.gz with a CDX index (url -> file,
# member offset, member length) so a single record is one ranged read
# + one gzip-member decompress. The same shape here: build_warc_cdx
# writes a parquet CDX bucketed by md5(url) % B, and WarcPageStore
# serves the crawler's fetch lookups straight off the archive — the
# pages are NEVER copied into a second store, which at 100 TB archive
# scale is the difference between an index build and a full rewrite.


def _iter_gzip_members(f, chunk_size: int = 1 << 20):
    """Yield (offset, length, decompressed_bytes) per gzip MEMBER by
    walking the stream with zlib (the magic bytes can occur inside
    compressed data, so member boundaries must come from the
    decompressor, not a byte scan)."""
    offset = 0
    member_len = 0
    d = zlib.decompressobj(31)
    out = bytearray()
    pending = b""
    while True:
        data = pending or f.read(chunk_size)
        pending = b""
        if not data:
            if member_len:
                raise ValueError("truncated gzip member")
            return
        out += d.decompress(data)
        if d.eof:
            used = len(data) - len(d.unused_data)
            member_len += used
            yield offset, member_len, bytes(out)
            offset += member_len
            member_len = 0
            pending = d.unused_data
            d = zlib.decompressobj(31)
            out = bytearray()
        else:
            member_len += len(data)


def _record_url(data: bytes) -> Optional[str]:
    """Target URI of the record at the head of `data`, if it is a
    response record."""
    try:
        headers = _read_headers(io.BytesIO(data))
    except ValueError:
        return None
    if headers is None or headers.get("warc-type") != "response":
        return None
    return headers.get("warc-target-uri")


def index_warc(path: str) -> Iterator[dict]:
    """Yield {url, path, offset, length} for every response record —
    offsets into the FILE (gzip-member offsets for .warc.gz, raw byte
    offsets for plain .warc), so a fetch is seek + read + parse one
    record."""
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head == b"\x1f\x8b":
            for offset, length, data in _iter_gzip_members(f):
                url = _record_url(data)
                if url is not None:
                    yield {
                        "url": url, "path": path,
                        "offset": offset, "length": length,
                    }
            return
        while True:
            start = f.tell()
            headers = _read_headers(f)
            if headers is None:
                return
            length = int(headers.get("content-length", 0))
            block_start = f.tell()
            f.seek(block_start + length)
            # consume the record separator so tell() lands on the next
            # record (also the length we report includes it — fetch
            # re-parses with the same tolerance)
            while True:
                pos = f.tell()
                line = f.readline()
                if line in (b"\r\n", b"\n"):
                    continue
                f.seek(pos)
                break
            if headers.get("warc-type") == "response":
                url = headers.get("warc-target-uri")
                if url:
                    yield {
                        "url": url, "path": path,
                        "offset": start, "length": f.tell() - start,
                    }


def fetch_warc_record(path: str, offset: int, length: int) -> Optional[dict]:
    """Ranged read of ONE record; returns the response row dict
    (url/warc_ts/code/location/content_type/html) or None."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    for headers, block in iter_warc_records(io.BytesIO(data)):
        if headers.get("warc-type") != "response":
            continue
        try:
            status, http_headers, body = parse_http_response(block)
        except ValueError:
            return None
        return {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_ts(headers.get("warc-date", "")),
            "code": status,
            "location": http_headers.get("location"),
            "content_type": http_headers.get("content-type"),
            "html": body,
        }
    return None


_CDX_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("path", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def build_warc_cdx(paths, out_dir: str, num_buckets: int = 16) -> "WarcPageStore":
    """Index WARC file(s) into a bucketed parquet CDX (one index task
    per archive file, streaming; layout bucket=<i>/part-*.parquet like
    the bucketed page store) and return the random-access store."""
    import ray.data as rd

    from ..urls import url_hash64

    if isinstance(paths, str):
        paths = [paths]

    def index_files(batch: pa.Table) -> Iterator[pa.Table]:
        for p in batch["path"].to_pylist():
            rows = list(index_warc(p))
            if not rows:
                continue
            tbl = pa.table(
                {
                    "url": pa.array([r["url"] for r in rows], pa.string()),
                    "path": pa.array([r["path"] for r in rows], pa.string()),
                    "offset": pa.array(
                        [r["offset"] for r in rows], pa.int64()
                    ),
                    "length": pa.array(
                        [r["length"] for r in rows], pa.int64()
                    ),
                },
                schema=_CDX_SCHEMA,
            )
            buckets = pa.array(
                [url_hash64(u) % num_buckets for u in tbl["url"].to_pylist()],
                pa.int32(),
            )
            yield tbl.append_column("bucket", buckets)

    os.makedirs(out_dir, exist_ok=True)
    files = rd.from_items([{"path": p} for p in paths]).repartition(len(paths))
    files.map_batches(
        index_files, batch_format="pyarrow", batch_size=None
    ).write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "_cdx_meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)
    return WarcPageStore(out_dir)


class WarcPageStore:
    """Page store whose lookups resolve through the CDX into ranged
    reads of the original archives (kind 'warc' in PageStoreReader).
    handle() carries only the index directory — actors page in CDX
    buckets on demand and never hold archive bytes beyond one record."""

    def __init__(self, cdx_dir: str):
        self.cdx_dir = cdx_dir
        with open(os.path.join(cdx_dir, "_cdx_meta.json")) as f:
            self.num_buckets = json.load(f)["num_buckets"]

    def handle(self) -> dict:
        return {
            "kind": "warc",
            "cdx_dir": self.cdx_dir,
            "num_buckets": self.num_buckets,
        }


class CdxBucketLookup:
    """In-memory url -> (path, offset, length) map over one CDX bucket."""

    __slots__ = ("index",)

    def __init__(self, cdx_dir: str, bucket: int):
        import pyarrow.parquet as pq

        path = os.path.join(cdx_dir, f"bucket={bucket}")
        if os.path.isdir(path):
            t = pq.read_table(path)
            self.index = {
                u: (p, o, ln)
                for u, p, o, ln in zip(
                    t["url"].to_pylist(),
                    t["path"].to_pylist(),
                    t["offset"].to_pylist(),
                    t["length"].to_pylist(),
                )
            }
        else:
            self.index = {}

    def get(self, url: str) -> Optional[dict]:
        hit = self.index.get(url)
        if hit is None:
            return None
        return fetch_warc_record(*hit)


class WarcStoreReader:
    """Per-actor CDX reader with a small LRU of bucket indexes (same
    shape as the bucketed page store's reader)."""

    def __init__(self, cdx_dir: str, num_buckets: int,
                 cache_buckets: int = 8):
        self.cdx_dir = cdx_dir
        self.num_buckets = num_buckets
        self.cache_buckets = cache_buckets
        self._cache: "OrderedDict[int, CdxBucketLookup]" = OrderedDict()

    def get(self, url: str) -> Optional[dict]:
        from ..urls import url_hash64

        b = url_hash64(url) % self.num_buckets
        lk = self._cache.get(b)
        if lk is None:
            lk = CdxBucketLookup(self.cdx_dir, b)
            self._cache[b] = lk
            while len(self._cache) > self.cache_buckets:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(b)
        return lk.get(url)


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
