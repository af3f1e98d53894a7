"""WARC source (ISO 28500 / Common Crawl layout): record framing,
per-record gzip members, HTTP payload parse, and the distributed
read_warc generator source."""

import gzip
import io
from datetime import datetime

import pytest

from webcollector_ray.sources.warc import (
    iter_response_rows,
    iter_warc_records,
    open_warc,
    parse_http_response,
    read_warc,
    write_response_warc,
    write_warc_record,
)


def _pages(n=6):
    return [
        {
            "url": f"http://site{i % 2}.test/p{i}.html",
            "code": 200 if i % 3 else 301,
            "content_type": "text/html; charset=utf-8",
            "html": f"<html><body>page {i} body é中</body></html>".encode(),
            "warc_ts": datetime(2020, 1, 1, 0, 0, i),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_round_trip(tmp_path, suffix):
    pages = _pages()
    path = str(tmp_path / f"t{suffix}")
    write_response_warc(path, pages)
    rows = list(iter_response_rows(path))
    assert len(rows) == len(pages)
    for row, page in zip(rows, pages):
        assert row["url"] == page["url"]
        assert row["code"] == page["code"]
        assert row["html"] == page["html"]
        assert row["warc_ts"] == page["warc_ts"]
        assert row["content_type"].startswith("text/html")


def test_gz_is_per_record_members(tmp_path):
    # Common Crawl requires one gzip member per record so single
    # records can be range-fetched; stdlib gzip reads them all
    path = str(tmp_path / "cc.warc.gz")
    write_response_warc(path, _pages(4))
    data = open(path, "rb").read()
    assert data.count(b"\x1f\x8b\x08") >= 4


def test_non_response_records_skipped(tmp_path):
    path = str(tmp_path / "mixed.warc")
    with open(path, "wb") as f:
        write_warc_record(
            f, warc_type="warcinfo",
            headers={"WARC-Date": "2020-01-01T00:00:00Z"},
            block=b"software: test",
        )
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi"
        write_warc_record(
            f, warc_type="response",
            headers={
                "WARC-Target-URI": "http://a.test/",
                "WARC-Date": "2020-01-01T00:00:01Z",
                "Content-Type": "application/http; msgtype=response",
            },
            block=body,
        )
        write_warc_record(
            f, warc_type="request",
            headers={"WARC-Target-URI": "http://a.test/"},
            block=b"GET / HTTP/1.1\r\n\r\n",
        )
    rows = list(iter_response_rows(path))
    assert [r["url"] for r in rows] == ["http://a.test/"]
    assert rows[0]["html"] == b"hi"
    # raw record iteration still sees all three
    with open_warc(path) as f:
        assert len(list(iter_warc_records(f))) == 3


def test_truncated_block_raises(tmp_path):
    path = str(tmp_path / "trunc.warc")
    write_response_warc(path, _pages(1))
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-20])
    with pytest.raises(ValueError, match="truncated"):
        with open_warc(path) as f:
            list(iter_warc_records(f))


def test_parse_http_response_variants():
    s, h, b = parse_http_response(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope"
    )
    assert (s, h["content-type"], b) == (404, "text/plain", b"nope")
    # LF-only framing also parses (lenient, like real CC payloads)
    s, _, b = parse_http_response(b"HTTP/1.0 200 OK\nX: y\n\nbody")
    assert (s, b) == (200, b"body")
    with pytest.raises(ValueError, match="HTTP"):
        parse_http_response(b"garbage\r\n\r\nx")


def test_read_warc_dataset(ray_session, tmp_path):
    pages = _pages(40)
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc")
    write_response_warc(p1, pages[:25])
    write_response_warc(p2, pages[25:])
    ds = read_warc([p1, p2], rows_per_block=8)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 40
    want = sorted(p["url"] for p in pages)
    assert df["url"].tolist() == want
    by_url = {p["url"]: p for p in pages}
    for _, row in df.iterrows():
        assert bytes(row["html"]) == by_url[row["url"]]["html"]


def test_location_header_round_trip(tmp_path):
    path = str(tmp_path / "redir.warc.gz")
    write_response_warc(path, [{
        "url": "http://a.test/old.html", "code": 301, "html": b"",
        "content_type": "text/html", "location": "/new.html",
        "warc_ts": datetime(2020, 1, 1),
    }])
    (row,) = iter_response_rows(path)
    assert row["code"] == 301 and row["location"] == "/new.html"


def test_crawl_from_warc_archive(ray_session, tmp_path):
    """Replaying a crawl from a Common-Crawl-style archive of the
    synthetic web must produce the same crawldb as crawling the live
    store: same keys, statuses, codes and redirect bookkeeping."""
    from datetime import datetime as dt

    import pyarrow as pa
    import ray

    from webcollector_ray.pipelines.crawler import RamCrawler
    from webcollector_ray.sources.pagestore import (
        BroadcastPageStore,
        SynthPageStore,
    )
    from webcollector_ray.synth import SynthSpec, page_row

    spec = SynthSpec(num_sites=2)
    pages = []
    for gid in range(spec.total_pages):
        row = page_row(spec, gid)
        pages.append({
            "url": row["url"],
            "code": row["code"],
            "location": row["location"],
            "content_type": row["content_type"],
            "html": row["html"],
            "warc_ts": dt.utcfromtimestamp(row["warc_ts"] / 1000.0),
        })
    archive = str(tmp_path / "web.warc.gz")
    write_response_warc(archive, pages)

    warc_tbl = pa.concat_tables(ray.get(read_warc(archive).to_arrow_refs()))
    regex = r"http://site[0-9]+\.test/(list|show|old|bad)-[0-9]+\.html"

    dbs = []
    for store in (BroadcastPageStore(warc_tbl), SynthPageStore(spec)):
        c = RamCrawler(store, deterministic_time=True)
        c.add_seed(spec.seeds())
        c.add_regex(regex)
        res = c.start(10)
        dbs.append(
            res.crawldb.to_pandas()
            .sort_values("key")[["key", "status", "code", "location"]]
            .reset_index(drop=True)
        )
    assert dbs[0].equals(dbs[1])


def test_index_and_ranged_fetch(tmp_path):
    from webcollector_ray.sources.warc import fetch_warc_record, index_warc

    pages = _pages(10)
    for suffix in (".warc", ".warc.gz"):
        path = str(tmp_path / f"idx{suffix}")
        write_response_warc(path, pages)
        entries = list(index_warc(path))
        assert [e["url"] for e in entries] == [p["url"] for p in pages]
        # every record fetches independently through its byte range
        for e, p in zip(entries, pages):
            row = fetch_warc_record(e["path"], e["offset"], e["length"])
            assert row["url"] == p["url"]
            assert row["html"] == p["html"]
            assert row["code"] == p["code"]
        # ranges tile the file without overlap
        for a, b in zip(entries, entries[1:]):
            assert a["offset"] + a["length"] <= b["offset"] + 1


def test_gzip_member_walk_ignores_embedded_magic(tmp_path):
    from webcollector_ray.sources.warc import _iter_gzip_members

    # payload containing the gzip magic must not split the member walk
    pages = [{
        "url": "http://a.test/x.html", "code": 200,
        "content_type": "application/octet-stream",
        "html": b"\x1f\x8b\x08" * 100, "warc_ts": datetime(2020, 1, 1),
    }] + _pages(3)
    path = str(tmp_path / "magic.warc.gz")
    write_response_warc(path, pages)
    with open(path, "rb") as f:
        members = list(_iter_gzip_members(f))
    assert len(members) == 4


def test_crawl_from_warc_cdx_store(ray_session, tmp_path):
    """The random-access WARC store (CDX + ranged reads, no page copy)
    drives the crawler to the same crawldb as the live synthetic
    store."""
    from datetime import datetime as dt

    from webcollector_ray.pipelines.crawler import RamCrawler
    from webcollector_ray.sources.pagestore import SynthPageStore
    from webcollector_ray.sources.warc import build_warc_cdx
    from webcollector_ray.synth import SynthSpec, page_row

    spec = SynthSpec(num_sites=2)
    pages = []
    for gid in range(spec.total_pages):
        row = page_row(spec, gid)
        pages.append({
            "url": row["url"], "code": row["code"],
            "location": row["location"],
            "content_type": row["content_type"], "html": row["html"],
            "warc_ts": dt.utcfromtimestamp(row["warc_ts"] / 1000.0),
        })
    # two shards to exercise multi-file CDX
    a = str(tmp_path / "a.warc.gz")
    b = str(tmp_path / "b.warc")
    write_response_warc(a, pages[::2])
    write_response_warc(b, pages[1::2])
    store = build_warc_cdx([a, b], str(tmp_path / "cdx"), num_buckets=4)

    regex = r"http://site[0-9]+\.test/(list|show|old|bad)-[0-9]+\.html"
    dbs = []
    for s in (store, SynthPageStore(spec)):
        c = RamCrawler(s, deterministic_time=True)
        c.add_seed(spec.seeds())
        c.add_regex(regex)
        res = c.start(10)
        dbs.append(
            res.crawldb.to_pandas()
            .sort_values("key")[["key", "status", "code", "location"]]
            .reset_index(drop=True)
        )
    assert dbs[0].equals(dbs[1])
