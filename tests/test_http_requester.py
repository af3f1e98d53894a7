"""Live-HTTP fetch backend (VERDICT r2 §missing.1 / §next.7): the
HttpRequester must reproduce OkHttpRequester semantics — no redirect
auto-follow, Location capture, timeouts, transport failure == no route
— through the exact same ExecuteStage._fetch contract the page stores
use, verified against a local HTTP server."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from webcollector_ray.net import HttpRequester, HttpPageStore, Proxies


PAGES = {
    "/ok.html": (200, "text/html", b"<html><body><a href='/next.html'>n</a></body></html>", None),
    "/next.html": (200, "text/html", b"<html><body>leaf</body></html>", None),
    "/redir": (301, "text/html", b"moved", "/ok.html"),
    "/teapot": (418, "text/plain", b"teapot", None),
    "/slow": (200, "text/html", b"slow", None),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/slow":
            time.sleep(1.5)
        if self.path == "/huge":
            # 1 MiB body, Content-Length declared, so a capped reader
            # must stop mid-stream rather than buffer it all
            body = b"x" * (1024 * 1024)
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path == "/dribble":
            # headers arrive instantly, then the body stalls — only a
            # per-read timeout (not a connect timeout) catches this
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", "10")
            self.end_headers()
            self.wfile.write(b"abc")
            self.wfile.flush()
            time.sleep(2.0)
            try:
                self.wfile.write(b"defghij")
            except OSError:
                pass
            return
        entry = PAGES.get(self.path)
        if entry is None:
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"not found")
            return
        code, ctype, body, loc = entry
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        if loc:
            self.send_header("Location", loc)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_requester_success(http_server):
    r = HttpRequester(timeout=3.0)
    row = r.get(f"{http_server}/ok.html")
    assert row["code"] == 200
    assert "text/html" in row["content_type"]
    assert b"/next.html" in row["html"]
    assert row["location"] is None


def test_requester_redirect_not_followed(http_server):
    row = HttpRequester(timeout=3.0).get(f"{http_server}/redir")
    assert row["code"] == 301
    assert row["location"] == "/ok.html"
    assert row["html"] == b"moved"


def test_requester_404_and_non_success(http_server):
    r = HttpRequester(timeout=3.0)
    assert r.get(f"{http_server}/nope.html")["code"] == 404
    assert r.get(f"{http_server}/teapot")["code"] == 418


def test_requester_timeout_and_refused(http_server):
    assert HttpRequester(timeout=0.2).get(f"{http_server}/slow") is None
    # a port nothing listens on -> refused -> no route
    assert HttpRequester(timeout=1.0).get("http://127.0.0.1:1/never") is None
    assert HttpRequester(timeout=1.0).get("ftp://h.test/x") is None


def test_requester_body_capped_not_buffered(http_server):
    """An oversized response is truncated AT the cap while streaming —
    the reference's MAX_RECEIVE_SIZE contract (Config.java:28) — instead
    of being read whole and trimmed afterwards."""
    r = HttpRequester(max_receive_size=64 * 1024)
    row = r.get(f"{http_server}/huge")
    assert row["code"] == 200
    assert len(row["html"]) == 64 * 1024
    # under the cap: the body arrives complete through the same path
    full = HttpRequester(max_receive_size=8 * 1024 * 1024).get(
        f"{http_server}/huge"
    )
    assert len(full["html"]) == 1024 * 1024


def test_requester_read_timeout_mid_body(http_server):
    """Headers arrive fast but the body stalls: the READ timeout must
    trip (separate from connect, Config.java:34-35) => no route."""
    t0 = time.monotonic()
    assert (
        HttpRequester(connect_timeout=3.0, read_timeout=0.3).get(
            f"{http_server}/dribble"
        )
        is None
    )
    assert time.monotonic() - t0 < 1.5  # did not wait out the 2 s stall


def test_requester_socks_proxy_rejected(http_server):
    p = Proxies()
    p.add_socks_proxy("127.0.0.1", 1080)
    with pytest.raises(ValueError, match="SOCKS"):
        HttpRequester(timeout=1.0, proxies=p).get(f"{http_server}/ok.html")


def test_execute_stage_fetch_contract_over_http(http_server):
    """200 / 301 / 404 succeed, 418 and timeout fail — through the same
    _fetch + SUCCESS_CODES path the page stores use."""
    from webcollector_ray.config import CrawlerConfig
    from webcollector_ray.model import (
        STATUS_DB_FAILED,
        STATUS_DB_SUCCESS,
        CrawlDatum,
        datums_to_table,
    )
    from webcollector_ray.regex_rule import RegexRule
    from webcollector_ray.stages.execute import ExecuteStage

    store = HttpPageStore(timeout=2.0)
    stage = ExecuteStage(
        store.handle(),
        regex_rule=RegexRule([r".*\.html"]),
        config=CrawlerConfig(obey_robots=False),
        execute_time_ms=5,
    )
    batch = datums_to_table([
        CrawlDatum(f"{http_server}/ok.html", execute_time=0),
        CrawlDatum(f"{http_server}/redir", execute_time=0),
        CrawlDatum(f"{http_server}/nope.html", execute_time=0),
        CrawlDatum(f"{http_server}/teapot", execute_time=0),
        CrawlDatum("http://127.0.0.1:1/refused.html", execute_time=0),
    ])
    out = stage(batch).to_pandas()
    fetch = out[out["seg"] == "fetch"].set_index("url")
    assert fetch.loc[f"{http_server}/ok.html", "status"] == STATUS_DB_SUCCESS
    assert fetch.loc[f"{http_server}/ok.html", "code"] == 200
    assert fetch.loc[f"{http_server}/redir", "status"] == STATUS_DB_SUCCESS
    assert fetch.loc[f"{http_server}/redir", "code"] == 301
    assert fetch.loc[f"{http_server}/redir", "location"] == "/ok.html"
    assert fetch.loc[f"{http_server}/nope.html", "status"] == STATUS_DB_SUCCESS
    assert fetch.loc[f"{http_server}/teapot", "status"] == STATUS_DB_FAILED
    assert fetch.loc[f"{http_server}/teapot", "code"] == 418
    assert fetch.loc["http://127.0.0.1:1/refused.html", "status"] == STATUS_DB_FAILED
    links = out[out["seg"] == "link"]
    assert f"{http_server}/next.html" in set(links["url"])


def test_live_http_crawl_end_to_end(ray_session, http_server):
    """Point the whole engine at a real URL: BFS over the local server
    discovers /next.html from /ok.html."""
    from webcollector_ray.config import CrawlerConfig
    from webcollector_ray.model import STATUS_DB_SUCCESS
    from webcollector_ray.pipelines.crawler import RamCrawler

    c = RamCrawler(
        HttpPageStore(timeout=2.0),
        config=CrawlerConfig(obey_robots=False, fetch_concurrency=2),
        deterministic_time=True,
    )
    c.add_seed(f"{http_server}/ok.html")
    c.add_regex(r".*\.html")
    res = c.start(3)
    df = res.crawldb.to_pandas().set_index("key")
    assert df.loc[f"{http_server}/ok.html", "status"] == STATUS_DB_SUCCESS
    assert df.loc[f"{http_server}/next.html", "status"] == STATUS_DB_SUCCESS
