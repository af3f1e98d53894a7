"""Network plumbing parity shims (F3/F2 in SURVEY.md §2.3).

There is no live HTTP in this engine (fetch is a page-store lookup,
sources/pagestore.py), but the reference's requester-customization
surface is kept so user code ports 1:1: a Proxies pool
(net/Proxies.java:42-73) and a Requester protocol a custom fetch stage
can implement (net/Requester.java:28-33).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import List, Optional, Protocol


@dataclass(frozen=True)
class Proxy:
    kind: str  # "http" | "socks"
    host: str
    port: int


class Proxies(List[Proxy]):
    """Proxy pool (reference: net/Proxies.java)."""

    def __init__(self, seed: Optional[int] = None):
        super().__init__()
        self._rand = random.Random(seed)

    def random_proxy(self) -> Proxy:
        return self[self._rand.randrange(len(self))]

    def add_http_proxy(self, host: str, port: int) -> None:
        self.append(Proxy("http", host, port))

    def add_socks_proxy(self, host: str, port: int) -> None:
        self.append(Proxy("socks", host, port))


class Requester(Protocol):
    """Custom-requester contract (net/Requester.java:28-33): given a
    frontier datum's url, return the fetch-result row dict
    (code/location/content_type/html) or None for no-route. A custom
    ExecuteStage subclass can swap its PageStoreReader for any object
    with this shape (e.g. per-datum headers / proxy selection built
    from a Proxies pool in the stage __init__)."""

    def get(self, url: str) -> Optional[dict]:  # pragma: no cover
        ...


DEFAULT_USER_AGENT = "Mozilla/5.0 (compatible; webcollector-ray/1.0)"


_READ_CHUNK = 64 * 1024


class HttpRequester:
    """Live-HTTP Requester with the reference fetcher's semantics
    (plugin/net/OkHttpRequester.java:48-131):

    - redirects are NOT auto-followed (followRedirects(false)): a
      301/302 response is returned as-is with its Location header
      captured, so the engine's redirect-resolution idiom (X8) sees it;
    - connect and read timeouts are SEPARATE, defaulting to the
      reference's 3 s / 10 s (Config.java:34-35,
      OkHttpRequester.java:62-63); the read timeout applies per socket
      read, like OkHttp's readTimeout;
    - the body is streamed in chunks and STOPS at max_receive_size
      (Config.java:28, default 10 MiB) — a hostile multi-GB response is
      never buffered; the truncation matches ExecuteStage._fetch's cap
      so both transports agree byte-for-byte;
    - the success-code policy is NOT enforced here — ExecuteStage._fetch
      applies SUCCESS_CODES exactly as it does for page stores;
    - any transport failure (refused / DNS / timeout / protocol error)
      returns None == "no route", which _fetch maps to FAILED, matching
      the reference's exception => FAILED contract (X10).

    Implements the Requester protocol, so it plugs in wherever a
    PageStoreReader does (ExecuteStage swaps to it for handle kind
    'http'). An optional Proxies pool picks a random HTTP proxy per
    request (net/Proxies.java usage in OkHttpRequester.java:62-73);
    SOCKS proxies need a custom Requester (no stdlib support)."""

    def __init__(
        self,
        *,
        timeout: Optional[float] = None,
        connect_timeout: float = 3.0,
        read_timeout: float = 10.0,
        max_receive_size: int = 10 * 1024 * 1024,
        user_agent: str = DEFAULT_USER_AGENT,
        headers: Optional[dict] = None,
        proxies: Optional[Proxies] = None,
    ):
        # `timeout` is the legacy single knob: when given it governs
        # both phases (old handles / call sites keep working)
        self.connect_timeout = timeout if timeout is not None else connect_timeout
        self.read_timeout = timeout if timeout is not None else read_timeout
        self.max_receive_size = max_receive_size
        self.user_agent = user_agent
        self.headers = dict(headers or {})
        self.proxies = proxies

    def _read_capped(self, resp) -> bytes:
        """Stream the body, never holding more than max_receive_size
        (+ one chunk) in memory; stop reading once the cap is hit."""
        cap = self.max_receive_size
        chunks, got = [], 0
        while got < cap:
            chunk = resp.read(min(_READ_CHUNK, cap - got))
            if not chunk:
                break
            chunks.append(chunk)
            got += len(chunk)
        return b"".join(chunks)

    def get(self, url: str) -> Optional[dict]:
        import http.client
        from urllib.parse import urlsplit, urlunsplit

        try:
            parts = urlsplit(url)
        except ValueError:
            return None
        scheme = (parts.scheme or "").lower()
        if scheme not in ("http", "https"):
            return None
        conn_cls = (
            http.client.HTTPSConnection
            if scheme == "https"
            else http.client.HTTPConnection
        )
        proxy = None
        if self.proxies:
            proxy = self.proxies.random_proxy()
            if proxy.kind != "http":
                raise ValueError(
                    "HttpRequester supports http proxies only; implement "
                    "a custom Requester for SOCKS"
                )
        conn = None
        try:
            if proxy is not None:
                conn = http.client.HTTPConnection(
                    proxy.host, proxy.port, timeout=self.connect_timeout
                )
                target = url  # absolute-form request line via proxy
            else:
                conn = conn_cls(
                    parts.hostname, parts.port, timeout=self.connect_timeout
                )
                target = urlunsplit(
                    ("", "", parts.path or "/", parts.query, "")
                )
            # connect under the connect timeout, then switch the socket
            # to the read timeout for the request/response exchange
            conn.connect()
            conn.sock.settimeout(self.read_timeout)
            hdrs = {"User-Agent": self.user_agent, **self.headers}
            conn.request("GET", target, headers=hdrs)
            resp = conn.getresponse()
            body = self._read_capped(resp)
            return {
                "code": resp.status,
                "location": resp.getheader("Location"),
                "content_type": resp.getheader("Content-Type"),
                "html": body,
            }
        except (OSError, http.client.HTTPException):
            return None
        finally:
            if conn is not None:
                conn.close()


class HttpPageStore:
    """Live-web page source for the Crawler: `Crawler(HttpPageStore())`
    fetches every generated URL over real HTTP through HttpRequester
    (PageStoreReader kind 'http'). Robots enforcement, politeness
    budgets, redirect bookkeeping and the success-code set all behave
    exactly as with offline stores — the requester only swaps the
    transport."""

    def __init__(
        self,
        *,
        timeout: Optional[float] = None,
        connect_timeout: float = 3.0,
        read_timeout: float = 10.0,
        max_receive_size: int = 10 * 1024 * 1024,
        user_agent: str = DEFAULT_USER_AGENT,
        headers: Optional[dict] = None,
    ):
        self._handle = {
            "kind": "http",
            "timeout": timeout,
            "connect_timeout": connect_timeout,
            "read_timeout": read_timeout,
            "max_receive_size": max_receive_size,
            "user_agent": user_agent,
            "headers": dict(headers or {}),
        }

    def handle(self) -> dict:
        return self._handle
