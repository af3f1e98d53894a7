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
