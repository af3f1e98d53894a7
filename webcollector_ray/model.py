"""Data model: CrawlDatum / CrawlDatums and the Arrow schemas.

Reference semantics: model/CrawlDatum.java (fields :35-66, key fallback
:239-245, typed meta :193-296, JSON-array serialization :299-328) and
model/CrawlDatums.java (ordered buffer with broadcast meta/type setters
:56-168).

Arrow mapping (SURVEY.md §1.1): the frontier is a table with columns
(key, url, status, execute_time, execute_count, code, location, meta);
`meta` is a flat JSON object serialized as text — heterogeneous scalar
values (str/int/bool/float) round-trip exactly, and insertion order is
preserved like gson's JsonObject. The reserved meta key "s_t" carries
`type` (CrawlDatum.java:59-64,126-134).
"""

from __future__ import annotations

import json
import re
import time
from typing import Any, Iterable, Iterator, Optional

import pyarrow as pa

# status values (CrawlDatum.java:35-37)
STATUS_DB_UNEXECUTED = 0
STATUS_DB_FAILED = 1
STATUS_DB_SUCCESS = 5

CODE_NOT_SET = -1  # CrawlDatum.java:40

META_KEY_TYPE = "s_t"  # CrawlDatum.java:59
META_KEY_SYS_INFO = "s_i"  # CrawlDatum.java:64 (reserved, unused by core)

FRONTIER_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("url", pa.string()),
        ("status", pa.int8()),
        ("execute_time", pa.int64()),
        ("execute_count", pa.int32()),
        ("code", pa.int32()),
        ("location", pa.string()),
        ("meta", pa.string()),
    ]
)

# Common-Crawl-style pages table (BASELINE.json input_hint). `code` and
# `location` are optional extensions used by fixtures to model redirects
# and failures; a table without them is treated as all-200.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def now_ms() -> int:
    return int(time.time() * 1000)


class CrawlDatum:
    """One frontier record (reference: model/CrawlDatum.java)."""

    __slots__ = ("url", "_key", "status", "execute_time", "execute_count",
                 "code", "location", "meta_map")

    def __init__(
        self,
        url: Optional[str] = None,
        *,
        key: Optional[str] = None,
        status: int = STATUS_DB_UNEXECUTED,
        execute_time: Optional[int] = None,
        execute_count: int = 0,
        code: int = CODE_NOT_SET,
        location: Optional[str] = None,
        meta: Optional[dict] = None,
    ):
        self.url = url
        self._key = key
        self.status = status
        # reference defaults executeTime to construction wall time
        # (CrawlDatum.java:43); pass execute_time for determinism in tests
        self.execute_time = now_ms() if execute_time is None else execute_time
        self.execute_count = execute_count
        self.code = code
        self.location = location
        self.meta_map: dict = dict(meta) if meta else {}

    # -- key: falls back to url when unset (CrawlDatum.java:239-245) --
    @property
    def key(self) -> Optional[str]:
        return self._key if self._key is not None else self.url

    @key.setter
    def key(self, k: Optional[str]) -> None:
        self._key = k

    # -- type lives in meta under "s_t" (CrawlDatum.java:126-134) --
    def type(self) -> Optional[str]:
        v = self.meta_map.get(META_KEY_TYPE)
        return v if isinstance(v, str) or v is None else str(v)

    def set_type(self, t: Optional[str]) -> "CrawlDatum":
        if t is None:
            self.meta_map.pop(META_KEY_TYPE, None)
        else:
            self.meta_map[META_KEY_TYPE] = t
        return self

    def match_type(self, t: Optional[str]) -> bool:
        # null-safe equality (CrawlDatum.java:80-86)
        mine = self.type()
        if mine is None:
            return t is None
        return mine == t

    def match_url(self, url_regex: str) -> bool:
        # Java Pattern.matches = full match (CrawlDatum.java:94-96)
        return re.fullmatch(url_regex, self.url or "") is not None

    def match_url_regex_rule(self, rule) -> bool:
        return rule.satisfy(self.url or "")

    # -- typed meta accessors (CrawlDatum.java:193-296) --
    def meta(self, key: Optional[str] = None):
        if key is None:
            return self.meta_map
        v = self.meta_map.get(key)
        return None if v is None else (v if isinstance(v, str) else json.dumps(v))

    def meta_raw(self, key: str):
        return self.meta_map.get(key)

    def meta_as_int(self, key: str) -> int:
        return int(self.meta_map[key])

    def meta_as_long(self, key: str) -> int:
        return int(self.meta_map[key])

    def meta_as_double(self, key: str) -> float:
        return float(self.meta_map[key])

    def meta_as_boolean(self, key: str) -> bool:
        v = self.meta_map[key]
        return v if isinstance(v, bool) else json.loads(str(v).lower())

    def set_meta(self, key: str, value: Any) -> "CrawlDatum":
        self.meta_map[key] = value
        return self

    def incr_execute_count(self, n: int = 1) -> "CrawlDatum":
        self.execute_count += n
        return self

    # -- JSON-array serialization (CrawlDatum.java:299-328):
    # [url, status, executeTime, executeCount, code, location, meta?];
    # meta appended only when non-empty; fromJsonArray restores meta only
    # when len==7 and never restores code/location (per-round transients).
    def as_json_array(self) -> str:
        arr: list = [self.url, self.status, self.execute_time,
                     self.execute_count, self.code, self.location]
        if self.meta_map:
            arr.append(self.meta_map)
        return json.dumps(arr, ensure_ascii=False, separators=(",", ":"))

    @classmethod
    def from_json_array(cls, key: str, text: str) -> "CrawlDatum":
        arr = json.loads(text)
        d = cls(
            url=arr[0],
            key=key,
            status=arr[1],
            execute_time=arr[2],
            execute_count=arr[3],
        )
        if len(arr) == 7:
            d.meta_map = dict(arr[6])
        return d

    # -- Arrow row mapping --
    def to_row(self) -> dict:
        return {
            "key": self.key,
            "url": self.url,
            "status": self.status,
            "execute_time": self.execute_time,
            "execute_count": self.execute_count,
            "code": self.code,
            "location": self.location,
            "meta": json.dumps(self.meta_map, ensure_ascii=False,
                               separators=(",", ":")) if self.meta_map else "",
        }

    @classmethod
    def from_row(cls, row: dict) -> "CrawlDatum":
        meta_text = row.get("meta") or ""
        return cls(
            url=row["url"],
            key=row.get("key"),
            status=int(row.get("status", STATUS_DB_UNEXECUTED)),
            execute_time=int(row.get("execute_time", 0)),
            execute_count=int(row.get("execute_count", 0)),
            code=int(row.get("code", CODE_NOT_SET)),
            location=row.get("location"),
            meta=json.loads(meta_text) if meta_text else {},
        )

    def __repr__(self) -> str:  # CrawlDatumFormater-ish (util/CrawlDatumFormater.java:39-77)
        return (f"CrawlDatum(key={self.key!r}, url={self.url!r}, "
                f"status={self.status}, count={self.execute_count}, "
                f"code={self.code}, meta={self.meta_map!r})")


def meta_to_text(meta: dict) -> str:
    return json.dumps(meta, ensure_ascii=False, separators=(",", ":")) if meta else ""


def text_to_meta(text: Optional[str]) -> dict:
    return json.loads(text) if text else {}


class CrawlDatums:
    """Ordered output buffer with broadcast setters.

    Reference: model/CrawlDatums.java — the `next` out-parameter of
    visit(); `add` accepts datum / url / iterable; `meta`/`type` broadcast
    to every contained datum (:122-168, 205-210). In the Ray engine this is
    the per-row flat-map output buffer of the parse stage.
    """

    def __init__(self, init: Optional[Iterable] = None):
        self._list: list[CrawlDatum] = []
        if init is not None:
            self.add(init)

    def add(self, item) -> "CrawlDatums":
        if isinstance(item, CrawlDatum):
            self._list.append(item)
        elif isinstance(item, str):
            self._list.append(CrawlDatum(item))
        elif isinstance(item, CrawlDatums):
            self._list.extend(item._list)
        elif isinstance(item, Iterable):
            for x in item:
                self.add(x)
        else:
            raise TypeError(f"cannot add {type(item)} to CrawlDatums")
        return self

    def add_and_return(self, item):
        # returns the added datum(s) for fluent mutation
        # (CrawlDatums.java:90-110)
        if isinstance(item, CrawlDatum):
            self._list.append(item)
            return item
        if isinstance(item, str):
            d = CrawlDatum(item)
            self._list.append(d)
            return d
        sub = CrawlDatums(item)
        self._list.extend(sub._list)
        return sub

    # broadcast setters (CrawlDatums.java:122-168)
    def set_meta(self, key: str, value: Any) -> "CrawlDatums":
        for d in self._list:
            d.set_meta(key, value)
        return self

    def set_type(self, t: Optional[str]) -> "CrawlDatums":
        for d in self._list:
            d.set_type(t)
        return self

    def __iter__(self) -> Iterator[CrawlDatum]:
        return iter(self._list)

    def __len__(self) -> int:
        return len(self._list)

    def __getitem__(self, i: int) -> CrawlDatum:
        return self._list[i]

    def is_empty(self) -> bool:
        return not self._list

    def clear(self) -> None:
        self._list.clear()


def datums_to_table(datums: Iterable[CrawlDatum]) -> pa.Table:
    rows = [d.to_row() for d in datums]
    if not rows:
        return FRONTIER_SCHEMA.empty_table()
    cols = {name: [r[name] for r in rows] for name in FRONTIER_SCHEMA.names}
    return pa.table(cols, schema=FRONTIER_SCHEMA)
