"""Output helpers: site-mirror path derivation (S6), datum pretty-print
(S9), and the HashSet next-filter (E6).

Ray-first shape: fs_output_path is a pure column function — the page
sink is `pages.map_batches(add_out_path) -> write_parquet/partitioned
files`, one file per Ray write task, never a driver-side loop.
"""

from __future__ import annotations

import datetime
from typing import Iterable, Optional, Set
from urllib.parse import urlsplit

import pyarrow as pa

from ..model import (
    STATUS_DB_FAILED,
    STATUS_DB_SUCCESS,
    STATUS_DB_UNEXECUTED,
    CrawlDatum,
)


def fs_output_path(url: str) -> Optional[str]:
    """Site-mirror relative path for a page URL: `<host>/<path>` with
    `?query` appended as `_query`, directory paths completed with
    `index.html`, and extension-less files given `.html`
    (reference semantics: util/FileSystemOutput.java:43-72)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if not parts.netloc:
        return None
    query = f"_{parts.query}" if parts.query else ""
    path = parts.path
    if len(path) == 0:
        path = "index.html"
    elif path.endswith("/"):
        path = path + "index.html"
    else:
        last_slash = path.rfind("/")
        last_point = path.rfind(".")
        if last_point < last_slash:
            path = path + ".html"
    path += query
    return f"{parts.netloc}/{path.lstrip('/')}"


def add_out_path_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Column form for the page-mirror sink stage."""
    return batch.append_column(
        "out_path",
        pa.array([fs_output_path(u) for u in batch[url_col].to_pylist()],
                 pa.string()),
    )


_STATUS_NAMES = {
    STATUS_DB_SUCCESS: "success",
    STATUS_DB_FAILED: "failed",
    STATUS_DB_UNEXECUTED: "unexecuted",
}


def datum_to_string(datum: CrawlDatum) -> str:
    """Human-readable datum dump (util/CrawlDatumFormater.java:39-77):
    KEY/URL/STATUS/ExecuteTime/ExecuteCount/Code[, Location], then
    META[i]: (k,v) lines in meta insertion order."""
    ts = datetime.datetime.fromtimestamp(
        (datum.execute_time or 0) / 1000.0
    ).strftime("%Y-%m-%d %H:%M:%S")
    out = [
        "",
        f"KEY: {datum.key}",
        f"URL: {datum.url}",
        f"STATUS: {_STATUS_NAMES.get(datum.status, '')}",
        f"ExecuteTime: {ts}",
        f"ExecuteCount: {datum.execute_count}",
        f"Code: {datum.code}",
    ]
    if datum.location is not None:
        out.append(f"Location: {datum.location}")
    for i, (k, v) in enumerate(datum.meta_map.items()):
        out.append(f"META[{i}]: ({k},{v})")
    return "\n".join(out) + "\n"


class HashSetNextFilter:
    """Drop detected links whose key is in a fixed set
    (plugin/nextfilter/HashSetNextFilter.java:28-40). For large sets,
    prefer the sharded bloom seen-filter or an anti-join — this is the
    broadcast-small-set form."""

    def __init__(self, keys: Iterable[str]):
        self.keys: Set[str] = set(keys)

    def __call__(self, datum: CrawlDatum, referer: CrawlDatum):
        return None if datum.key in self.keys else datum


class FileIdGenerator:
    """Sequential file-id generator seeded from the max existing id in
    a directory (util/FileIdGenerator.java:30-44). In Ray pipelines the
    write tasks name their own parts; this is the single-process
    parity shim."""

    def __init__(self, base_dir: str):
        import os

        self.base_dir = base_dir
        last = -1
        if os.path.isdir(base_dir):
            for fn in os.listdir(base_dir):
                stem = fn.split(".")[0]
                try:
                    last = max(last, int(stem))
                except ValueError:
                    continue
        self._last = last

    def generate(self) -> int:
        self._last += 1
        return self._last


def list_crawldb(crawl_path: str, depth: Optional[int] = None):
    """Offline crawldb inspection (S5: plugin/rocks/RocksDBReader.java):
    read the newest (or given) depth's frontier checkpoint as a pandas
    DataFrame in canonical key order."""
    from ..state.frontier import CheckpointStore

    ckpt = CheckpointStore(crawl_path)
    d = depth if depth is not None else ckpt.latest_complete_depth()
    if d is None:
        raise FileNotFoundError(f"no complete depth under {crawl_path}")
    return (
        ckpt.read_dataset(d, "crawldb")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
