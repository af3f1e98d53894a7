"""Merge — the per-depth wide shuffle (A1 in SURVEY.md §2.9).

Reference semantics (plugin/rocks/RocksDBManager.java:160-197):
crawldb <- fetch (fetch OVERWRITES crawldb by key), then crawldb <- link
(link inserted ONLY if key absent). Expressed distribution-first as one
bucketed dedupe: union the sources with a precedence tag
(fetch=0 < crawldb=1 < link=2), hash-bucket by key, and take the
min-precedence row per key inside each bucket with a vectorized pandas
drop_duplicates. Within equal precedence (duplicate link keys in one
depth) the tie-break is deterministic and order-free: lexicographically
smallest (url, meta, status) — the reference's first-write-wins depends
on KV iteration order and thread interleaving, which is not reproducible
even by the reference itself.

The same primitive implements seed injection (J1: force-seeds overwrite,
non-force insert-if-absent; crawldb/DBManager.java:49-86).

Scale notes: ONE all-to-all exchange per depth, keyed by
md5(key) -> bucket so the shuffle has `num_buckets` uniformly-sized
partitions regardless of key skew; buckets are the unit of reduce work,
not distinct keys, so tiny-group overhead never appears.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pandas as pd
import pyarrow as pa

from ..model import FRONTIER_SCHEMA
from ..urls import url_hash64

_HELPER_COLS = ["__prec", "__bucket"]


def _tag(prec: int, num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        buckets = pa.array(
            [url_hash64(k) % num_buckets for k in batch["key"].to_pylist()],
            pa.int32(),
        )
        batch = batch.append_column("__prec", pa.array([prec] * n, pa.int8()))
        return batch.append_column("__bucket", buckets)

    return fn


def _dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(
        ["key", "__prec", "url", "meta", "status"], kind="mergesort"
    )
    return df.drop_duplicates("key", keep="first")


def _restore_schema(batch: pa.Table) -> pa.Table:
    batch = batch.drop_columns([c for c in _HELPER_COLS if c in batch.column_names])
    cols = [batch[name].cast(FRONTIER_SCHEMA.field(name).type) for name in FRONTIER_SCHEMA.names]
    return pa.table(dict(zip(FRONTIER_SCHEMA.names, cols)), schema=FRONTIER_SCHEMA)


def dedupe_by_key(
    parts: List[Tuple["ray.data.Dataset", int]],  # noqa: F821
    num_buckets: int = 64,
):
    """Union datasets and keep, per key, the row from the lowest-precedence
    source (ties broken deterministically). Returns a FRONTIER_SCHEMA
    Dataset."""
    tagged = [ds.map_batches(_tag(prec, num_buckets), batch_format="pyarrow")
              for ds, prec in parts]
    if not tagged:
        raise ValueError("no parts to merge")
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.union(t)
    deduped = unioned.groupby("__bucket").map_groups(
        _dedupe_bucket, batch_format="pandas"
    )
    return deduped.map_batches(_restore_schema, batch_format="pyarrow")


def merge_segments(
    crawldb: Optional["ray.data.Dataset"],  # noqa: F821
    fetch_seg: Optional["ray.data.Dataset"],  # noqa: F821
    link_seg: Optional["ray.data.Dataset"],  # noqa: F821
    num_buckets: int = 64,
):
    """Per-depth merge: fetch > crawldb > link (RocksDBManager.java:160-197).

    Pass None for a source that is known empty; at least one source must
    be present."""
    parts = []
    if fetch_seg is not None:
        parts.append((fetch_seg, 0))
    if crawldb is not None:
        parts.append((crawldb, 1))
    if link_seg is not None:
        parts.append((link_seg, 2))
    if not parts:
        raise ValueError("merge called with no inputs")
    if len(parts) == 1:
        # still dedupe: a lone link segment can carry duplicate keys
        return dedupe_by_key(parts, num_buckets)
    return dedupe_by_key(parts, num_buckets)
