"""Merge — the per-depth wide shuffle (A1 in SURVEY.md §2.9).

Reference semantics (plugin/rocks/RocksDBManager.java:160-197):
crawldb <- fetch (fetch OVERWRITES crawldb by key), then crawldb <- link
(link inserted ONLY if key absent). Expressed distribution-first as one
bucketed dedupe: tag every source row with a precedence
(fetch=0 < crawldb=1 < link=2), hash-partition by key, and take the
min-precedence row per key inside each bucket. Within equal precedence
(duplicate link keys in one depth) the tie-break is deterministic and
order-free: lexicographically smallest (url, meta, status) — the
reference's first-write-wins depends on KV iteration order and thread
interleaving, which is not reproducible even by the reference itself.

The same primitive implements seed injection (J1: force-seeds
overwrite, non-force insert-if-absent; crawldb/DBManager.java:49-86).

Physical plan: a DIRECT two-round hash shuffle built from raw Ray
tasks (the one place the Dataset API is bypassed, SURVEY.md §7.0):

    split: one task per input block -> `num_buckets` sub-tables
           (num_returns=num_buckets, so each reduce fetches only its
           own partition slices)
    reduce: one task per bucket -> concat + vectorized first-by-key

This replaces ``union().groupby(bucket).map_groups(...)``: Ray Data's
sort-based groupby costs ~0.1 s of fixed overhead per *input block*
(boundary sampling + per-block sort + merge tasks) which dominated the
per-depth wall time — with block counts compounding each depth — while
the direct exchange is two task waves and caps the output at
`num_buckets` blocks regardless of input fragmentation. Buckets are
the reduce unit, not distinct keys, so tiny-group overhead and key
skew never appear; at 10^10 keys only `num_buckets` needs raising.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..model import FRONTIER_SCHEMA, STATUS_DB_SUCCESS

_HELPER_COLS = ["__prec"]


def _bucket_ids(keys: List[str], num_buckets: int) -> np.ndarray:
    """Vectorized fixed-key siphash (same C kernel as the seen filter)
    — the per-key crc32 Python loop this replaces was the largest
    single cost of the split wave at 10^6-row frontiers. Bucket
    routing is internal to one exchange, so the hash only has to be
    stable within a run."""
    if not len(keys):
        return np.zeros(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


@ray.remote
def _split_blocks(precs: List[int], num_buckets: int, *tables):
    """A group of input blocks -> num_buckets sub-tables (None when
    empty). Blocks are grouped so the driver manages
    O(max_split_tasks * num_buckets) refs per exchange, not
    O(input_blocks * num_buckets)."""
    tagged = []
    for prec, t in zip(precs, tables):
        if t is None or len(t) == 0 or "key" not in t.column_names:
            continue
        tagged.append(
            t.append_column(
                "__prec", pa.array(np.full(len(t), prec, dtype=np.int8))
            )
        )
    if not tagged:
        out = [None] * num_buckets
        return out[0] if num_buckets == 1 else tuple(out)
    table = pa.concat_tables(tagged, promote_options="permissive")
    b = _bucket_ids(table["key"].to_pylist(), num_buckets)
    order = np.argsort(b, kind="stable")
    sorted_b = b[order]
    bounds = np.searchsorted(sorted_b, np.arange(num_buckets + 1))
    shuffled = table.take(pa.array(order))
    out = []
    for i in range(num_buckets):
        lo, hi = bounds[i], bounds[i + 1]
        out.append(shuffled.slice(lo, hi - lo) if hi > lo else None)
    return out[0] if num_buckets == 1 else tuple(out)


def _dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(
        ["key", "__prec", "url", "meta", "status"], kind="mergesort"
    )
    return df.drop_duplicates("key", keep="first")


def _restore_schema(batch: pa.Table) -> pa.Table:
    batch = batch.drop_columns(
        [c for c in _HELPER_COLS if c in batch.column_names]
    )
    cols = [
        batch[name].cast(FRONTIER_SCHEMA.field(name).type)
        for name in FRONTIER_SCHEMA.names
    ]
    return pa.table(dict(zip(FRONTIER_SCHEMA.names, cols)), schema=FRONTIER_SCHEMA)


@ray.remote(num_returns=3)
def _reduce_bucket(eligible_max_count, *parts):
    """-> (merged bucket table, row count, generate-eligible count).
    The eligible count (default G1/G2 predicate: status != SUCCESS and
    execute_count <= max) rides back with the merge so the crawler's A2
    early-termination check costs no extra task wave."""
    import pyarrow.compute as pc

    tables = [t for t in parts if t is not None and len(t)]
    if not tables:
        return FRONTIER_SCHEMA.empty_table(), 0, 0
    cat = pa.concat_tables(tables, promote_options="permissive")
    df = _dedupe_bucket(cat.to_pandas())
    out = _restore_schema(pa.Table.from_pandas(df, preserve_index=False))
    elig = 0
    if len(out):
        mask = pc.and_(
            pc.not_equal(out["status"], STATUS_DB_SUCCESS),
            pc.less_equal(out["execute_count"], eligible_max_count),
        )
        elig = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
    return out, len(out), elig


def dedupe_by_key_refs(
    parts: List[Tuple["ray.data.Dataset", int]],  # noqa: F821
    num_buckets: int = 64,
    max_split_tasks: int = 64,
    eligible_max_count: int = 2**62,
):
    """The raw exchange: -> (bucket table refs, bucket row-count refs,
    generate-eligible count refs). Counts ride back as separate tiny
    refs so the driver can report frontier sizes (and decide A2
    termination) without a Dataset count() execution."""
    if not parts:
        raise ValueError("no parts to merge")
    pairs = []
    for ds, prec in parts:
        for block_ref in ds.to_arrow_refs():
            pairs.append((prec, block_ref))
    if not pairs:
        raise ValueError("no blocks to merge")
    ngroups = max(1, min(len(pairs), max_split_tasks))
    split_refs = []
    for g in range(ngroups):
        group = pairs[g::ngroups]
        refs = _split_blocks.options(num_returns=num_buckets).remote(
            [p for p, _ in group], num_buckets, *[r for _, r in group]
        )
        if num_buckets == 1:
            refs = [refs]
        split_refs.append(refs)
    table_refs, count_refs, elig_refs = [], [], []
    for b in range(num_buckets):
        t_ref, c_ref, e_ref = _reduce_bucket.remote(
            eligible_max_count, *[sr[b] for sr in split_refs]
        )
        table_refs.append(t_ref)
        count_refs.append(c_ref)
        elig_refs.append(e_ref)
    return table_refs, count_refs, elig_refs


def dedupe_by_key(
    parts: List[Tuple["ray.data.Dataset", int]],  # noqa: F821
    num_buckets: int = 64,
):
    """Union datasets and keep, per key, the row from the lowest-precedence
    source (ties broken deterministically). Returns a FRONTIER_SCHEMA
    Dataset of exactly `num_buckets` hash-partitioned blocks."""
    import ray.data as rd

    table_refs, _, _ = dedupe_by_key_refs(parts, num_buckets)
    return rd.from_arrow_refs(table_refs)


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
    return dedupe_by_key(parts, num_buckets)
