"""Grouped ranking: top-N per key — the `row_number() OVER (PARTITION
BY k ORDER BY v DESC)` shape Ray Data has no primitive for.

Hash-bucket the keys, ONE raw-task hash exchange (joins.exchange_reduce),
vectorized per-bucket pandas (sort + groupby-head) — never one
map_groups group per key, never a sort-based Dataset shuffle.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa


def global_top_n(
    ds,
    *,
    order_col: str,
    n: int,
    descending: bool = True,
    tie_col: str | None = None,
):
    """Global top-n WITHOUT a full sort: each batch keeps its local
    top-n (vectorized pandas sort-head), then one final reduce over the
    n x num_blocks survivors. At 10^10 rows this moves n rows per block
    instead of shuffling the entire dataset through a distributed sort.
    Deterministic: ties on order_col break by tie_col ascending."""
    keys = [(order_col, "descending" if descending else "ascending")] + (
        [(tie_col, "ascending")] if tie_col else []
    )

    def local_topn(batch: pa.Table) -> pa.Table:
        # Arrow-native sort+take: preserves the input schema EXACTLY
        # (a pandas roundtrip degrades all-null columns to null type)
        import pyarrow.compute as pc

        if len(batch) <= n:
            idx = pc.sort_indices(batch, sort_keys=keys)
            return batch.take(idx)
        return batch.take(pc.sort_indices(batch, sort_keys=keys).slice(0, n))

    import ray
    import ray.data as rd

    @ray.remote
    def final_reduce(*blocks):
        import pyarrow.compute as pc

        tabs = [t for t in blocks if t is not None and len(t)]
        if not tabs:
            return None
        cat = pa.concat_tables(tabs, promote_options="permissive")
        return cat.take(pc.sort_indices(cat, sort_keys=keys).slice(0, n))

    local = ds.map_batches(local_topn, batch_format="pyarrow")
    out_ref = final_reduce.remote(*local.to_arrow_refs())
    out = ray.get(out_ref)
    if out is None:
        # all-empty input: recover the schema (plain .schema() can be
        # None after execution on an empty dataset)
        schema = ds.schema(fetch_if_missing=True)
        out = pa.table(
            {nm: pa.nulls(0, t) for nm, t in zip(schema.names, schema.types)}
        ) if schema is not None else pa.table({})
    return rd.from_arrow(out)


def top_n_per_group(
    ds,
    *,
    key_col: str,
    order_col: str,
    n: int,
    descending: bool = True,
    tie_col: str | None = None,
    num_buckets: int = 32,
):
    """-> input columns + `rank` (1..n per key). Deterministic: ties on
    order_col break by tie_col ascending (required for a stable
    result)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .joins import _bucket_ids

        b = _bucket_ids(batch[key_col], num_buckets)
        return batch.append_column("__bucket", pa.array(b))

    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    asc = [True, not descending] + ([True] if tie_col else [])

    schema = ds.schema()
    empty_cols = {
        nm: pa.nulls(0, t) for nm, t in zip(schema.names, schema.types)
    }
    empty_cols["rank"] = pa.nulls(0, pa.int64())
    empty = pa.table(empty_cols)

    def bucket_topn(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop(columns=["__bucket"]).sort_values(
            sort_cols, ascending=asc, kind="mergesort"
        )
        out = df.groupby(key_col, sort=False).head(n).copy()
        out["rank"] = out.groupby(key_col, sort=False).cumcount() + 1
        return pa.Table.from_pandas(out, preserve_index=False)

    from .joins import exchange_reduce

    return exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        bucket_topn, empty, num_buckets,
    )


def argmin_by(
    ds,
    *,
    key_col: str,
    order_col: str,
    tie_col: str,
    num_buckets: int = 32,
):
    """Distributed ARGMIN join: for every key, the full row holding the
    minimum of order_col (ties broken by tie_col ascending — required
    for a deterministic result). The SQL shape is
    `row_number() OVER (PARTITION BY key ORDER BY order_col, tie_col)
    = 1`, the classic min-cost-supplier-per-part idiom (TPC-H Q2's
    core).

    Scale shape: each batch keeps its LOCAL per-key argmin first
    (vectorized pandas sort + drop_duplicates), so the key-hash
    exchange moves at most one row per (key, block) — never the full
    fact table; one per-bucket reduce repeats the same fold."""
    schema = ds.schema()
    empty = pa.table(
        {nm: pa.nulls(0, t) for nm, t in zip(schema.names, schema.types)}
    )
    sort_cols = [key_col, order_col, tie_col]

    def local_argmin(batch: pa.Table) -> pa.Table:
        from .joins import _bucket_ids

        df = batch.to_pandas().sort_values(sort_cols, kind="mergesort")
        out = df.drop_duplicates(key_col, keep="first")
        t = pa.Table.from_pandas(out, preserve_index=False).cast(
            empty.schema
        )
        return t.append_column(
            "__bucket", pa.array(_bucket_ids(t[key_col], num_buckets))
        )

    def bucket_argmin(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas().sort_values(
            sort_cols, kind="mergesort"
        )
        return pa.Table.from_pandas(
            df.drop_duplicates(key_col, keep="first"),
            preserve_index=False,
        ).cast(empty.schema)

    from .joins import exchange_reduce

    return exchange_reduce(
        ds.map_batches(local_argmin, batch_format="pyarrow"),
        bucket_argmin, empty, num_buckets,
    )
