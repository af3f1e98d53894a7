"""Stream-shaped operators over an ordered, partitioned log.

Ray Data has no event-time windows; per ray_guide the pattern is
groupby(key).map_groups over ts-sorted groups. The reference engine is
strictly batch-per-depth (SURVEY.md §2.9: no windows/watermarks), so
these are part of the training-pipeline extension surface.

- tumbling_window_agg: floor-aligned fixed windows — expressed as a
  plain two-key groupby aggregate (vectorized window-id column first;
  no per-group Python at all).
- session_windows: gap-based sessions per key — per-group vectorized
  pandas (diff + cumsum), groups are keys so ordering within group is
  explicit.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum


def tumbling_window_agg(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
):
    """-> (key, window_start:int64 epoch-sec, n_events, sum_value)."""

    def add_window(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64())  # timestamp[us] -> micros
        wnd = pc.multiply(
            pc.divide(us, window_sec * 1_000_000), window_sec
        )
        return batch.append_column("window_start", pc.cast(wnd, pa.int64()))

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def hopping_window_agg(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    hop_sec: int = 900,
):
    """Sliding/hopping windows: event t belongs to every window
    [k*hop, k*hop + window) with k in
    ((t - window)/hop, t/hop] — exploded vectorized per batch (each
    event lands in window/hop rows), then the same two-key groupby
    aggregate as tumbling. -> (key, window_start, n_events, sum_value).
    """
    import numpy as np

    w_us = window_sec * 1_000_000
    h_us = hop_sec * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        t_us = pc.cast(batch[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        k_min = (t_us - w_us) // h_us + 1
        k_max = t_us // h_us
        counts = (k_max - k_min + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t_us)), counts)
        # per-row k offsets 0..count-1, vectorized
        offs = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ks = np.repeat(k_min, counts) + offs
        out = pa.table(
            {
                key_col: batch[key_col].take(pa.array(idx)),
                "window_start": pa.array(ks * hop_sec, pa.int64()),
                value_col: batch[value_col].take(pa.array(idx)),
            }
        )
        return out

    return (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def session_windows(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 3600,
    num_buckets: int = 64,
):
    """-> (key, n_sessions, n_events): a new session starts when the gap
    to the previous event of the same key exceeds gap_sec.

    Keys are HASH-BUCKETED and each bucket processes ALL its keys in one
    vectorized sort + diff + per-key groupby-agg — never one pandas
    group per key (at 10^8 users per-key map_groups drowns in group
    dispatch overhead; VERDICT r1 §wrong.5). Buckets are the reduce
    unit, so only num_buckets needs raising at scale."""
    import numpy as np

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if pa.types.is_integer(k.type):
            v = k.to_numpy(zero_copy_only=False).astype(np.uint64)
            bk = (
                (v * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
            ).astype(np.int32)
        else:
            import zlib

            bk = np.array(
                [zlib.crc32(str(x).encode()) % num_buckets for x in k.to_pylist()],
                dtype=np.int32,
            )
        return batch.append_column("__bucket", pa.array(bk))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        diffs = df[ts_col].diff().dt.total_seconds()
        same_key = df[key_col].eq(df[key_col].shift())
        new_session = (diffs > gap_sec) & same_key
        out = df.assign(__new=new_session).groupby(
            key_col, sort=False, as_index=False
        ).agg(n_sessions=("__new", "sum"), n_events=(ts_col, "size"))
        out["n_sessions"] = out["n_sessions"].astype("int64") + 1
        out["n_events"] = out["n_events"].astype("int64")
        return out[[key_col, "n_sessions", "n_events"]]

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda d: per_bucket(d.drop(columns="__bucket")),
            batch_format="pandas",
        )
    )
