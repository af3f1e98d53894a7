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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_mix(k: "np.ndarray") -> "np.ndarray":
    """uint64 hash of a key array: integer multiplicative mix for
    int dtypes, pd.util.hash_array for object/string keys — the ONE
    dtype branch every bucket tagger in this module shares."""
    import numpy as np

    if np.issubdtype(k.dtype, np.integer):
        return k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    import pandas as _pd

    return _pd.util.hash_array(np.asarray(k, dtype=object), categorize=False)


def _win_bucketed(g: "pd.DataFrame", key_col: str, num_buckets: int) -> pa.Table:
    """Partial frame -> Arrow with a __bucket column keyed on
    (key, window_start)."""
    import numpy as np

    k = g[key_col].to_numpy()
    w = g["window_start"].to_numpy().astype(np.int64)
    mix = _key_mix(k)
    bk = ((mix ^ w.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
    t = pa.Table.from_pandas(g, preserve_index=False)
    return t.append_column("__bucket", pa.array(bk))


def _win_exchange(partials, in_schema, key_col, value_col, num_buckets):
    """Final window aggregation through the raw-task hash exchange
    (joins.exchange_reduce): one reduce task per bucket does a single
    vectorized pandas groupby-sum over all its (key, window) groups —
    no sort-based shuffle, no per-group dispatch."""
    from .joins import exchange_reduce

    types = dict(zip(in_schema.names, in_schema.types))
    key_t = types[key_col]
    sum_t = (
        pa.int64() if pa.types.is_integer(types[value_col]) else pa.float64()
    )
    empty = pa.table(
        {
            key_col: pa.nulls(0, key_t),
            "window_start": pa.nulls(0, pa.int64()),
            "n_events": pa.nulls(0, pa.int64()),
            "sum_value": pa.nulls(0, sum_t),
        }
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        out = df.groupby([key_col, "window_start"], sort=False, as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return pa.Table.from_pandas(
            out[[key_col, "window_start", "n_events", "sum_value"]],
            preserve_index=False,
        )

    return exchange_reduce(partials, reduce_fn, empty, num_buckets)


def tumbling_window_agg(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    num_buckets: int = 32,
):
    """-> (key, window_start:int64 epoch-sec, n_events, sum_value)."""

    def partial(batch: pa.Table) -> pa.Table:
        # combiner: collapse the batch to one row per (key, window)
        # BEFORE the shuffle — the wide groupby then moves partials,
        # not events
        us = pc.cast(batch[ts_col], pa.int64())  # timestamp[us] -> micros
        wnd = pc.cast(
            pc.multiply(pc.divide(us, window_sec * 1_000_000), window_sec),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(zero_copy_only=False),
                "window_start": wnd.to_numpy(zero_copy_only=False),
                value_col: batch[value_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key_col, "window_start"], sort=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        ).reset_index()
        return _win_bucketed(g, key_col, num_buckets)

    return _win_exchange(
        events.map_batches(partial, batch_format="pyarrow"),
        events.schema(), key_col, value_col, num_buckets,
    )


def hopping_window_agg(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    hop_sec: int = 900,
    num_buckets: int = 32,
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

    def explode_partial(batch: pa.Table) -> pa.Table:
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
        # combiner: one partial row per (key, window) per batch — the
        # shuffle then moves partials, not the window/hop-times-exploded
        # event rows
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(zero_copy_only=False)[idx],
                "window_start": ks * hop_sec,
                value_col: batch[value_col].to_numpy(zero_copy_only=False)[idx],
            }
        )
        g = df.groupby([key_col, "window_start"], sort=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        ).reset_index()
        return _win_bucketed(g, key_col, num_buckets)

    return _win_exchange(
        events.map_batches(explode_partial, batch_format="pyarrow"),
        events.schema(), key_col, value_col, num_buckets,
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
            import pandas as _pd

            bk = (
                _pd.util.hash_array(
                    np.asarray(k.to_pylist(), dtype=object),
                    categorize=False,
                ) % np.uint64(num_buckets)
            ).astype(np.int32)
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

    from .joins import exchange_reduce

    key_t = dict(zip(events.schema().names, events.schema().types))[key_col]
    empty = pa.table(
        {
            key_col: pa.nulls(0, key_t),
            "n_sessions": pa.nulls(0, pa.int64()),
            "n_events": pa.nulls(0, pa.int64()),
        }
    )
    return exchange_reduce(
        events.map_batches(add_bucket, batch_format="pyarrow"),
        lambda t: pa.Table.from_pandas(
            per_bucket(t.to_pandas().drop(columns="__bucket")),
            preserve_index=False,
        ),
        empty, num_buckets,
    )


# --------------------------------------------------------------- cohorts


def retention_cohorts(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 32,
):
    """Retention-cohort matrix: (cohort_day, day, n_users) = how many
    users whose FIRST event fell on cohort_day were active on day.

    Plan: per-batch (user, day) dedup -> ONE user-hash exchange where
    each bucket holds every row of its users, so the per-user min-day
    (the cohort) and the distinct (user, day) activity set are both
    exact in-bucket -> partial (cohort_day, day) counts re-tagged ->
    ONE (cohort_day, day)-hash exchange summing partials. Both reduce
    units are buckets, not keys; user state never leaves its bucket
    and no stage sees the whole table."""
    from .joins import exchange_reduce

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                user_col: batch[user_col].to_numpy(zero_copy_only=False),
                "day": pd.to_datetime(
                    batch[ts_col].to_pandas()
                ).dt.strftime("%Y-%m-%d"),
            }
        ).drop_duplicates()
        uid = df[user_col].to_numpy(np.int64).astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets))
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("__bucket", pa.array(b.astype(np.int32)))

    empty1 = pa.table(
        {
            "cohort_day": pa.array([], pa.string()),
            "day": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        }
    )

    def per_user(t: pa.Table) -> pa.Table:
        df = t.select([user_col, "day"]).to_pandas().drop_duplicates()
        coh = df.groupby(user_col, sort=False)["day"].min().rename(
            "cohort_day"
        )
        df = df.join(coh, on=user_col)
        g = (
            df.groupby(["cohort_day", "day"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype("int64")
        key = (g["cohort_day"] + "|" + g["day"]).to_numpy(dtype=object)
        b = (
            pd.util.hash_array(key, categorize=False)
            % np.uint64(num_buckets)
        ).astype(np.int32)
        out = pa.Table.from_pandas(g, preserve_index=False)
        return out.append_column("__bucket", pa.array(b))

    empty2 = pa.table(
        {
            "cohort_day": pa.array([], pa.string()),
            "day": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def sum_counts(t: pa.Table) -> pa.Table:
        df = t.select(["cohort_day", "day", "n"]).to_pandas()
        g = (
            df.groupby(["cohort_day", "day"], sort=False)["n"]
            .sum()
            .astype("int64")
            .rename("n_users")
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = exchange_reduce(
        events.map_batches(partial, batch_format="pyarrow"),
        per_user, empty1, num_buckets,
    )
    return exchange_reduce(partials, sum_counts, empty2, num_buckets)


def window_distinct_keys(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 3600,
    num_buckets: int = 32,
):
    """-> (window_start:int64, n_distinct:int64): distinct `key_col`
    per tumbling window (the classic "DAU per hour" query).

    Scale shape (two bounded exchanges, the distinct SET never
    assembles anywhere): batch-local (window, key) dedupe combiner ->
    pair-hash exchange (equal pairs co-locate, so each bucket dedupes
    its pairs COMPLETELY and collapses them to per-window partial
    counts) -> window-hash exchange summing the partials (num_buckets
    rows per window, not events)."""
    import numpy as np

    from .joins import exchange_reduce

    def pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64())
        wnd = pc.cast(
            pc.multiply(pc.divide(us, window_sec * 1_000_000), window_sec),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(zero_copy_only=False),
                "window_start": wnd.to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return _win_bucketed(df, key_col, num_buckets)

    empty_pairs_out = pa.table(
        {
            "window_start": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "__bucket": pa.nulls(0, pa.int32()),
        }
    )

    def dedupe_and_count(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas().drop_duplicates(
            [key_col, "window_start"]
        )
        g = df.groupby("window_start", sort=False).size().reset_index(name="n")
        w = g["window_start"].to_numpy().astype(np.int64)
        bk = (
            (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "window_start": pa.array(w),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "__bucket": pa.array(bk),
            }
        )

    partial_counts = exchange_reduce(
        events.map_batches(pairs, batch_format="pyarrow"),
        dedupe_and_count, empty_pairs_out, num_buckets,
    )

    empty_out = pa.table(
        {
            "window_start": pa.nulls(0, pa.int64()),
            "n_distinct": pa.nulls(0, pa.int64()),
        }
    )

    def sum_partials(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        out = df.groupby("window_start", sort=False, as_index=False)["n"].sum()
        return pa.table(
            {
                "window_start": pa.array(
                    out["window_start"].to_numpy().astype(np.int64)
                ),
                "n_distinct": pa.array(out["n"].to_numpy().astype(np.int64)),
            }
        )

    return exchange_reduce(
        partial_counts, sum_partials, empty_out, num_buckets
    )


# ---------------------------------------------------------------- funnels


def funnel_stages(
    events,
    steps,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 32,
):
    """Ordered-funnel analysis (the product-analytics primitive:
    view -> click -> purchase): per user, the number of leading funnel
    steps completed by a STRICTLY time-increasing event chain — step
    s+1 counts only if some matching event is later than the earliest
    valid completion of step s (min-ts chaining, the standard funnel
    definition). Users with events but no step-1 event report stage 0.
    Returns (user_col, "stage").

    Scale shape: the routing pass ships only funnel-step events plus
    one sentinel row per distinct user per batch (the user universe),
    through ONE user-hash exchange; each bucket owns all rows of its
    users, so the per-step chained min is exact in-bucket — one
    vectorized pandas pass per funnel step, never per user. Output is
    one row per user; no stage sees the whole log."""
    from .joins import exchange_reduce

    steps = list(steps)

    def route(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                user_col: batch[user_col].to_numpy(zero_copy_only=False),
                type_col: batch[type_col].to_numpy(zero_copy_only=False),
                ts_col: batch[ts_col].to_pandas(),
            }
        )
        fun = df[df[type_col].isin(steps)]
        sent = df[[user_col]].drop_duplicates()
        sent[type_col] = ""
        sent[ts_col] = pd.NaT
        out = pd.concat([fun, sent], ignore_index=True)
        uid = out[user_col].to_numpy(np.int64).astype(np.uint64)
        b = (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        t = pa.Table.from_pandas(out, preserve_index=False)
        return t.append_column("__bucket", pa.array(b.astype(np.int32)))

    empty = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "stage": pa.array([], pa.int64()),
        }
    )

    def per_user(t: pa.Table) -> pa.Table:
        df = t.select([user_col, type_col, ts_col]).to_pandas()
        if not len(df):
            return empty
        users = pd.Index(df[user_col].unique())
        stage = pd.Series(0, index=users, dtype=np.int64)
        # threshold = earliest valid completion ts of the previous step
        thr = pd.Series(pd.Timestamp.min, index=users)
        alive = users
        for s, step in enumerate(steps, start=1):
            sub = df[df[type_col].eq(step) & df[user_col].isin(alive)]
            if not len(sub):
                break
            cut = thr.reindex(sub[user_col]).to_numpy()
            sub = sub[sub[ts_col].to_numpy() > cut]
            nxt = sub.groupby(user_col, sort=False)[ts_col].min()
            if not len(nxt):
                break
            stage.loc[nxt.index] = s
            thr = nxt
            alive = nxt.index
        return pa.table(
            {
                user_col: pa.array(stage.index.to_numpy(), pa.int64()),
                "stage": pa.array(stage.to_numpy(), pa.int64()),
            }
        )

    return exchange_reduce(
        events.map_batches(route, batch_format="pyarrow"),
        per_user, empty, num_buckets,
    )


def event_transitions(
    events,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 32,
):
    """First-order transition census over per-user event sequences:
    (prev_type, next_type, n) counts of consecutive events, each
    user's stream ordered by (ts, event id) — the Markov-chain /
    session-model input. Returns #event-types^2-bounded rows.

    Scale shape: ONE user-hash exchange co-locates each user's events;
    in-bucket one mergesort + a shifted-column compare produces the
    bucket's (prev, next) partial counts (vectorized, no per-user
    loop); a final groupby folds #buckets partials into the bounded
    transition matrix. The id tiebreak makes ordering — and therefore
    the counts — engine-independent even under equal timestamps."""
    from ray.data.aggregate import Sum

    from .joins import exchange_reduce

    def route(batch: pa.Table) -> pa.Table:
        t = batch.select([user_col, type_col, ts_col, id_col])
        uid = t[user_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return t.append_column("__bucket", pa.array(b.astype(np.int32)))

    empty = pa.table(
        {
            "prev_type": pa.array([], pa.string()),
            "next_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.select([user_col, type_col, ts_col, id_col]).to_pandas()
        if len(df) < 2:
            return empty
        df = df.sort_values(
            [user_col, ts_col, id_col], kind="mergesort"
        )
        u = df[user_col].to_numpy()
        ty = df[type_col].to_numpy()
        same = u[1:] == u[:-1]
        g = pd.DataFrame(
            {"prev_type": ty[:-1][same], "next_type": ty[1:][same]}
        ).groupby(["prev_type", "next_type"], as_index=False).size()
        return pa.table(
            {
                "prev_type": pa.array(g["prev_type"].tolist(), pa.string()),
                "next_type": pa.array(g["next_type"].tolist(), pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = exchange_reduce(
        events.map_batches(route, batch_format="pyarrow"),
        per_bucket, empty, num_buckets,
    )
    return parts.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n")
    )


def spike_windows(
    events,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    factor: int = 2,
    num_buckets: int = 8,
):
    """Volume-anomaly detection: tumbling windows whose event count
    exceeds `factor` x the key's mean window volume — the basic
    traffic-spike / hot-topic monitor over an event stream.

    The test is INTEGER-EXACT (no float mean):
        n * n_windows > factor * total_n        (per key)
    evaluated in Python big-ints per bucket so it cannot overflow —
    cross-engine identical to the oracle's HUGEINT compare.

    Shape: the existing tumbling-window combiner tree (per-batch
    partials, one window-key exchange) followed by ONE key-hash
    exchange of the (key, window) count table — per-key state there
    is bounded by that key's window count, not its event count.
    Output: (key, window_start, n_events) for flagged windows."""
    from .joins import exchange_reduce

    wins = tumbling_window_agg(
        events, key_col=key_col, ts_col=ts_col, value_col=value_col,
        window_sec=window_sec, num_buckets=num_buckets,
    )

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, "window_start", "n_events"])
        keys = np.asarray(t[key_col].to_pylist(), dtype=object)
        bk = (
            pd.util.hash_array(keys, categorize=False)
            % np.uint64(num_buckets)
        ).astype(np.int32) if len(keys) else np.zeros(0, dtype=np.int32)
        return t.append_column("__bucket", pa.array(bk))

    empty = pa.table(
        {
            key_col: pa.array([], pa.string()),
            "window_start": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def flag(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "window_start", "n_events"]).to_pandas()
        out = []
        for _, g in df.groupby(key_col, sort=False):
            ns = [int(x) for x in g["n_events"]]
            tn, nw = sum(ns), len(ns)
            keep = [n * nw > factor * tn for n in ns]
            out.append(g[np.asarray(keep, dtype=bool)])
        got = (
            pd.concat(out, ignore_index=True)
            if out else df.iloc[0:0]
        )
        return pa.table(
            {
                key_col: pa.array(got[key_col], pa.string()),
                "window_start": pa.array(
                    got["window_start"].to_numpy(np.int64)
                ),
                "n_events": pa.array(got["n_events"].to_numpy(np.int64)),
            }
        )

    return exchange_reduce(
        wins.map_batches(tag, batch_format="pyarrow"),
        flag, empty, num_buckets,
    )


def user_gap_median(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 32,
):
    """Per-key inter-event gap median — the cadence feature behind
    bot/burst detection and session-gap tuning. Returns (key, n_gaps,
    median_gap_us) for every key with >= 2 events.

    INTEGER-EXACT: gaps are microsecond int64 diffs of the
    ts-sorted event sequence and the median is the LOWER middle
    element (index (n-1)//2 of the sorted gaps), so no float
    interpolation enters the value hash. Equal timestamps produce
    zero gaps regardless of tie order, keeping the statistic
    deterministic without a tiebreaker column.

    Shape: ONE key-hash exchange; inside a bucket both sorts are
    vectorized over all of the bucket's keys at once (session_windows
    precedent); per-key state is that key's event count."""
    from .joins import exchange_reduce

    sch = events.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col])
        k = t[key_col].to_numpy(zero_copy_only=False)
        bk = (_key_mix(k) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(bk))

    empty = pa.table(
        {
            key_col: pa.array([], key_type),
            "n_gaps": pa.array([], pa.int64()),
            "median_gap_us": pa.array([], pa.int64()),
        }
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col]).to_pandas()
        if not len(df):
            return empty
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64")
        k = df[key_col].to_numpy()
        gap = ts_us.diff()
        same = np.concatenate([[False], k[1:] == k[:-1]])
        g = pd.DataFrame(
            {key_col: k[same], "gap": gap.to_numpy()[same]}
        ).sort_values([key_col, "gap"], kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        n = grp["gap"].transform("size").to_numpy()
        pick = grp.cumcount().to_numpy() == (n - 1) // 2
        out = g[pick]
        return pa.table(
            {
                key_col: pa.array(
                    out[key_col].to_numpy(), type=key_type
                ),
                "n_gaps": pa.array(n[pick].astype(np.int64)),
                "median_gap_us": pa.array(
                    out["gap"].to_numpy(np.int64)
                ),
            }
        )

    return exchange_reduce(
        events.map_batches(tag, batch_format="pyarrow"),
        reduce_fn, empty, num_buckets,
    )


def rolling_distinct_keys(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 7 * 86400,
    hop_sec: int = 86400,
    num_buckets: int = 32,
):
    """-> (window_start:int64, n_distinct:int64): distinct `key_col`
    per HOPPING window — the rolling-7-day-actives (WAU-per-day)
    census. window_sec must be a multiple of hop_sec.

    Scale shape (window_distinct_keys precedent, the distinct set
    never assembles): the batch combiner first dedupes to (key,
    hop-bucket) pairs — a key active 1000x in a day explodes ONCE —
    then fans each pair out to the window/hop windows it belongs to;
    the pair-hash exchange dedupes completely in-bucket and collapses
    to per-window partials; one window-hash exchange sums them."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    w_per_h = window_sec // hop_sec

    from .joins import exchange_reduce

    def pairs(batch: pa.Table) -> pa.Table:
        t_us = pc.cast(batch[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = t_us // (hop_sec * 1_000_000)
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(zero_copy_only=False),
                "__d": day,
            }
        ).drop_duplicates()
        k = np.repeat(df[key_col].to_numpy(), w_per_h)
        d = np.repeat(df["__d"].to_numpy(), w_per_h)
        offs = np.tile(np.arange(w_per_h, dtype=np.int64), len(df))
        g = pd.DataFrame(
            {
                key_col: k,
                "window_start": (d - offs) * hop_sec,
            }
        ).drop_duplicates()
        return _win_bucketed(g, key_col, num_buckets)

    empty_pairs_out = pa.table(
        {
            "window_start": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "__bucket": pa.nulls(0, pa.int32()),
        }
    )

    def dedupe_and_count(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas().drop_duplicates(
            [key_col, "window_start"]
        )
        g = df.groupby("window_start", sort=False).size().reset_index(
            name="n"
        )
        w = g["window_start"].to_numpy().astype(np.int64)
        bk = (
            (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "window_start": pa.array(w),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "__bucket": pa.array(bk),
            }
        )

    partial_counts = exchange_reduce(
        events.map_batches(pairs, batch_format="pyarrow"),
        dedupe_and_count, empty_pairs_out, num_buckets,
    )

    empty_out = pa.table(
        {
            "window_start": pa.nulls(0, pa.int64()),
            "n_distinct": pa.nulls(0, pa.int64()),
        }
    )

    def sum_partials(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas()
        out = df.groupby("window_start", sort=False, as_index=False)[
            "n"
        ].sum()
        return pa.table(
            {
                "window_start": pa.array(
                    out["window_start"].to_numpy().astype(np.int64)
                ),
                "n_distinct": pa.array(
                    out["n"].to_numpy().astype(np.int64)
                ),
            }
        )

    return exchange_reduce(
        partial_counts, sum_partials, empty_out, num_buckets
    )


def session_stats(
    events,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 3600,
    num_buckets: int = 64,
):
    """Per-session listing: (key, session_idx 1-based in time order,
    n_events, duration_us) — the session-LEVEL detail behind
    session_windows' per-key rollup (same gap rule, same bucketed
    vectorized shape; durations are integer microsecond spans so the
    value hash is float-free)."""
    from .joins import exchange_reduce

    sch = events.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        bk = (_key_mix(k) % np.uint64(num_buckets)).astype(np.int32)
        return batch.select([key_col, ts_col]).append_column(
            "__bucket", pa.array(bk)
        )

    empty = pa.table(
        {
            key_col: pa.array([], key_type),
            "session_idx": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "duration_us": pa.array([], pa.int64()),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col]).to_pandas()
        if not len(df):
            return empty
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        diffs = df[ts_col].diff().dt.total_seconds()
        same_key = df[key_col].eq(df[key_col].shift())
        new_s = ((diffs > gap_sec) & same_key).astype("int64")
        df = df.assign(__sid=new_s.groupby(
            df[key_col], sort=False
        ).cumsum() + 1)
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        df = df.assign(__us=us)
        g = df.groupby([key_col, "__sid"], sort=False).agg(
            n_events=(ts_col, "size"), mn=("__us", "min"),
            mx=("__us", "max"),
        ).reset_index()
        return pa.table(
            {
                key_col: pa.array(g[key_col].to_numpy(), type=key_type),
                "session_idx": pa.array(g["__sid"].to_numpy(np.int64)),
                "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
                "duration_us": pa.array(
                    (g["mx"] - g["mn"]).to_numpy(np.int64)
                ),
            }
        )

    return exchange_reduce(
        events.map_batches(add_bucket, batch_format="pyarrow"),
        per_bucket, empty, num_buckets,
    )
