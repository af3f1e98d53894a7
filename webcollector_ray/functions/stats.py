"""Grouped moment statistics with broadcast normalization.

The shape: per-block integer partial moments (count / sum / sum-of-
squares) -> ONE tiny key exchange over the partials -> the per-key
moments table (rows = #groups, not #rows) is collected and broadcast
via ray.put -> a second streaming pass normalizes every row against
its group's moments. The fact table itself is never shuffled; only
#groups x 4 integers move. This is the `x - AVG(x) OVER (PARTITION BY
k)` window shape without a window sort.

Partitioning assumption: the number of DISTINCT groups fits in one
task / the driver (thousands, not billions) — the same knee as every
broadcast join in this repo. Above it, swap the ray.put for a key-hash
exchange carrying the moments alongside the rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_moments(ds, *, key_col: str, val_col: str,
                    num_buckets: int = 16):
    """Per-key (cnt, sum, sumsq) over an INTEGER value column, exact.

    Partials are int64 per block; the cross-block fold sums as Python
    ints via pandas object dtype only at the final reduce, so a 100 TB
    sumsq cannot silently wrap (int64 partials per block are safe: a
    block holds << 2^63 / max(val)^2 rows; shift values by a per-group
    anchor before squaring if that ever stops holding)."""
    from .joins import exchange_reduce

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch[key_col].to_pandas(),
                "v": batch[val_col].to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        df["v2"] = df["v"] * df["v"]
        g = df.groupby("k", sort=False, dropna=False).agg(
            cnt=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        ).reset_index()
        b = (
            pd.util.hash_array(
                g["k"].to_numpy(object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                key_col: pa.Array.from_pandas(g["k"]),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
                "s": pa.array(g["s"].to_numpy(np.int64)),
                "s2": pa.array(g["s2"].to_numpy(np.int64)),
                "__bucket": pa.array(b),
            }
        )

    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]
    empty = pa.table(
        {
            key_col: pa.nulls(0, key_type),
            "cnt": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "s2": pa.array([], pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "cnt", "s", "s2"]).to_pandas()
        # object dtype => Python-int addition, no wraparound
        for c in ("cnt", "s", "s2"):
            df[c] = df[c].astype(object)
        g = df.groupby(
            key_col, sort=False, dropna=False, as_index=False
        ).sum()
        return pa.table(
            {
                key_col: pa.Array.from_pandas(g[key_col], type=key_type),
                "cnt": pa.array([int(x) for x in g["cnt"]], pa.int64()),
                "s": pa.array([int(x) for x in g["s"]], pa.int64()),
                "s2": pa.array([int(x) for x in g["s2"]], pa.int64()),
            }
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold, empty, num_buckets,
    )


def rollup_counts(ds, *, keys, val_col: str, num_buckets: int = 16,
                  n_name: str = "n_rows", sum_name: str = "sum_val"):
    """GROUP BY ROLLUP(k1, k2, ...): count + sum at every prefix level
    of the key hierarchy, coarser levels NULL-padded (ANSI ROLLUP
    semantics). Ray Data has no grouping-sets primitive; the shape
    here: per-block partials collapse the fact table to the FINEST
    grouping through one hash exchange, and every coarser level is
    derived from that (tiny) aggregate — the fact table is read once
    and never re-shuffled per level.

    Partitioning assumption: the finest group count fits in one task
    (product of key cardinalities — thousands/millions, not the row
    count); above that, derive each level with its own exchange."""
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [val_col]).to_pandas()
        g = df.groupby(keys, sort=False, dropna=False).agg(
            __n=(val_col, "size"), __s=(val_col, "sum")
        ).reset_index()
        kh = pd.util.hash_pandas_object(g[keys], index=False).to_numpy()
        g["__bucket"] = (kh % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    sch = dict(zip(ds.schema().names, ds.schema().types))
    empty = pa.table(
        {
            **{k: pa.nulls(0, sch[k]) for k in keys},
            "__n": pa.array([], pa.int64()),
            "__s": pa.array([], pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.select(keys + ["__n", "__s"]).to_pandas()
        g = df.groupby(keys, sort=False, dropna=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            empty.schema
        )

    from .joins import exchange_reduce

    finest = exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold, empty, num_buckets,
    ).to_pandas()

    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        lvl_keys = keys[:depth]
        if lvl_keys:
            g = finest.groupby(
                lvl_keys, sort=False, dropna=False, as_index=False
            )[["__n", "__s"]].sum()
        else:
            g = pd.DataFrame(
                {"__n": [finest["__n"].sum()], "__s": [finest["__s"].sum()]}
            )
        for k in keys[depth:]:
            g[k] = None
        levels.append(g[keys + ["__n", "__s"]])
    out = pd.concat(levels, ignore_index=True)
    return pa.table(
        {
            **{
                k: pa.Array.from_pandas(out[k], type=sch[k])
                for k in keys
            },
            n_name: pa.array(out["__n"].to_numpy(np.int64)),
            sum_name: pa.array(out["__s"].to_numpy(np.int64)),
        }
    )


def weighted_sample(ds, *, id_col: str, weight_col: str, k: int):
    """Deterministic weighted sample WITHOUT replacement, k rows:
    A-ES / exponential-clocks (Efraimidis & Spirakis 2006) with the
    uniform derived from md5(id) instead of an RNG — priority =
    ln(u) / w, top-k by priority. Fully reproducible across runs,
    cluster sizes and block layouts (no seed state, no RNG order
    dependence), and oracle-checkable since the SQL side derives the
    identical uniforms from the same md5.

    Shape: one streaming pass computes priorities per batch; top-k
    survives per block then one tree reduce — never a global sort.
    Rows with weight <= 0 are excluded (zero draw probability)."""
    import hashlib

    DEN = 16 ** 13 + 1

    def prio(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        h = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
                for i in ids
            ),
            np.float64, len(ids),
        )
        u = (h + 1.0) / DEN
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.log(u) / w
        t = batch.append_column("priority", pa.array(p, pa.float64()))
        return t.filter(pa.array(w > 0))

    from .ranking import global_top_n

    return global_top_n(
        ds.map_batches(prio, batch_format="pyarrow"),
        order_col="priority", n=k, tie_col=id_col,
    )


def grouped_mode(ds, *, key_col: str, val_col: str,
                 num_buckets: int = 16):
    """Per-key MODE with deterministic ties (most frequent val, ties
    by val ascending) — the `row_number() OVER (PARTITION BY k ORDER
    BY n DESC, v ASC) = 1` shape over a count table.

    One exchange total: per-block (key, val) partial counts collapse
    the fact table first, the key-hash exchange folds partials and
    picks each key's argmax inside the same reduce task — the count
    table never makes a second hop."""
    from .joins import exchange_reduce

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False, dropna=False).size().rename(
            "n"
        ).reset_index()
        kh = pd.util.hash_array(
            g[key_col].to_numpy(object), categorize=False
        )
        g["__bucket"] = (kh % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    sch = dict(zip(ds.schema().names, ds.schema().types))
    empty = pa.table(
        {
            key_col: pa.nulls(0, sch[key_col]),
            val_col: pa.nulls(0, sch[val_col]),
            "n": pa.array([], pa.int64()),
        }
    )

    def fold_argmax(t: pa.Table) -> pa.Table:
        df = t.select([key_col, val_col, "n"]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False, dropna=False,
                       as_index=False)[
            "n"
        ].sum()
        g = g.sort_values(
            [key_col, "n", val_col], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(key_col, keep="first")
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            empty.schema
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold_argmax, empty, num_buckets,
    )


def grouped_running_sum(ds, *, key_col: str, order_cols, val_col: str,
                        out_col: str = "running", num_buckets: int = 32):
    """Running cumulative sum per key in event order — `sum(v) OVER
    (PARTITION BY k ORDER BY o1, o2)`. Ray Data has no ordered-window
    primitive; the shape: ONE key-hash exchange co-locates each key's
    rows, then a vectorized per-bucket sort + groupby-cumsum. No
    global sort — ordering is only ever established within a bucket,
    and additions run per-key in event order, so any float divergence
    from a SQL engine's window implementation (e.g. a segment-tree
    fold) stays far inside the oracle's 6-decimal rounding."""
    from .joins import exchange_reduce

    order_cols = list(order_cols)
    sch = dict(zip(ds.schema().names, ds.schema().types))
    names = ds.schema().names
    empty = pa.table(
        {
            **{c: pa.nulls(0, sch[c]) for c in names},
            out_col: pa.array([], pa.float64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        from .joins import _bucket_ids

        # the shared int/string dtype branch lives in ONE place
        return batch.append_column(
            "__bucket", pa.array(_bucket_ids(batch[key_col], num_buckets))
        )

    def cumsum(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["__bucket"]).to_pandas().sort_values(
            [key_col] + order_cols, kind="mergesort"
        )
        df[out_col] = df.groupby(
            key_col, sort=False, dropna=False
        )[val_col].cumsum()
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            empty.schema
        )

    return exchange_reduce(
        ds.map_batches(tag, batch_format="pyarrow"),
        cumsum, empty, num_buckets,
    )


def grouped_corr(ds, *, key_col: str, x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 1,
                 num_buckets: int = 16):
    """Pearson correlation of two fixed-point numeric columns per key,
    from EXACT integer moments: x/y are scaled to integers (x_scale /
    y_scale, e.g. 100 for cents), per-block partial sums (n, Σx, Σy,
    Σxy, Σx², Σy²) ride ONE tiny key exchange, the final fold adds as
    Python ints (no wraparound), and corr is evaluated once per group
    in float64. Correlation is scale-invariant, so the result equals
    corr() over the raw values — distributed-summation float drift is
    structurally impossible, not just unlikely."""
    from .joins import exchange_reduce

    mom = ["n", "sx", "sy", "sxy", "sxx", "syy"]

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_pandas()
        x = np.rint(
            batch[x_col].to_numpy(zero_copy_only=False) * x_scale
        ).astype(np.int64)
        y = np.rint(
            batch[y_col].to_numpy(zero_copy_only=False) * y_scale
        ).astype(np.int64)
        df = pd.DataFrame(
            {"k": k, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
             "syy": y * y}
        )
        df["n"] = 1
        g = df.groupby("k", sort=False, dropna=False, as_index=False)[mom].sum()
        kh = pd.util.hash_array(
            g["k"].to_numpy(object), categorize=False
        )
        g["__bucket"] = (kh % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(
            g.rename(columns={"k": key_col}), preserve_index=False
        )

    sch = dict(zip(ds.schema().names, ds.schema().types))
    empty = pa.table(
        {
            key_col: pa.nulls(0, sch[key_col]),
            "n": pa.array([], pa.int64()),
            "corr_xy": pa.array([], pa.float64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.select([key_col] + mom).to_pandas()
        for c in mom:
            df[c] = df[c].astype(object)  # Python-int fold
        g = df.groupby(key_col, sort=False, dropna=False, as_index=False).sum()
        corrs = []
        for _, r in g.iterrows():
            n, sx, sy, sxy, sxx, syy = (int(r[c]) for c in mom)
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            corrs.append(
                float(cov) / float(np.sqrt(float(vx) * float(vy)))
                if vx > 0 and vy > 0 else None
            )
        return pa.table(
            {
                key_col: pa.Array.from_pandas(
                    g[key_col], type=sch[key_col]
                ),
                "n": pa.array([int(x) for x in g["n"]], pa.int64()),
                "corr_xy": pa.array(corrs, pa.float64()),
            }
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold, empty, num_buckets,
    )


def zscore_by(ds, *, key_col: str, val_col: str, out_col: str = "z",
              keep_cols=None, num_buckets: int = 16):
    """Population z-score of val_col within each key_col group:
    `(v - avg(v) OVER (PARTITION BY k)) / stddev_pop(v) OVER (...)`.
    A zero-variance group yields NULL (matching SQL's x / 0.0e0).

    Two streaming passes over the fact table, zero fact shuffles: the
    exact integer moments are broadcast once (ray.put) and every batch
    normalizes against the in-heap dict."""
    import ray

    moments = grouped_moments(
        ds, key_col=key_col, val_col=val_col, num_buckets=num_buckets
    )
    mt = moments.to_pandas()
    stats = {}
    for k, cnt, s, s2 in zip(mt[key_col], mt["cnt"], mt["s"], mt["s2"]):
        cnt, s, s2 = int(cnt), int(s), int(s2)
        mean = s / cnt
        # exact integer numerator: cnt*s2 - s^2 = cnt^2 * variance
        var = (cnt * s2 - s * s) / (cnt * cnt)
        stats[k] = (mean, float(np.sqrt(var)))
    stats_ref = ray.put(stats)
    cols = list(keep_cols) if keep_cols is not None else ds.schema().names

    def norm(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        keys = batch[key_col].to_pylist()
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # .get: a NULL int key reaches the moments dict as NaN but
        # to_pylist as None — degrade to NaN z instead of KeyError
        nan2 = (np.nan, np.nan)
        mean = np.fromiter(
            (st.get(k, nan2)[0] for k in keys), np.float64, len(keys)
        )
        std = np.fromiter(
            (st.get(k, nan2)[1] for k in keys), np.float64, len(keys)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - mean) / std
        out = batch.select(cols)
        return out.append_column(
            out_col, pa.array(np.where(std == 0.0, np.nan, z), pa.float64(),
                              mask=(std == 0.0)),
        )

    return ds.map_batches(norm, batch_format="pyarrow")
