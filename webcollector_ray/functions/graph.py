"""Link-graph PageRank — the classic web-corpus quality signal
(Page et al. 1999), used by web-scale training pipelines to weight
documents by link authority.

Fixed-iteration, FIXED-POINT integer PageRank so the whole fixpoint
is cross-engine exact (kmeans_fixed precedent): ranks live as int64
micro-units (SCALE = 10^12), per-edge contributions are floor
divisions r // outdeg, and the damping update is
``base + (85 * s) // 100`` with ``base = (15 * (SCALE // N)) // 100``
— integer adds are order-free, so the distributed sums equal the SQL
oracle bit-for-bit regardless of block order.

Distribution shape per iteration: TWO bucket exchanges —
(1) ranks join their src-bucketed edges (all edges of a src live in
one bucket, where outdeg was counted in the same pass), emitting
(dst, contribution) rows; (2) contributions sum per dst alongside the
co-bucketed node markers, emitting the new rank row for every node
(no-inlink nodes get the base). Nothing is all-to-all beyond the
bucket hash, and rank state never collects on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12


def _tag_by(col_vals, num_buckets: int) -> np.ndarray:
    t = np.asarray(col_vals, dtype=object)
    if not len(t):
        return np.zeros(0, dtype=np.int32)
    return (
        pd.util.hash_array(t, categorize=False) % np.uint64(num_buckets)
    ).astype(np.int32)


def pagerank_fixed(
    edges_ds,
    *,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
):
    """edges (src, dst; multi-edges count) -> Dataset (url, pr_fp) with
    pr_fp the int64 fixed-point rank after `iters` damped iterations.
    N (node count) is the only scalar on the driver."""
    from .joins import exchange_reduce

    def tag_edges(batch: pa.Table) -> pa.Table:
        out = batch.select([src_col, dst_col])
        return out.append_column(
            "__bucket", pa.array(_tag_by(out[src_col].to_pylist(), num_buckets))
        )

    edges_empty = pa.table(
        {
            src_col: pa.array([], pa.string()),
            dst_col: pa.array([], pa.string()),
            "outdeg": pa.array([], pa.int64()),
        }
    )

    def with_outdeg(t: pa.Table) -> pa.Table:
        df = t.select([src_col, dst_col]).to_pandas()
        df["outdeg"] = df.groupby(src_col, sort=False)[src_col].transform(
            "size"
        ).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    # one exchange: co-locate each src's edges, count outdeg in place;
    # blocks stay src-bucketed for every later iteration
    edges = exchange_reduce(
        edges_ds.map_batches(tag_edges, batch_format="pyarrow"),
        with_outdeg, edges_empty, num_buckets,
    ).materialize()

    # node set = distinct src union dst, bucketed by the same hash
    def node_rows(batch: pa.Table) -> pa.Table:
        vs = list(
            dict.fromkeys(
                batch[src_col].to_pylist() + batch[dst_col].to_pylist()
            )
        )
        return pa.table(
            {
                "url": pa.array(vs, pa.string()),
                "__bucket": pa.array(_tag_by(vs, num_buckets)),
            }
        )

    nodes_empty = pa.table({"url": pa.array([], pa.string())})

    def distinct_nodes(t: pa.Table) -> pa.Table:
        vs = sorted(set(t["url"].to_pylist()))
        return pa.table({"url": pa.array(vs, pa.string())})

    nodes = exchange_reduce(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        distinct_nodes, nodes_empty, num_buckets,
    ).materialize()
    n_nodes = nodes.count()
    r_init = SCALE // n_nodes
    base = (15 * r_init) // 100

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "pr_fp": pa.array(
                    np.full(len(batch), r_init, dtype=np.int64)
                ),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow")

    contrib_empty = pa.table(
        {dst_col: pa.array([], pa.string()), "c": pa.array([], pa.int64())}
    )
    ranks_empty = pa.table(
        {"url": pa.array([], pa.string()), "pr_fp": pa.array([], pa.int64())}
    )

    # unified schemas for the two per-iteration exchanges (joins.py
    # pad/tag precedent: Dataset.union requires matching columns)
    J1 = [src_col, dst_col, "outdeg", "pr_fp"]  # src-keyed join input
    J2 = ["url", dst_col, "c"]                  # dst-keyed update input

    def _pad(batch: pa.Table, cols, types, key_col) -> pa.Table:
        n = len(batch)
        out = pa.table(
            {
                c: (
                    batch[c]
                    if c in batch.column_names
                    else pa.nulls(n, types[c])
                )
                for c in cols
            }
        )
        return out.append_column(
            "__bucket",
            pa.array(_tag_by(batch[key_col].to_pylist(), num_buckets)),
        )

    j1_types = {
        src_col: pa.string(), dst_col: pa.string(),
        "outdeg": pa.int64(), "pr_fp": pa.int64(),
    }
    j2_types = {"url": pa.string(), dst_col: pa.string(), "c": pa.int64()}

    def tag_rank_as_src(batch: pa.Table) -> pa.Table:
        # rank rows enter the src-keyed exchange under the src column
        b = pa.table(
            {src_col: batch["url"], "pr_fp": batch["pr_fp"]}
        )
        return _pad(b, J1, j1_types, src_col)

    def contribs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        e = df[df[dst_col].notna()][[src_col, dst_col, "outdeg"]]
        r = df[df[dst_col].isna()][[src_col, "pr_fp"]]
        if not len(e) or not len(r):
            return contrib_empty
        m = e.merge(r, on=src_col)
        c = (
            m["pr_fp"].to_numpy(np.int64)
            // m["outdeg"].to_numpy(np.int64)
        )
        return pa.table(
            {
                dst_col: pa.array(m[dst_col].tolist(), pa.string()),
                "c": pa.array(c),
            }
        )

    def update(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        marks = df[df["url"].notna()][["url"]]
        cs = df[df["url"].isna()][[dst_col, "c"]]
        s = (
            cs.groupby(dst_col, sort=False)["c"].sum().astype("int64")
            if len(cs) else pd.Series(dtype="int64")
        )
        sv = marks["url"].map(s).fillna(0).astype("int64").to_numpy()
        new_r = base + (85 * sv) // 100
        return pa.table(
            {
                "url": pa.array(marks["url"].tolist(), pa.string()),
                "pr_fp": pa.array(new_r.astype(np.int64)),
            }
        )

    for _ in range(iters):
        joined = edges.map_batches(
            lambda b: _pad(b, J1, j1_types, src_col),
            batch_format="pyarrow",
        ).union(
            ranks.map_batches(tag_rank_as_src, batch_format="pyarrow")
        )
        contrib = exchange_reduce(
            joined, contribs, contrib_empty, num_buckets
        )
        j2 = nodes.map_batches(
            lambda b: _pad(b, J2, j2_types, "url"), batch_format="pyarrow"
        ).union(
            contrib.map_batches(
                lambda b: _pad(b, J2, j2_types, dst_col),
                batch_format="pyarrow",
            )
        )
        ranks = exchange_reduce(j2, update, ranks_empty, num_buckets)
    return ranks


HITS_SCALE = 10**9


def hits_fixed(
    edges_ds,
    *,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
):
    """Integer fixed-point HITS (Kleinberg 1999): hub/authority scores
    over the link multiset, the complementary link-quality signal to
    PageRank (authorities = heavily-cited content pages, hubs = link
    directories — both curation features for web corpora).

    Exactness contract (pagerank_fixed precedent): scores live as
    int64 units of HITS_SCALE; each half-iteration is an integer
    contribution sum followed by L1 normalization
    ``score * SCALE // total`` — the one multiply that can exceed
    int64 runs in Python big-ints per bucket (node-count-bounded), so
    the fixpoint equals the SQL oracle bit-for-bit in any block order.

    Distribution shape per iteration: authority pass = one src-keyed
    exchange (edges co-located with hub scores, emitting (dst, h))
    into one dst-keyed summing exchange; hub pass mirrors it via the
    dst-bucketed edge copy; each normalization total is a bounded
    #buckets-partial aggregate. Score state never collects on the
    driver beyond that scalar."""
    from ray.data.aggregate import Sum

    from .joins import exchange_reduce

    def tag(batch: pa.Table, key: str) -> pa.Table:
        return batch.append_column(
            "__bucket",
            pa.array(_tag_by(batch[key].to_pylist(), num_buckets)),
        )

    ident = lambda t: t  # noqa: E731 — exchange as a pure re-bucketer

    e_empty = pa.table(
        {src_col: pa.array([], pa.string()),
         dst_col: pa.array([], pa.string())}
    )
    edges_src = exchange_reduce(
        edges_ds.map_batches(
            lambda b: tag(b.select([src_col, dst_col]), src_col),
            batch_format="pyarrow",
        ),
        lambda t: t.select([src_col, dst_col]), e_empty, num_buckets,
    ).materialize()
    edges_dst = exchange_reduce(
        edges_ds.map_batches(
            lambda b: tag(b.select([src_col, dst_col]), dst_col),
            batch_format="pyarrow",
        ),
        lambda t: t.select([src_col, dst_col]), e_empty, num_buckets,
    ).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        vs = list(
            dict.fromkeys(
                batch[src_col].to_pylist() + batch[dst_col].to_pylist()
            )
        )
        return pa.table(
            {"url": pa.array(vs, pa.string()),
             "__bucket": pa.array(_tag_by(vs, num_buckets))}
        )

    nodes_empty = pa.table({"url": pa.array([], pa.string())})
    nodes = exchange_reduce(
        edges_src.map_batches(node_rows, batch_format="pyarrow"),
        lambda t: pa.table(
            {"url": pa.array(sorted(set(t["url"].to_pylist())), pa.string())}
        ),
        nodes_empty, num_buckets,
    ).materialize()
    n_nodes = nodes.count()
    s0 = HITS_SCALE // max(1, n_nodes)

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"url": batch["url"],
             "s": pa.array(np.full(len(batch), s0, dtype=np.int64))}
        )

    hub = nodes.map_batches(init_scores, batch_format="pyarrow")

    c_empty = pa.table(
        {"v": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
    )
    s_empty = pa.table(
        {"url": pa.array([], pa.string()), "s": pa.array([], pa.int64())}
    )

    def _half(edges_k, scores, join_key: str, emit_key: str):
        """One HITS half-step: join scores (on join_key) to the
        co-bucketed edge copy, emit (emit_key's node, score) rows,
        sum per node over the node markers, L1-normalize."""
        cols = [src_col, dst_col, "s"]
        types = {src_col: pa.string(), dst_col: pa.string(),
                 "s": pa.int64()}

        def pad(batch: pa.Table, key: str) -> pa.Table:
            n = len(batch)
            out = pa.table(
                {c: (batch[c] if c in batch.column_names
                     else pa.nulls(n, types[c])) for c in cols}
            )
            return out.append_column(
                "__bucket",
                pa.array(_tag_by(out[key].to_pylist(), num_buckets)),
            )

        def score_as_key(batch: pa.Table) -> pa.Table:
            b = pa.table({join_key: batch["url"], "s": batch["s"]})
            return pad(b, join_key)

        def gather(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            e = df[df[emit_key].notna() if emit_key != join_key
                   else df["s"].isna()]
            e = e[[src_col, dst_col]][df["s"].isna()] \
                if emit_key == join_key else e[[src_col, dst_col]]
            r = df[df["s"].notna()][[join_key, "s"]]
            if not len(e) or not len(r):
                return c_empty
            m = e.merge(r, on=join_key)
            return pa.table(
                {"v": pa.array(m[emit_key].tolist(), pa.string()),
                 "c": pa.array(m["s"].to_numpy(np.int64))}
            )

        joined = edges_k.map_batches(
            lambda b: pad(b, join_key), batch_format="pyarrow"
        ).union(scores.map_batches(score_as_key, batch_format="pyarrow"))
        contrib = exchange_reduce(joined, gather, c_empty, num_buckets)

        total = contrib.aggregate(Sum("c", alias_name="t"))["t"] or 0

        u_cols = ["url", "v", "c"]
        u_types = {"url": pa.string(), "v": pa.string(), "c": pa.int64()}

        def upad(batch: pa.Table, key: str) -> pa.Table:
            n = len(batch)
            out = pa.table(
                {c: (batch[c] if c in batch.column_names
                     else pa.nulls(n, u_types[c])) for c in u_cols}
            )
            return out.append_column(
                "__bucket",
                pa.array(_tag_by(out[key].to_pylist(), num_buckets)),
            )

        def norm(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            marks = df[df["url"].notna()][["url"]]
            cs = df[df["url"].isna()][["v", "c"]]
            s = (cs.groupby("v", sort=False)["c"].sum().astype("int64")
                 if len(cs) else pd.Series(dtype="int64"))
            raw = marks["url"].map(s).fillna(0).astype("int64").tolist()
            # big-int normalize: raw * SCALE can exceed int64
            vals = (
                [int(x) * HITS_SCALE // int(total) for x in raw]
                if total > 0 else [0] * len(raw)
            )
            return pa.table(
                {"url": pa.array(marks["url"].tolist(), pa.string()),
                 "s": pa.array(np.array(vals, dtype=np.int64))}
            )

        j2 = nodes.map_batches(
            lambda b: upad(b, "url"), batch_format="pyarrow"
        ).union(contrib.map_batches(
            lambda b: upad(b, "v"), batch_format="pyarrow"
        ))
        return exchange_reduce(j2, norm, s_empty, num_buckets)

    auth = None
    for _ in range(iters):
        auth = _half(edges_src, hub, src_col, dst_col)
        hub = _half(edges_dst, auth, dst_col, src_col)

    # zip hub and auth per url through one url-keyed exchange
    z_cols = ["url", "hub_fp", "auth_fp"]
    z_types = {c: (pa.string() if c == "url" else pa.int64())
               for c in z_cols}

    def zpad(batch: pa.Table, which: str) -> pa.Table:
        n = len(batch)
        b = pa.table({"url": batch["url"], which: batch["s"]})
        out = pa.table(
            {c: (b[c] if c in b.column_names else pa.nulls(n, z_types[c]))
             for c in z_cols}
        )
        return out.append_column(
            "__bucket",
            pa.array(_tag_by(out["url"].to_pylist(), num_buckets)),
        )

    z_empty = pa.table(
        {"url": pa.array([], pa.string()),
         "hub_fp": pa.array([], pa.int64()),
         "auth_fp": pa.array([], pa.int64())}
    )

    def zip_scores(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        h = df[df["hub_fp"].notna()][["url", "hub_fp"]]
        a = df[df["auth_fp"].notna()][["url", "auth_fp"]]
        m = h.merge(a, on="url")
        return pa.table(
            {"url": pa.array(m["url"].tolist(), pa.string()),
             "hub_fp": pa.array(m["hub_fp"].to_numpy(np.int64)),
             "auth_fp": pa.array(m["auth_fp"].to_numpy(np.int64))}
        )

    both = hub.map_batches(
        lambda b: zpad(b, "hub_fp"), batch_format="pyarrow"
    ).union(auth.map_batches(
        lambda b: zpad(b, "auth_fp"), batch_format="pyarrow"
    ))
    return exchange_reduce(both, zip_scores, z_empty, num_buckets)
