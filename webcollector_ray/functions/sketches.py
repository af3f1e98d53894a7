"""Distributed sketches & corpus sampling — training-pipeline
operators beyond the reference's surface (SURVEY.md §2 "beyond"):

- approx_distinct_hll: HyperLogLog distinct count (Flajolet et al.,
  "HyperLogLog: the analysis of a near-optimal cardinality estimation
  algorithm", AofA 2007). Deterministic md5-derived hashes, so the
  driver's DuckDB oracle re-derives the exact register array and the
  exact estimate — an *oracled* approximate sketch.
- quantiles_by_key: exact per-key quantiles (percentile_cont/linear
  semantics) over the bucketed hash exchange.
- vocab_top_words: corpus vocabulary / heavy hitters — per-batch
  partial counts, word-hash bucket exchange, distributed top-n.
- stratified_sample: deterministic k-per-stratum sample by smallest
  md5 hash (reproducible train/eval splits).

Distribution shapes: HLL moves one m-byte register row per block plus
a tiny driver max-merge; vocab moves (distinct-words x 1) partial rows
per block through ONE hash exchange then n x num_buckets survivors;
quantiles move each key's values to one bucket task (exact quantiles
are inherently per-key-collocated — for keys whose values exceed a
task's memory, switch to a mergeable t-digest; documented trade-off);
stratified sampling moves k rows per (stratum, block).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .joins import exchange_reduce
from .ranking import global_top_n

# same multiplicative-hash / md5-le64 conventions as the media kernels
# and the minhash oracle: DuckDB md5_number_upper(s) == little-endian
# first 8 digest bytes.


def _md5le64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


# ------------------------------------------------------------------ HLL


def hll_alpha(m: int) -> float:
    # the standard bias constant for m >= 128 (Flajolet §4)
    return 0.7213 / (1 + 1.079 / m)


def approx_distinct_hll(ds, col: str, p: int = 12):
    """HyperLogLog distinct-count over `col` (values hashed as their
    string representation, md5-le64 — the same hash the SQL oracle
    computes with md5_number_upper).

    p in [12, 18]: register index = top p hash bits, rank = leading
    zeros of the remaining 64-p bits + 1. The 64-p <= 52 bound keeps
    np.frexp exact for the bit-length computation. Small-range
    correction (linear counting) applied below 2.5*m as in the paper.

    Returns a one-row pandas DataFrame
    (estimate, nonzero_registers, register_sum) — register_sum pins
    the full register array against the oracle, estimate is the HLL
    value both sides compute from it."""
    if not (12 <= p <= 18):
        raise ValueError("p must be in [12, 18]")
    m = 1 << p
    shift = np.uint64(64 - p)
    wmask = np.uint64((1 << (64 - p)) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        regs = np.zeros(m, dtype=np.uint8)
        if len(batch):
            # registers depend only on the value SET — hash each
            # distinct value once (the md5 loop is the SQL-parity cost)
            vals = pc.unique(batch[col].combine_chunks()).to_pylist()
            h = np.array(
                [_md5le64(str(v)) for v in vals], dtype=np.uint64
            )
            idx = (h >> shift).astype(np.int64)
            w = h & wmask
            # bit_length via frexp (exact: w < 2^52)
            bl = np.frexp(w.astype(np.float64))[1]
            rank = (64 - p) - bl + 1
            np.maximum.at(regs, idx, rank.astype(np.uint8))
        return pa.table({"registers": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts):
        R = np.maximum.reduce(
            np.stack([np.asarray(r, dtype=np.uint8) for r in parts["registers"]])
        )
    else:
        R = np.zeros(m, dtype=np.uint8)
    Z = float(np.sum(np.power(2.0, -R.astype(np.float64))))
    E = hll_alpha(m) * m * m / Z
    V = int((R == 0).sum())
    if E <= 2.5 * m and V > 0:
        E = m * float(np.log(m / V))
    return pd.DataFrame(
        {
            "estimate": [round(E, 6)],
            "nonzero_registers": [np.int64(m - V)],
            "register_sum": [np.int64(R.sum())],
        }
    )


# ------------------------------------------------------- exact quantiles


def quantiles_by_key(
    ds,
    *,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    num_buckets: int = 16,
    ndigits: int = 6,
):
    """Exact per-key quantiles with percentile_cont (linear
    interpolation) semantics: h = (n-1)*q, v[floor(h)] lerped toward
    v[floor(h)+1].

    One key-hash bucket exchange; inside a bucket the per-key quantile
    is a vectorized pandas groupby-quantile. Partitioning assumption:
    one key's values fit a bucket task (exact quantiles require
    co-located values); for hot keys beyond that, a mergeable sketch
    (t-digest) is the scale path."""
    qlist = list(qs)
    qnames = [f"p{int(q * 100)}" for q in qlist]
    schema = ds.schema()
    key_type = dict(zip(schema.names, schema.types))[key_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .joins import _bucket_ids

        b = _bucket_ids(batch[key_col], num_buckets)
        return batch.select([key_col, value_col]).append_column(
            "__bucket", pa.array(b)
        )

    empty = pa.table(
        {key_col: pa.array([], key_type),
         **{qn: pa.array([], pa.float64()) for qn in qnames}}
    )

    def bucket_quantiles(t: pa.Table) -> pa.Table:
        df = t.select([key_col, value_col]).to_pandas()
        g = (
            df.groupby(key_col, sort=True)[value_col]
            .quantile(qlist, interpolation="linear")
            .unstack()
        )
        out = {key_col: pa.array(g.index.tolist(), key_type)}
        for q, qn in zip(qlist, qnames):
            out[qn] = pa.array(
                [round(float(v), ndigits) for v in g[q]], pa.float64()
            )
        return pa.table(out)

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow")
    return exchange_reduce(tagged, bucket_quantiles, empty, num_buckets)


# ------------------------------------- mergeable histogram quantile sketch


def quantiles_sketch_by_key(
    ds,
    *,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    num_bins: int = 256,
    num_buckets: int = 16,
    ndigits: int = 6,
):
    """Approximate per-key quantiles via a fixed-bin histogram sketch —
    the scale path `quantiles_by_key` documents for keys whose values
    exceed one task's memory: per-key state is a bounded `num_bins`
    int64 vector, and integer bin counts merge order-free, so a hot
    key costs O(num_bins) no matter how many rows it has.

    Two passes: a tiny global min/max reduce (order-free exact), then
    per-batch vectorized (key, bin) partial counts through ONE key-hash
    bucket exchange. The estimate for quantile q is the LOWER EDGE of
    the first bin whose cumulative count reaches ceil(q * n_key) —
    every arithmetic step (bin index ``floor((v - mn) * B / (mx -
    mn))``, edge ``mn + (mx - mn) * i / B``) is the same IEEE-double
    expression the SQL oracle evaluates, so the sketch is value-exact
    re-derivable, not just row-count checked.

    Error bound: one bin width = (max - min) / num_bins."""
    import pyarrow.compute as pc

    qlist = list(qs)
    qnames = [f"p{int(q * 100)}" for q in qlist]
    schema = ds.schema()
    key_type = dict(zip(schema.names, schema.types))[key_col]

    # pass 1: global min/max (tiny per-block rows -> driver reduce)
    def mm(batch: pa.Table) -> pa.Table:
        col = batch[value_col]
        return pa.table(
            {
                "mn": pa.array([pc.min(col).as_py()], pa.float64()),
                "mx": pa.array([pc.max(col).as_py()], pa.float64()),
            }
        )

    mmdf = ds.map_batches(mm, batch_format="pyarrow").to_pandas().dropna()
    if mmdf.empty:
        return pa.table(
            {key_col: pa.array([], key_type),
             **{qn: pa.array([], pa.float64()) for qn in qnames}}
        )
    mn = float(mmdf["mn"].min())
    mx = float(mmdf["mx"].max())
    width = mx - mn
    B = num_bins

    def partial(batch: pa.Table) -> pa.Table:

        keys = batch[key_col].to_pylist()
        v = np.asarray(batch[value_col].to_pylist(), dtype=np.float64)
        if width > 0:
            bins = np.minimum(
                np.floor((v - mn) * B / width), B - 1
            ).astype(np.int64)
        else:
            bins = np.zeros(len(v), dtype=np.int64)
        df = (
            pd.DataFrame({key_col: keys, "bin": bins})
            .groupby([key_col, "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        import pandas as _pd

        b = (
            _pd.util.hash_array(
                df[key_col].to_numpy(dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32)
        t = pa.Table.from_pandas(df, preserve_index=False)
        return t.set_column(
            t.schema.get_field_index(key_col), key_col,
            pa.array(df[key_col].tolist(), key_type),
        ).append_column("__bucket", pa.array(b))

    empty = pa.table(
        {key_col: pa.array([], key_type),
         **{qn: pa.array([], pa.float64()) for qn in qnames}}
    )

    def bucket_estimate(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "bin", "n"]).to_pandas()
        df = (
            df.groupby([key_col, "bin"], sort=True)["n"].sum().reset_index()
        )
        out_keys: list = []
        out_cols: dict = {qn: [] for qn in qnames}
        for key, g in df.groupby(key_col, sort=True):
            counts = g.set_index("bin")["n"]
            total = int(counts.sum())
            cum = counts.cumsum()
            out_keys.append(key)
            for q, qn in zip(qlist, qnames):
                target = np.ceil(q * total)
                i = int(cum.index[np.searchsorted(cum.values, target)])
                edge = mn + width * i / B if width > 0 else mn
                out_cols[qn].append(round(float(edge), ndigits))
        return pa.table(
            {key_col: pa.array(out_keys, key_type),
             **{qn: pa.array(out_cols[qn], pa.float64()) for qn in qnames}}
        )

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return exchange_reduce(tagged, bucket_estimate, empty, num_buckets)


# ------------------------------------------------------------ vocabulary


def word_counts(ds, *, text_col: str = "text", num_buckets: int = 32):
    """Distributed corpus word counts over lower(text).split() (the
    repo-wide tokenization): partial Counter per batch -> (word, n)
    rows, ONE word-hash bucket exchange summing partials. Returns a
    Dataset[word, n] with each word on exactly one block — the full
    word set is never collected anywhere. Shared by vocab_top_words
    and the unigram LM trainer."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            if t:
                c.update(t.lower().split())
        words = list(c.keys())
        import pandas as _pd

        b = (
            _pd.util.hash_array(
                np.asarray(words, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32) if words else np.zeros(0, dtype=np.int32)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
                "__bucket": pa.array(b),
            }
        )

    empty = pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def bucket_sum(t: pa.Table) -> pa.Table:
        df = t.select(["word", "n"]).to_pandas()
        g = df.groupby("word", sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        bucket_sum, empty, num_buckets,
    )


def vocab_top_words(ds, *, text_col: str = "text", n: int = 200,
                    num_buckets: int = 32):
    """Corpus vocabulary / heavy hitters: the n most frequent
    whitespace tokens, ties broken by word ascending — word_counts'
    exchange followed by the distributed global top-n (local top per
    bucket block + single tiny reduce)."""
    counts = word_counts(ds, text_col=text_col, num_buckets=num_buckets)
    return global_top_n(counts, order_col="n", n=n, tie_col="word")


# ----------------------------------------------------- stratified sample


def stratified_sample(ds, *, strata_col: str, id_col: str, k: int):
    """Deterministic k-per-stratum sample: within each stratum keep the
    k rows with the smallest md5-le64(str(id)) (ties by id) — a
    reproducible split the oracle re-ranks with md5_number_upper.

    Local per-batch top-k per stratum, then one tiny reduce over
    k x strata x blocks survivors; the dataset itself is never
    shuffled."""

    def local(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.select([strata_col, id_col]).append_column(
                "__h", pa.array([], pa.uint64())
            )
        ids = batch[id_col].to_pylist()
        h = np.array([_md5le64(str(i)) for i in ids], dtype=np.uint64)
        df = pd.DataFrame(
            {
                strata_col: batch[strata_col].to_pylist(),
                id_col: ids,
                "__h": h,
            }
        )
        df = (
            df.sort_values([strata_col, "__h", id_col], kind="mergesort")
            .groupby(strata_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    import ray

    @ray.remote
    def reduce(*blocks):
        tabs = [t for t in blocks if t is not None and len(t)]
        if not tabs:
            return None
        df = pa.concat_tables(tabs, promote_options="permissive").to_pandas()
        df = (
            df.sort_values([strata_col, "__h", id_col], kind="mergesort")
            .groupby(strata_col, sort=False)
            .head(k)
            .drop(columns="__h")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    out = ray.get(reduce.remote(*local_ds.to_arrow_refs()))
    if out is None:
        schema = ds.schema()
        types = dict(zip(schema.names, schema.types))
        out = pa.table(
            {c: pa.nulls(0, types[c]) for c in (strata_col, id_col)}
        )
    return out.to_pandas().sort_values(
        [strata_col, id_col], kind="mergesort"
    ).reset_index(drop=True)


# ------------------------------------------------------- mix rebalancing


def mix_rebalance(
    ds,
    weights: dict,
    *,
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_weight: float = 1.0,
):
    """Training-mix rebalancing: per-source sampling weight w, where
    w < 1 downsamples and w > 1 upsamples (epoch-repeat). Each row is
    emitted floor(w) times plus one more for the deterministic
    hash-fraction (id * 2654435761) % 1000 < round(frac(w) * 1000) —
    the same Knuth-hash gate docs_sample uses, so reruns, resumes and
    the SQL oracle agree row-for-row. Output (id, copy) with
    copy = 0..n-1.

    Map-only (weights are a tiny broadcast dict; no shuffle), fully
    vectorized via np.repeat. This is the Pile/Gopher-style "mixture
    epochs" stage: at 100 TB the repeat factors ride the pipeline as
    row multiplicity, never as materialized copies of the text."""

    def rebalance(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = np.array(
            [
                float(weights.get(s, default_weight))
                for s in batch[strata_col].to_pylist()
            ],
            dtype=np.float64,
        )
        base = np.floor(w)
        fracmill = np.round((w - base) * 1000).astype(np.int64)
        # uint64 wrap, not signed int64 (which overflows differently
        # than the SQL oracle for ids >= ~3.5e9; ADVICE r2) — the
        # oracle mirrors this as HUGEINT math mod 2^64
        gate = (
            (ids.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(1000)
        ).astype(np.int64)
        extra = (gate < fracmill).astype(np.int64)
        n = base.astype(np.int64) + extra
        starts = np.cumsum(n) - n
        rep_ids = np.repeat(ids, n)
        copy = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
        return pa.table(
            {
                id_col: pa.array(rep_ids, batch[id_col].type),
                "copy": pa.array(copy),
            }
        )

    return ds.map_batches(rebalance, batch_format="pyarrow")


def hash_split(ds, *, id_col: str = "doc_id",
               weights: Sequence[int] = (98, 1, 1),
               labels: Sequence[str] = ("train", "val", "test"),
               seed: str = "split"):
    """Deterministic train/val/test assignment — the reproducible-split
    primitive every training-data pipeline needs: bucket =
    md5-64(seed ':' id) % sum(weights), mapped onto cumulative weight
    ranges. Pure map-only (no exchange, no state); the hash is the
    repo's SQL-rederivable md5-prefix scheme, so the split is
    byte-stable across engines, runs, and cluster sizes, and any doc's
    assignment is recomputable from its id alone (resumable ingest
    keeps split membership without a lookup table). Returns
    (id_col, "split")."""
    assert len(weights) == len(labels) and all(w > 0 for w in weights)
    total = int(sum(weights))
    cuts = np.cumsum(np.asarray(weights, dtype=np.int64))
    labs = list(labels)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big"
                ) % total
                for i in ids
            ),
            dtype=np.int64, count=len(ids),
        )
        which = np.searchsorted(cuts, h, side="right")
        return pa.table(
            {
                id_col: batch[id_col],
                "split": pa.array([labs[w] for w in which], pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------------------- Misra-Gries

def mg_top_words(ds, *, text_col: str = "text", n: int = 50,
                 capacity: int = 4096):
    """Misra-Gries heavy hitters over corpus words — the BOUNDED-STATE
    scale path for vocab_top_words (quantiles_sketch_by_key precedent:
    exact operator + mergeable sketch side by side).

    Each batch keeps at most `capacity` counters (on overflow, the
    (capacity+1)-th largest count is subtracted from all and <=0
    counters drop — the classic MG decrement); the per-batch summaries
    merge in ONE task by counter addition followed by the same
    decrement (Agarwal et al. 2013 mergeable-summaries merge). State
    is O(capacity) per task no matter the vocabulary size; every true
    count is undercounted by at most total_tokens/(capacity+1), and
    when the corpus vocabulary fits in `capacity` (our synthetic
    corpus: ~60 words << 4096) nothing ever decrements, so the counts
    — and the DuckDB oracle hash — are EXACT.

    Output: top-n (word, n), ties word-ascending (vocab_top_words
    schema, so the two scale paths are drop-in interchangeable)."""
    from collections import Counter

    from .joins import exchange_reduce

    def mg_trim(c: Counter, cap: int) -> Counter:
        if len(c) <= cap:
            return c
        dec = sorted(c.values(), reverse=True)[cap]
        return Counter({w: v - dec for w, v in c.items() if v > dec})

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            if t:
                c.update(t.lower().split())
        c = mg_trim(c, capacity)
        words = list(c.keys())
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
                "__bucket": pa.array(
                    np.zeros(len(words), dtype=np.int32)
                ),
            }
        )

    empty = pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def merge(t: pa.Table) -> pa.Table:
        df = t.select(["word", "n"]).to_pandas()
        g = df.groupby("word", sort=False)["n"].sum()
        c = mg_trim(Counter(g.to_dict()), capacity)
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        return pa.table(
            {
                "word": pa.array([w for w, _ in top], pa.string()),
                "n": pa.array([v for _, v in top], pa.int64()),
            }
        )

    # single-bucket exchange = one off-driver merge task over the
    # bounded capacity x num_blocks summary rows
    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge, empty, num_buckets=1,
    )


# --------------------------------------------------------- count-min

def cms_counts(ds, *, key_col: str, depth: int = 4, width: int = 2048,
               num_buckets: int = 32):
    """Count-min sketch frequency estimates (Cormode & Muthukrishnan
    2005) — the fourth classic mergeable summary beside HLL, the
    histogram quantile sketch and Misra-Gries: point-estimate
    n_est(k) = min_i grid[i][h_i(k)], always >= the true count,
    within eps*N w.h.p. for width ~ e/eps.

    State is bounded by depth x width CELLS regardless of key
    cardinality or row count: per-batch nonzero-cell partials ride
    one (row, cell)-keyed exchange; the summed grid (<= d*w int64,
    ~64 KiB here) broadcasts via ray.put; the distinct-key pass is
    the word_counts-style exchange and the estimate lookup is
    map-only.

    DETERMINISTIC hashing (md5-le64, the stratified-sample /
    md5_number_upper equivalence), so the DuckDB oracle reproduces
    the sketch bit-for-bit INCLUDING collisions. Output:
    (key, n_est)."""
    import ray

    from .joins import exchange_reduce

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for v in batch[key_col].to_pylist():
            if v is not None:
                c[str(v)] += 1
        rows_i, rows_cell, rows_c, keys = [], [], [], list(c.keys())
        for k, n in c.items():
            for i in range(depth):
                rows_i.append(i)
                rows_cell.append(_md5le64(f"cms-{i}-{k}") % width)
                rows_c.append(n)
        # cell rows + key-marker rows in one table (kind discriminates)
        n_cells, n_keys = len(rows_i), len(keys)
        bk = np.concatenate([
            (np.asarray(rows_i, dtype=np.int64) * width
             + np.asarray(rows_cell, dtype=np.int64))
            % num_buckets if n_cells else np.zeros(0, dtype=np.int64),
            pd.util.hash_array(
                np.asarray(keys, dtype=object), categorize=False
            ).astype(np.int64) % num_buckets if n_keys
            else np.zeros(0, dtype=np.int64),
        ]).astype(np.int32)
        return pa.table(
            {
                "kind": pa.array(
                    ["C"] * n_cells + ["K"] * n_keys, pa.string()
                ),
                "i": pa.array(
                    rows_i + [0] * n_keys, pa.int64()
                ),
                "cell": pa.array(
                    rows_cell + [0] * n_keys, pa.int64()
                ),
                "c": pa.array(rows_c + [0] * n_keys, pa.int64()),
                "key": pa.array([None] * n_cells + keys, pa.string()),
                "__bucket": pa.array(bk),
            }
        )

    cols = ["kind", "i", "cell", "c", "key"]
    types = {
        "kind": pa.string(), "i": pa.int64(), "cell": pa.int64(),
        "c": pa.int64(), "key": pa.string(),
    }
    empty = pa.table({c_: pa.array([], types[c_]) for c_ in cols})

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        cells = df[df["kind"] == "C"].groupby(
            ["i", "cell"], as_index=False
        )["c"].sum()
        keys = df[df["kind"] == "K"]["key"].drop_duplicates()
        out = pd.concat(
            [
                pd.DataFrame(
                    {"kind": "C", "i": cells["i"], "cell": cells["cell"],
                     "c": cells["c"]}
                ),
                pd.DataFrame({"kind": "K", "key": keys}),
            ],
            ignore_index=True,
        )
        return pa.table(
            {
                c_: pa.array(
                    out[c_] if c_ in out.columns else [None] * len(out),
                    types[c_],
                )
                for c_ in cols
            }
        )

    merged = exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        reduce_fn, empty, num_buckets,
    ).materialize()

    # the summed grid is bounded by depth*width cells -> broadcast
    from .joins import df_or_empty

    grid_df = df_or_empty(
        merged.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "C")).select(
                ["i", "cell", "c"]
            ),
            batch_format="pyarrow",
        ),
        pa.table(
            {"i": pa.array([], pa.int64()),
             "cell": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        ),
    )
    grid = np.zeros((depth, width), dtype=np.int64)
    grid[grid_df["i"].to_numpy(), grid_df["cell"].to_numpy()] = (
        grid_df["c"].to_numpy()
    )
    grid_ref = ray.put(grid)

    def estimate(t: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        keys = t.filter(pc.equal(t["kind"], "K"))["key"].to_pylist()
        est = [
            int(min(
                g[i][_md5le64(f"cms-{i}-{k}") % width]
                for i in range(depth)
            ))
            for k in keys
        ]
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "n_est": pa.array(est, pa.int64()),
            }
        )

    return merged.map_batches(estimate, batch_format="pyarrow")


def approx_distinct_hll_by_key(ds, *, key_col: str, col: str,
                               p: int = 12, num_buckets: int = 8):
    """Per-key HyperLogLog distinct counts — the GROUPED form of
    approx_distinct_hll (same register/hash/estimator definitions, so
    the same SQL oracle reproduces it per key).

    Per-batch partials hold one m-byte register row per key seen in
    the batch; ONE key-hash exchange max-merges registers per key and
    computes the estimate in-bucket. Per-key state is m bytes,
    mergeable, regardless of row count."""
    if not (12 <= p <= 18):
        raise ValueError("p must be in [12, 18]")
    m = 1 << p
    shift = np.uint64(64 - p)
    wmask = np.uint64((1 << (64 - p)) - 1)

    def regs_for(vals) -> np.ndarray:
        regs = np.zeros(m, dtype=np.uint8)
        if len(vals):
            h = np.array(
                [_md5le64(str(v)) for v in set(vals)], dtype=np.uint64
            )
            idx = (h >> shift).astype(np.int64)
            w = h & wmask
            bl = np.frexp(w.astype(np.float64))[1]
            rank = (64 - p) - bl + 1
            np.maximum.at(regs, idx, rank.astype(np.uint8))
        return regs

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_pylist(),
                "__v": batch[col].to_pylist(),
            }
        )
        keys, regrows = [], []
        for k, g in df.groupby(key_col, sort=False):
            keys.append(k)
            regrows.append(regs_for(g["__v"].tolist()).tolist())
        bk = (
            pd.util.hash_array(
                np.asarray(keys, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32) if keys else np.zeros(0, dtype=np.int32)
        return pa.table(
            {
                key_col: pa.array(keys, pa.string()),
                "registers": pa.array(regrows, pa.list_(pa.uint8())),
                "__bucket": pa.array(bk),
            }
        )

    empty = pa.table(
        {
            key_col: pa.array([], pa.string()),
            "estimate": pa.array([], pa.float64()),
            "nonzero_registers": pa.array([], pa.int64()),
            "register_sum": pa.array([], pa.int64()),
        }
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "registers"]).to_pandas()
        keys, est, nz, rs = [], [], [], []
        for k, g in df.groupby(key_col, sort=False):
            R = np.maximum.reduce(
                np.stack(
                    [np.asarray(r, dtype=np.uint8) for r in g["registers"]]
                )
            )
            Z = float(np.sum(np.power(2.0, -R.astype(np.float64))))
            E = hll_alpha(m) * m * m / Z
            V = int((R == 0).sum())
            if E <= 2.5 * m and V > 0:
                E = m * float(np.log(m / V))
            keys.append(k)
            est.append(round(E, 6))
            nz.append(m - V)
            rs.append(int(R.sum()))
        return pa.table(
            {
                key_col: pa.array(keys, pa.string()),
                "estimate": pa.array(est, pa.float64()),
                "nonzero_registers": pa.array(nz, pa.int64()),
                "register_sum": pa.array(rs, pa.int64()),
            }
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        reduce_fn, empty, num_buckets,
    )


# ----------------------------------------------------------------- KMV


def kmv_distinct_by_key(ds, *, key_col: str, col: str, k: int = 64,
                        num_buckets: int = 8):
    """Per-key KMV (k-minimum-values / bottom-k) distinct-count sketch
    (Bar-Yossef et al. 2002; the Theta-sketch base case) — the third
    member of the repo's distinct-estimator family next to exact and
    HLL: O(k) state per key, mergeable by unioning hash sets and
    re-truncating to the k smallest, and (unlike HLL) it doubles as a
    uniform distinct-value sample supporting set operations.

    Hash: md5-le64 of str(value) — identical to the HLL family, so the
    SQL oracle reuses md5_number_upper. Estimator: if a key holds
    fewer than k distinct hashes the count is EXACT (= n_hashes);
    otherwise estimate = (k-1) / (h_k / 2^64) with h_k the k-th
    smallest distinct hash, both sides computing the same two exactly-
    rounded double ops (one uint64->double convert, two divisions).

    Scale shape: each batch contributes at most k hashes per key (a
    batch's k smallest distinct hashes are a superset of its
    contribution to the global bottom-k), ONE key-hash exchange
    union-merges and truncates per key. Per-key state is 8k bytes
    regardless of row count."""
    if k < 2:
        raise ValueError("k must be >= 2")
    two64 = float(2**64)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_pylist(),
                "__v": batch[col].to_pylist(),
            }
        )
        keys, hrows = [], []
        for kk, g in df.groupby(key_col, sort=False):
            h = np.unique(
                np.array(
                    [_md5le64(str(v)) for v in set(g["__v"].tolist())],
                    dtype=np.uint64,
                )
            )
            keys.append(kk)
            hrows.append(h[:k].tolist())
        bk = (
            pd.util.hash_array(
                np.asarray(keys, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32) if keys else np.zeros(0, dtype=np.int32)
        return pa.table(
            {
                key_col: pa.array(keys, pa.string()),
                "hashes": pa.array(hrows, pa.list_(pa.uint64())),
                "__bucket": pa.array(bk),
            }
        )

    empty = pa.table(
        {
            key_col: pa.array([], pa.string()),
            "n_hashes": pa.array([], pa.int64()),
            "estimate": pa.array([], pa.float64()),
        }
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "hashes"]).to_pandas()
        keys, nh, est = [], [], []
        for kk, g in df.groupby(key_col, sort=False):
            h = np.unique(
                np.concatenate(
                    [np.asarray(r, dtype=np.uint64) for r in g["hashes"]]
                )
            )
            keys.append(kk)
            if len(h) < k:
                nh.append(len(h))
                est.append(float(len(h)))
            else:
                nh.append(k)
                est.append(float(k - 1) / (float(h[k - 1]) / two64))
        return pa.table(
            {
                key_col: pa.array(keys, pa.string()),
                "n_hashes": pa.array(nh, pa.int64()),
                "estimate": pa.array(est, pa.float64()),
            }
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        reduce_fn, empty, num_buckets,
    )
