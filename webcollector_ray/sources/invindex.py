"""Inverted-index sink/source: word-sharded posting lists as
partitioned Parquet — the search-index export of a training-data
pipeline, plus the lookup path that reads ONLY the shards of the
probed words.

Layout: <root>/shard=NNNN.parquet, rows (word, doc_id, tf) sorted by
(word, doc_id) within the shard; shard = word-hash % num_shards using
pd.util.hash_array (the repo-wide string hash), so a probe word maps
to exactly one shard file. The shard files are written INSIDE the
posting exchange's reduce tasks (one file per bucket, deterministic
names — the resumable-output shape of functions/output.py), and the
build returns a tiny manifest instead of re-materializing postings.

No reference equivalent (the reference has no index export); this is
training-pipeline / search-export surface beside BM25 and TF-IDF,
which already compute postings in flight but never persist them.
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _shard_of(words, num_shards: int) -> np.ndarray:
    if len(words) == 0:
        return np.zeros(0, dtype=np.int32)
    return (
        pd.util.hash_array(
            np.asarray(words, dtype=object), categorize=False
        ) % np.uint64(num_shards)
    ).astype(np.int32)


def build_inverted_index(
    ds, root: str, *, text_col: str = "text", id_col: str = "doc_id",
    num_shards: int = 32,
):
    """Corpus -> word-sharded posting-list Parquet under `root`.

    One postings map pass (per-doc term frequencies, the tfidf kernel
    shape) tagged by word-hash shard, ONE exchange, and each reduce
    task sorts its shard by (word, doc_id) and writes
    shard=NNNN.parquet directly — postings cross the wire exactly
    once and are never collected. Returns the manifest as a pandas
    DataFrame (shard, n_words, n_postings), num_shards rows."""
    from ..functions.joins import exchange_reduce

    os.makedirs(root, exist_ok=True)

    def postings(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for w, f in Counter((t or "").lower().split()).items():
                ids.append(i)
                words.append(w)
                tfs.append(f)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
                "__bucket": pa.array(_shard_of(words, num_shards)),
            }
        )

    empty = pa.table(
        {
            "shard": pa.array([], pa.int32()),
            "n_words": pa.array([], pa.int64()),
            "n_postings": pa.array([], pa.int64()),
        }
    )

    def write_shard(t: pa.Table) -> pa.Table:
        df = t.select(["word", id_col, "tf"]).to_pandas()
        df = (
            df.groupby(["word", id_col], sort=False, as_index=False)["tf"]
            .sum()  # merge partials of the same (word, doc) across blocks
            .sort_values(["word", id_col], kind="mergesort")
        )
        if not len(df):
            return empty
        shard = int(
            _shard_of(df["word"].to_numpy(object)[:1], num_shards)[0]
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            f"{root}/shard={shard:04d}.parquet",
        )
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "n_words": pa.array([df["word"].nunique()], pa.int64()),
                "n_postings": pa.array([len(df)], pa.int64()),
            }
        )

    manifest = exchange_reduce(
        ds.map_batches(postings, batch_format="pyarrow"),
        write_shard, empty, num_shards,
    ).to_pandas()
    return manifest.sort_values("shard").reset_index(drop=True)


def read_postings(
    root: str, words, *, num_shards: int = 32
) -> pa.Table:
    """Pruned lookup: probe words hash to their shards, ONLY those
    shard files are opened, and the parquet read filters to the probe
    set — rows (word, doc_id, tf) sorted by (word, doc_id)."""
    wl = sorted(set(words))
    if not wl:
        return pa.table(
            {
                "word": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            }
        )
    shards = sorted(set(_shard_of(wl, num_shards).tolist()))
    parts = []
    for s in shards:
        path = f"{root}/shard={s:04d}.parquet"
        if not os.path.exists(path):
            continue  # no postings landed in this shard
        parts.append(
            pq.read_table(path, filters=[("word", "in", wl)])
        )
    if not parts:
        return read_postings(root, [], num_shards=num_shards)
    out = pa.concat_tables(parts).to_pandas()
    out = out.sort_values(["word", "doc_id"], kind="mergesort")
    return pa.Table.from_pandas(out, preserve_index=False)
