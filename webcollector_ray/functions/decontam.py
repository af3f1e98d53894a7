"""Eval-set decontamination (GPT-3 appx. C / Gopher §A2 style): drop
training documents that share any word k-gram with a held-out eval
set.

Scale shape: the eval side of a decontamination pass is a benchmark
suite — megabytes, not terabytes — so the standard plan is to build
the eval k-gram hash set ONCE and broadcast it, then flag training
docs in a single map-only pass (no shuffle at all over the 100 TB
side). The gram-set build itself runs in a Ray task over the eval
Dataset's arrow refs — the raw texts never touch the driver.

Gram hashing reuses dedup's 64-bit shingle hash (md5-64 words +
position mix), so the SQL oracle can compare exact gram STRINGS and
agree up to a ~2^-64-per-pair collision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .dedup import _shingle_hashes


@ray.remote
def _eval_gram_set(k: int, text_col: str, *blocks) -> np.ndarray:
    """Distinct, sorted gram hashes over all eval blocks (one task —
    eval sets are small by assumption; assert the documented bound so
    a mis-sized input fails loudly instead of OOMing a worker)."""
    hs = [np.zeros(0, dtype=np.uint64)]
    n_docs = 0
    for t in blocks:
        if t is None or not len(t):
            continue
        n_docs += len(t)
        for text in t[text_col].to_pylist():
            hs.append(_shingle_hashes(text, k))
    out = np.unique(np.concatenate(hs))
    if out.nbytes > 1 << 30:
        raise ValueError(
            f"eval gram set is {out.nbytes >> 20} MiB from {n_docs} docs — "
            "decontaminate() broadcasts this set; it must stay benchmark-"
            "sized (see module docstring)"
        )
    return out


def build_eval_gram_set(eval_ds, *, k: int = 8, text_col: str = "text"):
    """ObjectRef[np.ndarray[uint64]] of the eval set's distinct gram
    hashes, built inside a Ray task (driver only shuffles refs)."""
    refs = list(eval_ds.to_arrow_refs())
    return _eval_gram_set.remote(k, text_col, *refs)


def contamination_flags(
    ds,
    eval_grams_ref,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Map-only pass: per doc, the number of DISTINCT word k-grams
    present in the broadcast eval gram set. Output (id, n_hits) for
    every doc; filter n_hits > 0 for the contamination report or
    n_hits == 0 for the decontaminated corpus."""

    def flag(batch: pa.Table) -> pa.Table:
        grams = ray.get(eval_grams_ref)  # local-store fetch, zero-copy
        hits = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            h = np.unique(_shingle_hashes(text, k))
            idx = np.searchsorted(grams, h)
            idx[idx == len(grams)] = 0
            hits[i] = int(np.count_nonzero(grams[idx] == h)) if len(grams) else 0
        return pa.table({id_col: batch[id_col], "n_hits": pa.array(hits)})

    return ds.map_batches(flag, batch_format="pyarrow")
