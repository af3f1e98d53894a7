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


@ray.remote
def _eval_gram_postings(k: int, text_col: str, id_col: str, *blocks):
    """(sorted unique gram hashes, posting offsets, eval ids): the
    gram -> eval-doc inverted index over the eval set, built in one
    task (benchmark-sized side; same 1 GiB bound as the plain set)."""
    hs = [np.zeros(0, dtype=np.uint64)]
    ids = [np.zeros(0, dtype=np.int64)]
    for t in blocks:
        if t is None or not len(t):
            continue
        for text, did in zip(
            t[text_col].to_pylist(), t[id_col].to_pylist()
        ):
            h = np.unique(_shingle_hashes(text, k))
            hs.append(h)
            ids.append(np.full(len(h), did, dtype=np.int64))
    h = np.concatenate(hs)
    i = np.concatenate(ids)
    order = np.lexsort((i, h))
    h, i = h[order], i[order]
    if h.nbytes + i.nbytes > 1 << 30:
        raise ValueError(
            "eval gram postings exceed 1 GiB — the eval side must stay "
            "benchmark-sized (see module docstring)"
        )
    uh, starts = np.unique(h, return_index=True)
    return uh, np.append(starts, len(h)).astype(np.int64), i


def build_eval_gram_postings(
    eval_ds, *, k: int = 8, text_col: str = "text",
    id_col: str = "doc_id",
):
    refs = list(eval_ds.to_arrow_refs())
    return _eval_gram_postings.remote(k, text_col, id_col, *refs)


def contamination_pairs(
    ds,
    postings_ref,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """ATTRIBUTION sibling of contamination_flags: distinct (train id,
    eval id) pairs sharing at least one word k-gram — the report that
    tells a curator WHICH benchmark item leaked into which training
    doc, not just that something did. Same scale shape: the inverted
    index is a bounded broadcast, the pass over the corpus is
    map-only."""

    def pairs(batch: pa.Table) -> pa.Table:
        uh, offs, eids = ray.get(postings_ref)
        out_d: list = []
        out_e: list = []
        dids = batch[id_col].to_pylist()
        for j, text in enumerate(batch[text_col].to_pylist()):
            h = np.unique(_shingle_hashes(text, k))
            if not len(uh) or not len(h):
                continue
            idx = np.searchsorted(uh, h)
            idx[idx == len(uh)] = 0
            m = uh[idx] == h
            if not m.any():
                continue
            sel = idx[m]
            ev = np.unique(
                np.concatenate([eids[offs[s]:offs[s + 1]] for s in sel])
            )
            out_d.extend([dids[j]] * len(ev))
            out_e.extend(ev.tolist())
        return pa.table(
            {
                id_col: pa.array(out_d, pa.int64()),
                "eval_id": pa.array(out_e, pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


# ------------------------------------------------ fuzzy decontamination


@ray.remote
def _eval_sig_matrix(num_perm: int, shingle_k: int, text_col: str, *blocks):
    """Eval-set minhash signatures, one task (eval sets are
    benchmark-sized; assert the bound so mis-sized input fails loudly
    instead of broadcasting gigabytes)."""
    from .dedup import MinHasher

    mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=42)
    sigs = [
        mh.signatures_batch(t[text_col].to_pylist())
        for t in blocks
        if t is not None and len(t)
    ]
    out = (
        np.vstack(sigs)
        if sigs
        else np.zeros((0, num_perm), dtype=np.uint64)
    )
    if out.nbytes > 1 << 30:
        raise ValueError(
            f"eval signature matrix is {out.nbytes >> 20} MiB — "
            "fuzzy_decontaminate broadcasts it; the eval side must stay "
            "benchmark-sized"
        )
    return out


def fuzzy_decontaminate(
    train_ds,
    eval_ds,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """NEAR-duplicate eval decontamination — the fuzzy complement to
    the exact k-gram pass above: drop training docs whose minhash
    est-jaccard against ANY eval doc reaches `threshold`, with
    banded-LSH candidate generation so signatures are only compared
    where a band quad matches (the Gopher/Llama "paraphrased benchmark
    leakage" cut that exact grams miss).

    Scale shape mirrors decontaminate(): the eval signature matrix
    (num_eval x num_perm uint64) is built in one Ray task and
    broadcast; the training side is a single map-only pass — per
    batch, each of the `bands` quad-columns is matched train-vs-eval
    with one np.unique(axis=0) group-id join (exact equality, no hash
    collisions), and only the surviving candidate pairs pay the full
    signature comparison. No shuffle touches the 100-TB side."""
    from .dedup import MinHasher

    rows = num_perm // bands
    sig_ref = _eval_sig_matrix.remote(
        num_perm, shingle_k, text_col, *eval_ds.to_arrow_refs()
    )

    def survive(batch: pa.Table) -> pa.Table:
        sig_e = ray.get(sig_ref)  # local-store fetch, zero-copy
        out_ids = batch.select([id_col])
        if not len(batch) or not len(sig_e):
            return out_ids
        mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=42)
        sig_t = mh.signatures_batch(batch[text_col].to_pylist())
        m, n = len(sig_e), len(sig_t)
        pair_keys = []
        for b in range(bands):
            sl = slice(b * rows, (b + 1) * rows)
            quads = np.ascontiguousarray(
                np.vstack((sig_e[:, sl], sig_t[:, sl]))
            )
            _, inv = np.unique(quads, axis=0, return_inverse=True)
            ge, gt = inv[:m], inv[m:]
            order = np.argsort(gt, kind="stable")
            st = gt[order]
            lo = np.searchsorted(st, ge)
            hi = np.searchsorted(st, ge, side="right")
            cnt = hi - lo
            if not cnt.any():
                continue
            ev = np.repeat(np.arange(m, dtype=np.int64), cnt)
            tr = order[
                np.concatenate(
                    [np.arange(l, h) for l, h in zip(lo, hi) if h > l]
                )
            ]
            pair_keys.append(tr * np.int64(m) + ev)
        if not pair_keys:
            return out_ids
        pk = np.unique(np.concatenate(pair_keys))
        ti, ej = pk // m, pk % m
        est = (sig_t[ti] == sig_e[ej]).mean(axis=1)
        bad = np.zeros(n, dtype=bool)
        bad[ti[est >= threshold]] = True
        return out_ids.filter(pa.array(~bad))

    return train_ds.map_batches(survive, batch_format="pyarrow")


# ------------------------------------------------------- bloom scale path

_BLOOM_M_DEFAULT = 1 << 17


def _doc_gram_strings(text, k: int):
    """The oracle's exact gram strings: k-word windows joined by
    chr(31) over lower().split(); docs shorter than k words contribute
    their whole token list as one gram (same branch as the exact
    decontam SQL)."""
    words = (text or "").lower().split()
    if len(words) < k:
        return ["\x1f".join(words)]
    return [
        "\x1f".join(words[i:i + k]) for i in range(len(words) - k + 1)
    ]


def _bloom_positions(grams, m_bits: int) -> np.ndarray:
    """(n_grams, 4) bit positions from ONE md5 per gram: the 128-bit
    digest splits into four 32-bit lanes (little-endian halves ==
    DuckDB md5_number_upper/lower), each % m_bits — so the oracle
    recomputes every position exactly."""
    import hashlib

    out = np.empty((len(grams), 4), dtype=np.int64)
    for i, g in enumerate(grams):
        d = hashlib.md5(g.encode()).digest()
        u = int.from_bytes(d[:8], "little")
        lo = int.from_bytes(d[8:], "little")
        out[i] = (
            (u & 0xFFFFFFFF) % m_bits,
            (u >> 32) % m_bits,
            (lo & 0xFFFFFFFF) % m_bits,
            (lo >> 32) % m_bits,
        )
    return out


@ray.remote
def _eval_bloom_block(k: int, text_col: str, m_bits: int, block):
    bits = np.zeros(m_bits, dtype=bool)
    if block is not None and len(block):
        for text in block[text_col].to_pylist():
            pos = _bloom_positions(_doc_gram_strings(text, k), m_bits)
            bits[pos.ravel()] = True
    return np.packbits(bits)


@ray.remote
def _bloom_or(*packed) -> np.ndarray:
    out = packed[0].copy()
    for p in packed[1:]:
        np.bitwise_or(out, p, out=out)
    return out


def build_eval_gram_bloom(
    eval_ds, *, k: int = 8, text_col: str = "text",
    m_bits: int = _BLOOM_M_DEFAULT,
):
    """ObjectRef[packed m_bits-bit bloom] over the eval set's grams.

    This is the BOUNDED-STATE sibling of build_eval_gram_set: the
    exact set grows with the eval corpus (1 GiB guard), the bloom is
    m_bits/8 bytes NO MATTER how large the held-out side gets — the
    scale path when decontaminating against a whole reserved shard
    rather than benchmark-sized suites. Per-block partial bitmaps
    OR-fold in one task (each is bounded, m_bits/8 bytes)."""
    refs = list(eval_ds.to_arrow_refs())
    parts = [
        _eval_bloom_block.remote(k, text_col, m_bits, r) for r in refs
    ]
    if not parts:  # empty eval set => all-zero bloom, nothing drops
        return ray.put(np.packbits(np.zeros(m_bits, dtype=bool)))
    return _bloom_or.remote(*parts)


def bloom_decontaminate(
    ds, bloom_ref, *, k: int = 8, text_col: str = "text",
    id_col: str = "doc_id", m_bits: int = _BLOOM_M_DEFAULT,
):
    """Map-only survivor pass: keep docs with NO gram whose four
    bloom lanes are all set. Overdrop-only error (bloom false
    positives can drop clean docs, never leak contaminated ones) —
    and the oracle reproduces those false positives bit-for-bit, so
    the output is still hash-exact."""

    class Survive:
        """Actor-pool stage: the bloom is fetched and unpacked ONCE per
        worker in __init__ (m_bits bools), not per batch; the all-lanes
        -set test runs as one vectorized reduceat over every gram of
        the batch."""

        def __init__(self):
            self._bits = np.unpackbits(ray.get(bloom_ref)).astype(bool)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            grams, offsets = [], [0]
            for text in texts:
                grams.extend(_doc_gram_strings(text, k))
                offsets.append(len(grams))
            pos = _bloom_positions(grams, m_bits)
            hit = self._bits[pos].all(axis=1)  # per-gram contaminated
            # per-doc any(): maximum.reduceat over each doc's gram span
            starts = np.asarray(offsets[:-1])
            keep = np.ones(len(texts), dtype=bool)
            if len(hit):
                nonempty = starts < len(hit)
                doc_hit = np.zeros(len(texts), dtype=bool)
                doc_hit[nonempty] = np.maximum.reduceat(
                    hit, starts[nonempty]
                )
                keep = ~doc_hit
            return batch.filter(pa.array(keep)).select([id_col])

    return ds.map_batches(
        Survive, batch_format="pyarrow", concurrency=(1, 8)
    )
