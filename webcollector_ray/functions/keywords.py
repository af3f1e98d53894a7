"""Multi-phrase keyword census — the blocklist / watchlist primitive
of corpus curation (C4's badword filter, policy-term audits, brand /
PII keyword sweeps) at a cost INDEPENDENT of the phrase count.

The naive shape is P substring scans over the corpus (P x bytes); an
Aho-Corasick automaton fixes the asymptotics but its per-character
state machine is a Python-speed loop here. This module instead rides
the repo's vectorized shingle machinery (dedup.py `_word_hash64` /
`_gram_hashes_from_word_hashes`, the md5-64 rolling word-window hash
that is RE-DERIVABLE IN SQL): every phrase normalizes to a word
sequence, every document's word windows of the needed lengths hash in
one numpy pass each, and membership is an `np.isin` against the
bounded broadcast phrase-hash set. Cost: O(total_words x distinct
phrase LENGTHS) — a 10-phrase and a 100k-phrase census scan the
corpus identically. Hash hits are verified by exact string compare
(collision-proof, so the result is set-exact, not probabilistic).

Word-boundary semantics (match iff the phrase appears as a contiguous
run of whitespace tokens of lower(text)) — the natural unit for term
blocklists, and exactly re-expressible in SQL as substring containment
over ' ' || array_to_string(tokens, ' ') || ' '.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from .dedup import _gram_hashes_from_word_hashes, _word_hash64


@lru_cache(maxsize=8)
def _phrase_index(phrases: tuple):
    """Per-process compiled phrase structure: for each distinct word
    length L, (hash vector, hash -> [(phrase_id, joined)] verify map).
    Bounded by the phrase list; built once per worker per census."""
    by_len: dict = {}
    for pid, p in enumerate(phrases):
        words = p.lower().split()
        if not words:
            raise ValueError(f"empty phrase at index {pid}: {p!r}")
        wh = np.array(
            [_word_hash64(w) for w in words], dtype=np.uint64
        )
        h = int(_gram_hashes_from_word_hashes(wh, len(words))[0])
        ln = by_len.setdefault(len(words), {})
        ln.setdefault(h, []).append((pid, " ".join(words)))
    return {
        L: (np.fromiter(m.keys(), dtype=np.uint64, count=len(m)), m)
        for L, m in by_len.items()
    }


def keyword_census(ds, phrases, *, text_col: str = "text"):
    """Document frequency of each phrase over the corpus: Dataset
    (term, n_docs) with EXACTLY one row per input phrase (n_docs = 0
    when absent; `term` is the phrase's normalized form). Map-only
    partial count vectors (length P) fold in ONE bounded task."""
    phrases = tuple(phrases)
    if not phrases:
        raise ValueError("keyword_census needs a non-empty phrase list")
    norm = [" ".join(p.lower().split()) for p in phrases]
    if len(set(norm)) != len(norm):
        raise ValueError("duplicate phrases after normalization")
    _phrase_index(phrases)  # validate eagerly on the driver

    def partial(batch: pa.Table) -> pa.Table:
        idx = _phrase_index(phrases)
        counts = np.zeros(len(phrases), dtype=np.int64)
        for text in batch[text_col].to_pylist():
            words = (text or "").lower().split()
            if not words:
                continue
            wh = np.array(
                [_word_hash64(w) for w in words], dtype=np.uint64
            )
            seen: set = set()
            for L, (hvec, vmap) in idx.items():
                if len(words) < L:
                    continue
                gh = _gram_hashes_from_word_hashes(wh, L)
                for i in np.flatnonzero(np.isin(gh, hvec)):
                    window = " ".join(words[i:i + L])
                    for pid, joined in vmap[int(gh[i])]:
                        if joined == window:
                            seen.add(pid)
            for pid in seen:
                counts[pid] += 1
        return pa.table(
            {
                "pid": pa.array(
                    np.arange(len(phrases), dtype=np.int64)
                ),
                "n_docs": pa.array(counts),
                "__bucket": pa.array(
                    np.zeros(len(phrases), dtype=np.int32)
                ),
            }
        )

    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        n = t["n_docs"].to_numpy(zero_copy_only=False)
        total = np.zeros(len(phrases), dtype=np.int64)
        np.add.at(total, pid, n)
        return pa.table(
            {
                "term": pa.array(norm, pa.string()),
                "n_docs": pa.array(total),
            }
        )

    from .joins import exchange_reduce

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold, empty, 1,
    )
