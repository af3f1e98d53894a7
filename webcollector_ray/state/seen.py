"""Sharded bloom URL-seen filter (north_rule ST2).

The reference's URL-seen set IS the crawldb KV store, probed point-wise
on inject and bulk-merged per depth (plugin/rocks/RocksDBManager.java).
The exact-first-wins semantics live in the merge shuffle
(stages/merge.py); this filter is the SCALE-PATH accelerator layered on
top (SURVEY.md §2.5 ST2): a partitioned bloom filter keyed by
md5(canonical_url) hash, sharded over `num_shards` actors so the
mutable seen-state is single-writer-per-shard and memory scales
horizontally (a 10^10-URL frontier at 10 bits/url is ~12 GB — far
beyond one node, hence sharding).

Because blooms have false positives, pre-dropping "seen" links loses
(~fp_rate) genuinely-new URLs — so this is only used when
CrawlerConfig.approximate_seen=True; reference-parity runs keep it off
and rely on the exact merge alone. `add` is exact-time (no FNs): a URL
reported new by `check` may still be a duplicate (caught by the merge);
a URL reported seen has actually been added with probability
1 - fp_rate.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd

import ray


def hash64_batch(keys: Sequence[str]) -> np.ndarray:
    """Stable vectorized 64-bit string hash (pandas' fixed-key siphash,
    C-speed, identical across processes). The bloom state is in-memory
    per-crawl, so the hash function is internal — it only has to agree
    between the driver and every worker within one run."""
    if not len(keys):
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(
        np.asarray(keys, dtype=object), categorize=False
    ).astype(np.uint64)


@ray.remote(num_cpus=0.1)
class _BloomShard:
    """One bloom partition; k=4 derived hash probes per key."""

    def __init__(self, num_bits: int):
        self.num_bits = num_bits
        self.words = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes
        h2 = (hashes >> np.uint64(17)) | (hashes << np.uint64(47))
        probes = [
            (h1 + np.uint64(i) * h2) % np.uint64(self.num_bits) for i in range(4)
        ]
        return np.stack(probes, axis=1)  # (n, 4)

    def add_and_check(self, hashes: np.ndarray) -> np.ndarray:
        """Set bits for every key; return mask of keys that were already
        (probably) present BEFORE this call."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        word_idx = pos >> 6
        bit = np.uint64(1) << (pos & np.uint64(63))
        seen = np.all((self.words[word_idx] & bit) != 0, axis=1)
        np.bitwise_or.at(self.words, word_idx, bit)
        self.count += int((~seen).sum())
        return seen

    def check(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        word_idx = pos >> 6
        bit = np.uint64(1) << (pos & np.uint64(63))
        return np.all((self.words[word_idx] & bit) != 0, axis=1)

    def approx_size(self) -> int:
        return self.count


class ShardedSeenFilter:
    """Driver-side handle routing key batches to shard actors."""

    def __init__(self, num_shards: int = 16, bits_per_shard: int = 1 << 23):
        self.num_shards = num_shards
        self.shards: List = [
            _BloomShard.remote(bits_per_shard) for _ in range(num_shards)
        ]

    def _route(self, keys: Sequence[str]):
        hashes = hash64_batch(keys)
        shard_ids = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        return hashes, shard_ids

    def add_and_check(self, keys: Sequence[str]) -> np.ndarray:
        """Mark all keys seen; return already-seen mask (aligned to keys)."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        hashes, shard_ids = self._route(keys)
        result = np.zeros(len(keys), dtype=bool)
        futures = {}
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures[s] = (idx, self.shards[s].add_and_check.remote(hashes[idx]))
        for s, (idx, fut) in futures.items():
            result[idx] = ray.get(fut)
        return result

    def check(self, keys: Sequence[str]) -> np.ndarray:
        if not len(keys):
            return np.zeros(0, dtype=bool)
        hashes, shard_ids = self._route(keys)
        result = np.zeros(len(keys), dtype=bool)
        futures = {}
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures[s] = (idx, self.shards[s].check.remote(hashes[idx]))
        for s, (idx, fut) in futures.items():
            result[idx] = ray.get(fut)
        return result

    def approx_size(self) -> int:
        return sum(ray.get([s.approx_size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
