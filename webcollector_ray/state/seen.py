"""Sharded bloom/cuckoo URL-seen filter (north_rule ST2).

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

Two shard backends (pick via ShardedSeenFilter(backend=...)):
- "bloom" (_BloomShard, default): k=4 bit probes, cheapest per key,
  no deletion.
- "cuckoo" (_CuckooShard): partial-key cuckoo filter (Fan et al.,
  CoNEXT'14 — public algorithm): 16-bit fingerprints in 4-slot
  buckets, two candidate buckets i2 = i1 XOR hash(fp) (self-inverse,
  so eviction needs only the resident fingerprint). Same no-false-
  negative contract at ~0.1% fp for ~2 bytes/key, PLUS O(1) deletion
  — the backend a recrawl scheduler needs when URLs age out of the
  frontier and must become fetchable again (bloom bits can never be
  cleared without rebuilding the filter).
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


@ray.remote(num_cpus=0.1)
class _CuckooShard:
    """One cuckoo-filter partition: (num_buckets, 4) uint16 fingerprint
    table. Lookups and the common-case two-bucket placement are fully
    vectorized; only eviction chains (rare below ~84% load) fall to a
    bounded per-key kick loop. Fingerprint 0 is the empty sentinel
    (real fps are forced nonzero), and `fill` tracks per-bucket
    occupancy so placement ranks batch-local collisions without
    re-scanning slots."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        # ~0.84 max load factor for 4-slot partial-key cuckoo
        while nb * self.SLOTS * 0.84 < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        self.fill = np.zeros(nb, dtype=np.int64)
        # overflow keys after MAX_KICKS; counted so multiset add()
        # copies stay delete-balanced even in the stash
        self.stash: dict = {}
        self.count = 0
        self._kick_state = np.uint64(0x2545F4914F6CDD1D)

    # --- key derivation -------------------------------------------------
    def _fp(self, hashes: np.ndarray) -> np.ndarray:
        fp = (hashes >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes & self.mask).astype(np.int64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # self-inverse partner bucket: i XOR hash(fp)
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((idx.astype(np.uint64) ^ h) & self.mask).astype(np.int64)

    # --- vectorized membership ------------------------------------------
    def _contains(self, hashes: np.ndarray) -> np.ndarray:
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            hit |= np.fromiter(
                (int(h) in self.stash for h in hashes), bool, len(hashes)
            )
        return hit

    def check(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        return self._contains(hashes)

    # --- vectorized placement -------------------------------------------
    def _place_wave(self, fp: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Try to place fp[j] into bucket idx[j]'s free slots; returns
        the placed mask. Batch-local collisions on one bucket are
        ranked by sort order so each key gets a distinct slot."""
        order = np.argsort(idx, kind="stable")
        sidx, sfp = idx[order], fp[order]
        uniq, start, cnt = np.unique(
            sidx, return_index=True, return_counts=True
        )
        rank = np.arange(len(sidx)) - np.repeat(start, cnt)
        slot = self.fill[sidx] + rank
        ok = slot < self.SLOTS
        self.table[sidx[ok], slot[ok]] = sfp[ok]
        np.add.at(self.fill, sidx[ok], 1)
        placed = np.zeros(len(fp), dtype=bool)
        placed[order[ok]] = True
        return placed

    def _kick_insert(self, fp: int, i1: int, key_hash: int) -> None:
        """Bounded random-walk eviction for one key (rare path)."""
        cur_fp, cur_idx = np.uint16(fp), int(i1)
        for _ in range(self.MAX_KICKS):
            if self.fill[cur_idx] < self.SLOTS:
                self.table[cur_idx, self.fill[cur_idx]] = cur_fp
                self.fill[cur_idx] += 1
                return
            # deterministic xorshift slot pick (reproducible tests)
            s = self._kick_state
            s ^= s << np.uint64(13)
            s ^= s >> np.uint64(7)
            s ^= s << np.uint64(17)
            self._kick_state = s
            slot = int(s % np.uint64(self.SLOTS))
            victim = self.table[cur_idx, slot]
            self.table[cur_idx, slot] = cur_fp
            cur_fp = victim
            cur_idx = int(
                self._alt(
                    np.asarray([cur_idx], np.int64),
                    np.asarray([cur_fp], np.uint16),
                )[0]
            )
        # table effectively full: keep exactness in the stash
        k = int(key_hash)
        self.stash[k] = self.stash.get(k, 0) + 1

    def _insert(self, hashes: np.ndarray) -> None:
        """Store one fingerprint copy per element (two-bucket wave,
        then bounded kick walk for the stragglers)."""
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        placed = self._place_wave(fp, i1)
        if not placed.all():
            i2 = self._alt(i1[~placed], fp[~placed])
            placed2 = self._place_wave(fp[~placed], i2)
            rem = np.flatnonzero(~placed)[~placed2]
            for j in rem:
                self._kick_insert(int(fp[j]), int(i1[j]), int(hashes[j]))
        self.count += len(hashes)

    def add_and_check(self, hashes: np.ndarray) -> np.ndarray:
        """Insert keys not (probably) present; return mask of keys
        (probably) present BEFORE this call (pre-state, matching
        _BloomShard: intra-batch duplicates are each reported unseen).

        Space-bounded under re-adds (a key re-encountered at every
        crawl depth never grows the table), but NOT delete-safe: a
        false-positive "seen" skips the insert, so a later delete()
        of that key would strip a DIFFERENT key's fingerprint and
        create a false negative. Keys that may be delete()d must go
        through the multiset add() instead."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        seen = self._contains(hashes)
        new_h = np.unique(hashes[~seen])  # insert each new key once
        if len(new_h):
            self._insert(new_h)
        return seen

    def add(self, hashes: np.ndarray) -> np.ndarray:
        """Multiset insert: EVERY element stores a fingerprint copy,
        even when already (probably) present — the standard cuckoo
        insert (Fan et al. CoNEXT'14 §3: deletion is safe only for
        items actually inserted), and the only add that pairs with
        delete(). Returns the pre-state mask like add_and_check."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        seen = self._contains(hashes)
        self._insert(hashes)
        return seen

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one occurrence of each key (the operation blooms
        can't do); returns the was-present mask. Holes are closed by
        swapping the bucket's last occupied slot down, keeping `fill`
        a valid occupancy count."""
        out = np.zeros(len(hashes), dtype=bool)
        if len(hashes) == 0:
            return out
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        for j in range(len(hashes)):
            k = int(hashes[j])
            if k in self.stash:
                if self.stash[k] > 1:
                    self.stash[k] -= 1
                else:
                    del self.stash[k]
                out[j] = True
                self.count -= 1
                continue
            for b in (int(i1[j]), int(i2[j])):
                row = self.table[b]
                hits = np.flatnonzero(row[: self.fill[b]] == fp[j])
                if len(hits):
                    last = self.fill[b] - 1
                    row[hits[0]] = row[last]
                    row[last] = 0
                    self.fill[b] = last
                    out[j] = True
                    self.count -= 1
                    break
        return out

    def approx_size(self) -> int:
        return self.count


class ShardedSeenFilter:
    """Driver-side handle routing key batches to shard actors."""

    def __init__(
        self,
        num_shards: int = 16,
        bits_per_shard: int = 1 << 23,
        backend: str = "bloom",
    ):
        self.num_shards = num_shards
        self.backend = backend
        if backend == "bloom":
            self.shards: List = [
                _BloomShard.remote(bits_per_shard) for _ in range(num_shards)
            ]
        elif backend == "cuckoo":
            # size the cuckoo table for the key count a bloom of the
            # same bit budget would hold at ~10 bits/key
            capacity = max(1024, bits_per_shard // 10)
            self.shards = [
                _CuckooShard.remote(capacity) for _ in range(num_shards)
            ]
        else:
            raise ValueError(f"unknown seen-filter backend: {backend!r}")

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

    def add(self, keys: Sequence[str]) -> np.ndarray:
        """Multiset insert (cuckoo: one fingerprint copy per call even
        for keys already reported seen; bloom: identical to
        add_and_check). The ONLY add that is safe to pair with
        delete(): under add_and_check a false-positive 'seen' skips
        the insert, so deleting that key later would strip a
        different key's fingerprint. Returns the already-seen mask."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        hashes, shard_ids = self._route(keys)
        result = np.zeros(len(keys), dtype=bool)
        method = "add" if self.backend == "cuckoo" else "add_and_check"
        futures = {}
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures[s] = (
                    idx,
                    getattr(self.shards[s], method).remote(hashes[idx]),
                )
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

    def delete(self, keys: Sequence[str]) -> np.ndarray:
        """Unmark keys (cuckoo backend only): the recrawl path — a URL
        whose fetch record expired becomes generatable again without
        rebuilding the filter. Returns the was-present mask. Only
        sound for keys admitted via the multiset add() (every add
        stores a copy, so a delete can never strip another key's
        fingerprint); keys from add_and_check must not be deleted."""
        if self.backend != "cuckoo":
            raise NotImplementedError(
                "delete() needs the cuckoo backend; bloom bits cannot "
                "be cleared (backend=%r)" % self.backend
            )
        if not len(keys):
            return np.zeros(0, dtype=bool)
        hashes, shard_ids = self._route(keys)
        result = np.zeros(len(keys), dtype=bool)
        futures = {}
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures[s] = (idx, self.shards[s].delete.remote(hashes[idx]))
        for s, (idx, fut) in futures.items():
            result[idx] = ray.get(fut)
        return result

    def approx_size(self) -> int:
        return sum(ray.get([s.approx_size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
