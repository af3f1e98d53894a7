"""Merge shuffle, sharded bloom seen filter, bucketed page store."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from webcollector_ray.model import CrawlDatum, datums_to_table
from webcollector_ray.stages.merge import dedupe_by_key, merge_segments
from webcollector_ray.sources.pagestore import (
    BroadcastPageStore,
    PageStoreReader,
    build_bucketed_store,
)
from webcollector_ray.state.seen import ShardedSeenFilter, hash64_batch
from webcollector_ray.synth import SynthSpec, synth_pages_table


def _ds(rows):
    return rd.from_arrow(datums_to_table([CrawlDatum(**r) for r in rows]))


def test_merge_precedence(ray_session):
    # fetch overwrites crawldb; link only if absent (RocksDBManager.java:160-197)
    crawldb = _ds([
        dict(url="http://a/1", status=0, execute_time=1),
        dict(url="http://a/2", status=5, execute_time=1),
    ])
    fetch = _ds([dict(url="http://a/1", status=5, execute_time=2, execute_count=1)])
    link = _ds([
        dict(url="http://a/2", status=0, execute_time=2),   # loses to crawldb
        dict(url="http://a/3", status=0, execute_time=2),   # new -> inserted
        dict(url="http://a/3", status=0, execute_time=2, meta={"referer": "zzz"}),  # dup link
    ])
    out = merge_segments(crawldb, fetch, link, num_buckets=4).to_pandas().set_index("key")
    assert len(out) == 3
    assert out.loc["http://a/1", "status"] == 5        # fetch overwrote
    assert out.loc["http://a/1", "execute_count"] == 1
    assert out.loc["http://a/2", "status"] == 5        # crawldb kept over link
    # deterministic link tie-break: smallest meta ('' < '{"referer"...}')
    assert out.loc["http://a/3", "meta"] == ""


def test_dedupe_single_source_removes_dups(ray_session):
    link = _ds([
        dict(url="http://a/x", status=0, execute_time=1),
        dict(url="http://a/x", status=0, execute_time=1),
    ])
    out = dedupe_by_key([(link, 0)], num_buckets=2).to_pandas()
    assert len(out) == 1


def test_merge_schema_stable(ray_session):
    out = merge_segments(
        _ds([dict(url="http://a/1", status=0, execute_time=1)]), None, None, 2
    )
    sch = out.schema()
    assert sch.names == [
        "key", "url", "status", "execute_time", "execute_count", "code",
        "location", "meta",
    ]
    t = out.to_arrow_refs()
    assert t is not None


def test_bloom_no_false_negatives(ray_session):
    f = ShardedSeenFilter(num_shards=4, bits_per_shard=1 << 16)
    keys = [f"http://h{i}.test/p{i}" for i in range(500)]
    first = f.add_and_check(keys)
    assert not first.any()          # nothing seen before
    second = f.check(keys)
    assert second.all()             # everything seen after (no false negatives)
    other = f.check([f"http://new{i}.test/" for i in range(500)])
    assert other.sum() < 25         # low fp rate at this load factor
    assert f.approx_size() == 500
    f.shutdown()


def test_hash64_deterministic():
    a = hash64_batch(["x", "y"])
    b = hash64_batch(["x", "y"])
    assert np.array_equal(a, b)


@pytest.fixture(scope="module")
def pages_tbl():
    return synth_pages_table(SynthSpec(num_sites=3))


def test_bucketed_store_equals_broadcast(ray_session, pages_tbl, tmp_path):
    store_dir = str(tmp_path / "pstore")
    build_bucketed_store(pages_tbl, store_dir, num_buckets=7)
    broadcast = PageStoreReader(BroadcastPageStore(pages_tbl).handle())
    bucketed = PageStoreReader(
        {"kind": "bucketed", "dir": store_dir, "num_buckets": 7}, cache_buckets=3
    )
    urls = pages_tbl["url"].to_pylist()
    for u in urls:
        a, b = broadcast.get(u), bucketed.get(u)
        assert a == b, u
    assert bucketed.get("http://nope.test/") is None
    assert broadcast.get("http://nope.test/") is None


def test_bucketed_store_defaults_for_bare_schema(ray_session, tmp_path):
    # input_hint-only table: no code/location/content_type columns
    bare = pa.table({
        "url": ["http://x.test/a"],
        "warc_ts": pa.array([0], pa.timestamp("ms")),
        "html": [b"<body>hi</body>"],
        "text": ["hi"],
        "lang": ["en"],
    })
    r = PageStoreReader(BroadcastPageStore(bare).handle())
    row = r.get("http://x.test/a")
    assert row["code"] == 200 and row["content_type"] == "text/html"


def test_cuckoo_no_false_negatives_and_delete(ray_session):
    f = ShardedSeenFilter(
        num_shards=4, bits_per_shard=1 << 16, backend="cuckoo"
    )
    keys = [f"http://h{i}.test/p{i}" for i in range(500)]
    # delete-paired inserts go through the multiset add() (every add
    # stores a copy, so delete never strips another key's fingerprint)
    first = f.add(keys)
    assert not first.any()            # nothing seen before
    assert f.check(keys).all()        # no false negatives after insert
    other = f.check([f"http://new{i}.test/" for i in range(500)])
    assert other.sum() < 10           # 16-bit fp => ~0.1% fp rate
    assert f.approx_size() == 500

    # the cuckoo-only capability: unmark half the keys, the rest stay
    dropped = f.delete(keys[:250])
    assert dropped.all()
    assert not f.check(keys[:250]).any()
    assert f.check(keys[250:]).all()
    assert f.approx_size() == 250
    # deleting an absent key reports False and is a no-op
    assert not f.delete(["http://absent.test/"]).any()
    f.shutdown()


def test_cuckoo_multiset_add_keeps_colliding_key_after_delete(ray_session):
    # regression: two DISTINCT keys engineered to share fingerprint
    # (bits 48-63) and primary bucket (low bits) — under multiset
    # add(), deleting one must not create a false negative for the
    # other (add_and_check would have skipped the second insert on
    # the false-positive 'seen' and left delete() unbalanced)
    import ray

    from webcollector_ray.state.seen import _CuckooShard

    s = _CuckooShard.remote(1024)
    h1 = np.array([0x123456789ABCDEF0], dtype=np.uint64)
    h2 = h1 ^ np.uint64(1 << 20)  # same fp, same buckets, different key
    assert not ray.get(s.add.remote(h1))[0]
    assert ray.get(s.add.remote(h2))[0]    # collision: reported seen
    assert ray.get(s.delete.remote(h2))[0]  # removes h2's OWN copy
    assert ray.get(s.check.remote(h1))[0]   # h1 survives
    assert ray.get(s.delete.remote(h1))[0]
    assert not ray.get(s.check.remote(h1))[0]


def test_cuckoo_multiset_add_delete_balance(ray_session):
    # N adds of one key support exactly N deletes
    f = ShardedSeenFilter(num_shards=1, bits_per_shard=1 << 14,
                          backend="cuckoo")
    k = ["http://recrawl.test/"]
    assert not f.add(k)[0]
    assert f.add(k)[0]
    assert f.add(k)[0]
    assert f.delete(k)[0] and f.delete(k)[0] and f.delete(k)[0]
    assert not f.check(k)[0]
    assert not f.delete(k)[0]
    f.shutdown()


def test_cuckoo_eviction_chains_stay_exact(ray_session):
    # one tiny shard forced well past free-slot placement: eviction
    # kicks (and possibly the stash) must preserve no-false-negatives
    f = ShardedSeenFilter(num_shards=1, bits_per_shard=10 * 1024,
                          backend="cuckoo")
    keys = [f"http://dense{i}.test/" for i in range(900)]
    f.add_and_check(keys)
    assert f.check(keys).all()
    f.shutdown()


def test_cuckoo_intra_batch_duplicates_match_bloom_semantics(ray_session):
    # pre-state seen mask: duplicates within ONE batch all report
    # unseen (exact dedup is the merge's job, both backends agree)
    for backend in ("bloom", "cuckoo"):
        f = ShardedSeenFilter(num_shards=2, bits_per_shard=1 << 16,
                              backend=backend)
        dup = ["http://a.test/", "http://a.test/", "http://b.test/"]
        mask = f.add_and_check(dup)
        assert not mask.any(), backend
        assert f.check(dup).all(), backend
        f.shutdown()


def test_seen_filter_unknown_backend_raises(ray_session):
    with pytest.raises(ValueError):
        ShardedSeenFilter(num_shards=1, backend="what")
