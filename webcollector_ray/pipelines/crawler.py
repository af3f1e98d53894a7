"""Crawler driver loop — BreadthCrawler / RamCrawler equivalents.

Reference lifecycle (crawler/Crawler.java:95-148, SURVEY.md §3.1):
setup -> inject seeds -> for each depth: merge previous segments into
crawldb, generate (filters + topN), fetch+visit every generated datum,
write fetch/link segments; break early when totalGenerate == 0.

Ray mapping: every table is a ray.data.Dataset; each depth is

    crawldb = merge(crawldb, fetch_seg, link_seg)        # ONE shuffle
    generated = generate(crawldb)                        # streamed filter
    exec_out = generated.map_batches(ExecuteStage, ...)  # actor pool
    fetch_seg, link_seg = split(exec_out)                # streamed filter

with the merged crawldb and the segments either checkpointed to
Parquet (`crawl_path` mode == reference BreadthCrawler with RocksDB,
plugin/rocks/BreadthCrawler.java:32-48) or pinned in the object store
(`RamCrawler`, plugin/ram/RamCrawler.java:28-44).

totalGenerate == number of fetch-segment rows (every generated datum
writes exactly one fetch row, Fetcher.java:267), so the termination
count is read from Parquet metadata / materialized block counts — no
extra pass over the frontier.

Divergence note: on depth-exhaustion the reference leaves the last
segments unmerged until a hypothetical next run's first merge; this
driver folds them with a final merge so the returned crawldb is the
fixed point (identical to what the reference would hold after its next
start()).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Union

import pyarrow as pa

import ray
import ray.data as rd

from ..config import CrawlerConfig
from ..dispatch import Visitor
from ..model import (
    FRONTIER_SCHEMA,
    STATUS_DB_FAILED,
    STATUS_DB_SUCCESS,
    CrawlDatum,
    datums_to_table,
)
from ..regex_rule import RegexRule
from ..sources.pagestore import BroadcastPageStore, BucketedPageStore
from ..stages.execute import run_execute
from ..stages.generate import generate
from ..stages.merge import dedupe_by_key, dedupe_by_key_refs, merge_segments
from ..state.frontier import CheckpointStore
from ..state.seen import ShardedSeenFilter


@dataclass
class DepthMetrics:
    depth: int
    generated: int = 0
    fetch_success: int = 0
    fetch_failed: int = 0
    links: int = 0
    crawldb_size: int = 0
    seconds: float = 0.0


@dataclass
class CrawlResult:
    depths: List[DepthMetrics] = field(default_factory=list)
    crawldb = None  # ray.data.Dataset of the final frontier
    seconds: float = 0.0

    @property
    def total_fetched(self) -> int:
        return sum(d.generated for d in self.depths)

    @property
    def total_links(self) -> int:
        return sum(d.links for d in self.depths)


def _split_seg(exec_out, seg: str):
    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.equal(batch["seg"], seg))
        return out.drop_columns(["seg"])

    return exec_out.map_batches(f, batch_format="pyarrow")


@ray.remote
def _split_links_by_shard(table: pa.Table, num_shards: int):
    """Partition a link block by seen-filter shard id (hash column
    rides along as __h so the shard task doesn't re-hash)."""
    import numpy as np

    from ..state.seen import hash64_batch

    if "key" not in table.column_names or len(table) == 0:
        out = [None] * num_shards
        return out[0] if num_shards == 1 else tuple(out)
    hashes = hash64_batch(table["key"].to_pylist())
    table = table.append_column("__h", pa.array(hashes))
    sid = (hashes % np.uint64(num_shards)).astype(np.int64)
    order = np.argsort(sid, kind="stable")
    bounds = np.searchsorted(sid[order], np.arange(num_shards + 1))
    shuffled = table.take(pa.array(order))
    out = []
    for i in range(num_shards):
        lo, hi = bounds[i], bounds[i + 1]
        out.append(shuffled.slice(lo, hi - lo) if hi > lo else None)
    return out[0] if num_shards == 1 else tuple(out)


@ray.remote(num_returns=2)
def _filter_links_shard(shard_actor, *parts):
    """One task per shard per depth: concat this shard's link rows,
    ONE add_and_check round-trip, keep probably-unseen rows."""
    import numpy as np

    tables = [t for t in parts if t is not None and len(t)]
    if not tables:
        return FRONTIER_SCHEMA.empty_table(), 0
    cat = pa.concat_tables(tables, promote_options="permissive")
    hashes = np.asarray(cat["__h"].to_pylist(), dtype=np.uint64)
    seen = ray.get(shard_actor.add_and_check.remote(hashes))
    kept = cat.filter(pa.array(~seen)).drop_columns(["__h"])
    return kept, len(kept)


@ray.remote
def _count_generate_eligible(max_count: int, block: pa.Table) -> int:
    """Rows the default G1/G2 generate predicate would keep (status !=
    SUCCESS and execute_count <= max). User generator filters and topN
    can only DROP among these, so 0 here ⇒ generate output is 0 for
    every configuration."""
    import pyarrow.compute as pc

    if block is None or len(block) == 0 or "status" not in block.column_names:
        return 0
    mask = pc.and_(
        pc.not_equal(block["status"], STATUS_DB_SUCCESS),
        pc.less_equal(block["execute_count"], max_count),
    )
    return int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)


@ray.remote(num_returns=3)
def _split_exec_block(table: pa.Table):
    """One executed block -> (fetch rows, link rows, tallies). A raw
    task wave over the materialized blocks replaces three separate
    Dataset executions per depth (two filter passes + a status-tally
    pass) — each execution costs ~0.3-0.5 s of fixed streaming-executor
    latency, which dominated small/medium depths."""
    import pyarrow.compute as pc

    if "seg" not in table.column_names:  # schema-less empty block
        empty = FRONTIER_SCHEMA.empty_table()
        return empty, empty, {"n_fetch": 0, "n_link": 0, "ok": 0, "fail": 0}
    fmask = pc.equal(table["seg"], "fetch")
    fetch = table.filter(fmask).drop_columns(["seg"])
    link = table.filter(pc.invert(fmask)).drop_columns(["seg"])
    ok = (
        pc.sum(
            pc.cast(pc.equal(fetch["status"], STATUS_DB_SUCCESS), pa.int64())
        ).as_py()
        or 0
    )
    stats = {
        "n_fetch": len(fetch),
        "n_link": len(link),
        "ok": int(ok),
        "fail": len(fetch) - int(ok),
    }
    return fetch, link, stats


class Crawler:
    """Engine driver. `pages` is the web: a pyarrow Table (broadcast), a
    BroadcastPageStore / BucketedPageStore, or a path to a bucketed
    store dir."""

    def __init__(
        self,
        pages: Union[pa.Table, BroadcastPageStore, BucketedPageStore, str],
        *,
        crawl_path: Optional[str] = None,
        visitor: Optional[Visitor] = None,
        executor: Optional[Callable] = None,
        auto_parse: bool = True,
        config: Optional[CrawlerConfig] = None,
        next_filter: Optional[Callable] = None,
        generator_filter: Optional[Callable] = None,
        deterministic_time: bool = False,
    ):
        self._pages = pages
        self.crawl_path = crawl_path
        self.visitor = visitor
        self.executor = executor
        self.auto_parse = auto_parse
        self.config = config or CrawlerConfig()
        self.next_filter = next_filter
        self.generator_filter = generator_filter
        self.deterministic_time = deterministic_time
        self.regex_rule = RegexRule()
        self._seeds: List[CrawlDatum] = []
        self._forced_seeds: List[CrawlDatum] = []
        self.seen: Optional[ShardedSeenFilter] = None

    # --- seeds (crawler/Crawler.java:169-330 addSeed variants) ---
    def add_seed(self, seed, force: bool = False, type: Optional[str] = None):
        target = self._forced_seeds if force else self._seeds
        if isinstance(seed, CrawlDatum):
            target.append(seed)
        elif isinstance(seed, str):
            d = CrawlDatum(seed)
            if type is not None:
                d.set_type(type)
            target.append(d)
        else:
            for s in seed:
                self.add_seed(s, force=force, type=type)
        return self

    def add_regex(self, rule: str):
        self.regex_rule.add_rule(rule)
        return self

    # --- page store ---
    def _store_handle(self) -> dict:
        p = self._pages
        if isinstance(p, pa.Table):
            p = BroadcastPageStore(p)
        elif isinstance(p, str):
            p = BucketedPageStore(p)
        self._pages = p
        return p.handle()

    # --- inject (crawldb/Injector.java; DBManager.inject :49-86):
    # forced seeds overwrite existing keys, plain seeds insert-if-absent.
    def _inject(self, crawldb):
        seed_tbls = []
        if self._forced_seeds:
            seed_tbls.append((rd.from_arrow(datums_to_table(self._dedupe_seeds(self._forced_seeds, last_wins=True))), 0))
        if crawldb is not None:
            seed_tbls.append((crawldb, 1))
        if self._seeds:
            seed_tbls.append((rd.from_arrow(datums_to_table(self._dedupe_seeds(self._seeds, last_wins=False))), 2))
        if not seed_tbls:
            raise ValueError("Please add at least one seed")  # Crawler.java:106-109
        return dedupe_by_key(seed_tbls, self.config.merge_num_buckets)

    @staticmethod
    def _dedupe_seeds(datums: List[CrawlDatum], last_wins: bool) -> List[CrawlDatum]:
        seen: dict = {}
        for d in datums:
            if last_wins or d.key not in seen:
                seen[d.key] = d
        return list(seen.values())

    # --- host-coherent routing for politeness (north_rule F4) ---
    def _route_by_host(self, generated):
        """Route the fetch list so each host's rows land in EXACTLY ONE
        output block: routes are hash-bucketed and each bucket becomes
        one block via groupby(bucket).map_groups. Ray Data never splits
        a block across map_batches tasks, so all of a host's fetches run
        inside one ExecuteStage instance and its per-host token bucket
        is globally serializing — two actors can never interleave one
        host (the invariant the per-actor budget state depends on;
        pinned by test_politeness_host_single_block).

        Hot-host skew handling: hosts with more than
        `host_salt_threshold` rows this depth get a salt suffix
        (url-hash modulo ceil(n/threshold)) so one mega-host spreads
        over several buckets/actors instead of serializing the whole
        depth — deliberately trading per-host rate precision (the
        budget then applies per salt shard) for wall-clock, documented
        in SURVEY.md §4 'skew / hot hosts'."""
        import numpy as np
        import pandas as pd

        generated = generated.materialize()
        threshold = self.config.host_salt_threshold

        from ..functions.joins import exchange_reduce
        from ..model import FRONTIER_SCHEMA
        from ..urls import hosts_of_array, url_hash64

        hot: dict = {}
        # if the whole frontier holds <= threshold rows no host can be
        # hot — skip the census execution (count() is metadata-free on a
        # materialized dataset)
        if threshold > 0 and generated.count() > threshold:
            # hot-host census, distributed (VERDICT r2 §wrong.3): each
            # block emits per-host PARTIAL counts (vectorized extract +
            # value_counts), one host-hash exchange sums them, and only
            # hosts ABOVE the threshold come back to the driver — the
            # hot list is tiny by definition, the all-hosts dict never
            # exists anywhere.
            import zlib as _zlib

            census_buckets = 32

            def census_local(batch: pa.Table) -> pa.Table:
                hosts = hosts_of_array(batch["url"])
                vc = pd.Series(hosts).value_counts()
                hs = vc.index.to_numpy(dtype=object)
                bk = np.fromiter(
                    (_zlib.crc32(h.encode()) % census_buckets for h in hs),
                    dtype=np.int32, count=len(hs),
                )
                return pa.table({
                    "host": pa.array(hs, pa.string()),
                    "n": pa.array(vc.to_numpy(), pa.int64()),
                    "__bucket": pa.array(bk),
                })

            def census_hot(t: pa.Table) -> pa.Table:
                g = t.to_pandas().groupby("host", sort=False)["n"].sum()
                g = g[g > threshold]
                return pa.table({
                    "host": pa.array(g.index.to_numpy(dtype=object), pa.string()),
                    "salts": pa.array(
                        (g.to_numpy() // threshold + 1), pa.int64()
                    ),
                })

            census_empty = pa.table({
                "host": pa.array([], pa.string()),
                "salts": pa.array([], pa.int64()),
            })
            # concat arrow refs (Dataset.to_pandas drops the schema
            # when every block is 0-row — the usual no-hot-host case)
            hot_tbl = pa.concat_tables(
                ray.get(
                    list(
                        exchange_reduce(
                            generated.map_batches(
                                census_local, batch_format="pyarrow"
                            ),
                            census_hot, census_empty, census_buckets,
                        ).to_arrow_refs()
                    )
                ),
                promote_options="permissive",
            )
            hot = dict(
                zip(
                    hot_tbl["host"].to_pylist(),
                    hot_tbl["salts"].to_pylist(),
                )
            )

        n_buckets = max(self.config.fetch_concurrency * 2, 4)

        def add_route(batch: pa.Table) -> pa.Table:
            import zlib as _zlib

            hosts = hosts_of_array(batch["url"])
            codes, uniques = pd.factorize(hosts)
            routes = uniques.astype(object)[codes]
            if hot:
                # per-URL salt only for rows on hot hosts (rare rows)
                hot_mask = np.isin(uniques, list(hot.keys()))[codes]
                if hot_mask.any():
                    urls = np.asarray(batch["url"].to_pylist(), dtype=object)
                    for i in np.nonzero(hot_mask)[0]:
                        h = routes[i]
                        routes[i] = f"{h}#{url_hash64(urls[i]) % hot[h]}"
            # crc32 per DISTINCT route, broadcast back through codes
            rcodes, runiq = pd.factorize(pd.Series(routes, dtype="object"))
            rbk = np.fromiter(
                (_zlib.crc32(x.encode()) % n_buckets for x in runiq),
                dtype=np.int32, count=len(runiq),
            )
            batch = batch.append_column(
                "__host", pa.array(routes, pa.string())
            )
            return batch.append_column(
                "__bucket", pa.array(rbk[rcodes], pa.int32())
            )

        def one_block_per_bucket(t: "pa.Table") -> "pa.Table":
            # INTERLEAVE hosts (round-robin by per-host rank) instead of
            # grouping each host contiguously: consecutive same-host
            # fetches are then separated by the other hosts' work, so
            # the per-host token bucket rarely has to sleep — per-task
            # wall time drops from sum(host_pages)*budget to
            # ~max(total_work, max_host_pages*budget). The invariant is
            # untouched: a host still lives in exactly one block/task.
            df = t.to_pandas().sort_values(
                ["__host", "key"], kind="mergesort"
            )
            df["__rank"] = df.groupby("__host", sort=False).cumcount()
            df = df.sort_values(
                ["__rank", "__host", "key"], kind="mergesort"
            ).drop(columns=["__host", "__bucket", "__rank"])
            return pa.Table.from_pandas(df, preserve_index=False).select(
                FRONTIER_SCHEMA.names
            )

        # the raw-task exchange replaces a per-depth sort shuffle; its
        # output is materialized refs, so the stateful ACTOR pool that
        # follows (which can reserve every cluster CPU) never starves a
        # still-lazy upstream and the depth cannot deadlock. Frontier
        # rows are compact (no html), so this is cheap.
        empty = FRONTIER_SCHEMA.empty_table()
        return exchange_reduce(
            generated.map_batches(add_route, batch_format="pyarrow"),
            one_block_per_bucket, empty, n_buckets,
        )

    def _filter_links_approx(self, link_seg):
        """approximate_seen: pre-drop links whose key is (probably)
        already in the frontier, before they reach the merge shuffle."""
        seen = self.seen
        shards = seen.shards
        num_shards = seen.num_shards

        def f(batch: pa.Table) -> pa.Table:
            import numpy as np

            import ray as _ray

            from ..state.seen import hash64_batch

            keys = batch["key"].to_pylist()
            if not keys:
                return batch
            hashes = hash64_batch(keys)
            shard_ids = (hashes % np.uint64(num_shards)).astype(np.int64)
            seen_mask = np.zeros(len(keys), dtype=bool)
            futs = {}
            for s in range(num_shards):
                idx = np.nonzero(shard_ids == s)[0]
                if len(idx):
                    futs[s] = (idx, shards[s].add_and_check.remote(hashes[idx]))
            for s, (idx, fut) in futs.items():
                seen_mask[idx] = _ray.get(fut)
            return batch.filter(pa.array(~seen_mask))

        return link_seg.map_batches(f, batch_format="pyarrow")

    # --- store-bucket-coherent routing (scale path J3) ---
    def _route_by_store_bucket(self, generated, num_buckets: int):
        """Group the fetch list by the bucketed page store's own
        md5(url) % B partition id, so each fetch task's batch touches
        O(1) store buckets and the per-worker LRU bucket cache actually
        hits — without this, random batches read ~batch_size distinct
        buckets each at 100 TB store scale.

        Physical plan: the same raw-task bucket exchange every other
        wide step uses (store-bucket id folded into a bounded number of
        exchange buckets, rows ordered by (store bucket, key) inside
        each output block) — not a global Dataset.sort, which costs a
        sample + per-block sort + merge wave per depth (VERDICT r2
        §next.8)."""
        import numpy as np
        import pandas as pd

        from ..functions.joins import exchange_reduce
        from ..urls import url_hash64

        n_x = max(4, min(num_buckets, self.config.fetch_concurrency * 2))

        def add_bucket(batch: pa.Table) -> pa.Table:
            # md5 only the DISTINCT urls, broadcast through factorize
            # codes (same pattern as add_route's crc32) — the md5 must
            # equal the store's own partitioning hash, so it can't be
            # swapped for a vectorized hash, but it never runs per row
            codes, uniq = pd.factorize(
                batch["url"].to_pandas(), use_na_sentinel=False
            )
            ub = np.fromiter(
                (url_hash64(u) % num_buckets for u in uniq),
                dtype=np.int64, count=len(uniq),
            )
            sb = ub[codes]
            batch = batch.append_column(
                "__sbucket", pa.array(sb, pa.int32())
            )
            return batch.append_column(
                "__bucket", pa.array(sb % n_x, pa.int32())
            )

        def order_block(t: pa.Table) -> pa.Table:
            return t.sort_by(
                [("__sbucket", "ascending"), ("key", "ascending")]
            ).select(FRONTIER_SCHEMA.names)

        return exchange_reduce(
            generated.map_batches(add_bucket, batch_format="pyarrow"),
            order_block, FRONTIER_SCHEMA.empty_table(), n_x,
        )

    # --- the depth loop ---
    def start(self, depth: int) -> CrawlResult:
        cfg = self.config
        t0 = time.time()
        store_handle = self._store_handle()
        result = CrawlResult()

        ckpt: Optional[CheckpointStore] = (
            CheckpointStore(self.crawl_path) if self.crawl_path else None
        )
        crawldb = fetch_seg = link_seg = None
        start_depth = 0
        resumed = False
        if ckpt is not None:
            if not cfg.resumable:
                ckpt.clear()  # Crawler.java:101-110
            else:
                last = ckpt.latest_complete_depth()
                if last is not None:
                    crawldb = ckpt.read_dataset(last, "crawldb")
                    fetch_seg = ckpt.read_dataset(last, "fetch") if ckpt.has_table(last, "fetch") else None
                    link_seg = ckpt.read_dataset(last, "link") if ckpt.has_table(last, "link") else None
                    start_depth = last + 1
                    resumed = True

        if cfg.approximate_seen and self.seen is None:
            self.seen = ShardedSeenFilter(
                cfg.seen_shards, cfg.seen_bits_per_shard,
                backend=cfg.seen_backend,
            )

        if not resumed:
            crawldb = self._inject(crawldb)
            if self.seen is not None:
                # ONE batched probe: a per-seed call is a synchronous
                # actor round-trip each (75 s for 15k seeds)
                keys = [d.key for d in self._seeds + self._forced_seeds]
                if keys:
                    self.seen.add_and_check(keys)

        for i in range(start_depth, start_depth + depth):
            dt0 = time.time()
            m = DepthMetrics(depth=i)

            # 1. merge previous segments (Fetcher.fetchAll step a):
            # raw-task hash exchange; frontier sizes ride back on tiny
            # count refs instead of a Dataset count() execution
            if fetch_seg is not None or link_seg is not None:
                parts = [(fetch_seg, 0)] if fetch_seg is not None else []
                if crawldb is not None:
                    parts.append((crawldb, 1))
                if link_seg is not None:
                    parts.append((link_seg, 2))
                # A2 early termination input rides back WITH the merge:
                # each reduce bucket also returns its generate-eligible
                # count (default G1/G2 predicate; user filters/topN can
                # only DROP among those rows) — no extra task wave
                table_refs, count_refs, elig_refs = dedupe_by_key_refs(
                    parts, cfg.merge_num_buckets,
                    eligible_max_count=cfg.max_execute_count,
                )
                crawldb = rd.from_arrow_refs(table_refs)
                m.crawldb_size = sum(ray.get(count_refs))
                eligible = sum(ray.get(elig_refs))
            else:
                crawldb = crawldb.materialize()
                m.crawldb_size = crawldb.count()
                # no merge this depth (fresh inject): one tiny wave
                eligible = sum(
                    ray.get(
                        [
                            _count_generate_eligible.remote(
                                cfg.max_execute_count, r
                            )
                            for r in crawldb.to_arrow_refs()
                        ]
                    )
                )
            if ckpt is not None:
                ckpt.write_table(crawldb, i, "crawldb")
                if cfg.checkpoint_readback:
                    # swap refs for the parquet copy so the object
                    # store can evict frontier state (100TB mode)
                    crawldb = ckpt.read_dataset(i, "crawldb")

            if eligible == 0:
                m.seconds = time.time() - dt0
                result.depths.append(m)
                if ckpt is not None:
                    ckpt.write_manifest(
                        i,
                        {
                            "depth": i,
                            "generated": 0,
                            "links": 0,
                            "fetch_success": 0,
                            "fetch_failed": 0,
                            "crawldb_size": m.crawldb_size,
                            "seconds": m.seconds,
                        },
                    )
                fetch_seg = link_seg = None
                break

            # 2. generate (G1-G4 + topN) + routing: politeness wins
            # (hosts), else store-bucket locality for bucketed stores
            generated = generate(crawldb, cfg, self.generator_filter)
            if cfg.politeness_budget_ms > 0:
                generated = self._route_by_host(generated)
            elif store_handle.get("kind") == "bucketed":
                generated = self._route_by_store_bucket(
                    generated, store_handle["num_buckets"]
                )

            # 3. execute: fused generate-filter + fetch + visit — the
            # depth's ONE Dataset execution
            exec_out = run_execute(
                generated,
                store_handle,
                config=cfg,
                repartition_input=False,
                execute_time_ms=(1_000_000 + i) if self.deterministic_time else None,
                visitor=self.visitor,
                executor=self.executor,
                auto_parse=self.auto_parse,
                regex_rule=self.regex_rule,
                next_filter=self.next_filter,
            ).materialize()

            # 4. split + status tallies (A3) in one raw-task wave
            frefs, lrefs, srefs = [], [], []
            for bref in exec_out.to_arrow_refs():
                f_r, l_r, s_r = _split_exec_block.remote(bref)
                frefs.append(f_r)
                lrefs.append(l_r)
                srefs.append(s_r)
            stats = ray.get(srefs)
            m.generated = sum(s["n_fetch"] for s in stats)
            m.links = sum(s["n_link"] for s in stats)
            m.fetch_success = sum(s["ok"] for s in stats)
            m.fetch_failed = sum(s["fail"] for s in stats)
            fetch_seg = rd.from_arrow_refs(frefs) if frefs else None
            link_seg = rd.from_arrow_refs(lrefs) if lrefs else None
            if self.seen is not None and link_seg is not None:
                # shard-coherent bloom pre-drop: split each link block
                # by shard id, then ONE add_and_check per shard per
                # depth — per-batch synchronous probes serialized the
                # whole stage (4.7x slower than no filter at 300k pages)
                S = self.seen.num_shards
                split = [
                    _split_links_by_shard.options(num_returns=S).remote(
                        r, S
                    )
                    for r in lrefs
                ]
                if S == 1:
                    split = [[s] for s in split]
                kept_refs, cnt_refs = [], []
                for s in range(S):
                    k_r, c_r = _filter_links_shard.remote(
                        self.seen.shards[s], *[sp[s] for sp in split]
                    )
                    kept_refs.append(k_r)
                    cnt_refs.append(c_r)
                link_seg = rd.from_arrow_refs(kept_refs)
                m.links = sum(ray.get(cnt_refs))
            if ckpt is not None:
                if fetch_seg is not None:
                    ckpt.write_table(fetch_seg, i, "fetch")
                    if cfg.checkpoint_readback:
                        fetch_seg = ckpt.read_dataset(i, "fetch")
                if link_seg is not None:
                    ckpt.write_table(link_seg, i, "link")
                    if cfg.checkpoint_readback:
                        link_seg = ckpt.read_dataset(i, "link")

            m.seconds = time.time() - dt0
            result.depths.append(m)
            if ckpt is not None:
                ckpt.write_manifest(
                    i,
                    {
                        "depth": i,
                        "generated": m.generated,
                        "links": m.links,
                        "fetch_success": m.fetch_success,
                        "fetch_failed": m.fetch_failed,
                        "crawldb_size": m.crawldb_size,
                        "seconds": m.seconds,
                    },
                )
            if m.generated == 0:  # Crawler.java:141-144
                fetch_seg = link_seg = None
                break

        # fold trailing segments so the returned crawldb is the fixed point
        if fetch_seg is not None or link_seg is not None:
            crawldb = merge_segments(
                crawldb, fetch_seg, link_seg, cfg.merge_num_buckets
            )
            crawldb = crawldb.materialize()
            if ckpt is not None:
                final_depth = result.depths[-1].depth if result.depths else 0
                ckpt.write_table(crawldb, final_depth, "crawldb_final")

        result.crawldb = crawldb
        result.seconds = time.time() - t0
        return result


class BreadthCrawler(Crawler):
    """plugin/rocks/BreadthCrawler.java equivalent: checkpointed crawldb
    + visitor + autoParse."""

    def __init__(self, crawl_path: str, auto_parse: bool, pages, **kw):
        super().__init__(pages, crawl_path=crawl_path, auto_parse=auto_parse, **kw)


class RamCrawler(Crawler):
    """plugin/ram/RamCrawler.java equivalent: in-memory crawl;
    start() runs until frontier exhaustion (RamCrawler.java:40-42)."""

    def __init__(self, pages, auto_parse: bool = True, **kw):
        super().__init__(pages, crawl_path=None, auto_parse=auto_parse, **kw)

    def start(self, depth: Optional[int] = None) -> CrawlResult:
        return super().start(depth if depth is not None else 2**31 - 1)
