"""End-to-end crawl conformance (FIXTURES.md F3/F4).

A dict-based sequential crawler (below) independently implements the
reference semantics (merge precedence RocksDBManager.java:160-197,
generate filters Generator.java:49-78, fetch/status bookkeeping
Fetcher.java:244-274); the distributed engine must produce identical
per-depth generated key sets, final URL-seen set, statuses and
execute counts.
"""

import os

import pyarrow.parquet as pq
import pytest

from webcollector_ray.charset import decode_html
from webcollector_ray.config import CrawlerConfig
from webcollector_ray.dispatch import Visitor, VisitorMethodDispatcher
from webcollector_ray.model import (
    STATUS_DB_FAILED,
    STATUS_DB_SUCCESS,
    CrawlDatum,
    CrawlDatums,
)
from webcollector_ray.page import Page
from webcollector_ray.pipelines.crawler import BreadthCrawler, RamCrawler
from webcollector_ray.regex_rule import RegexRule
from webcollector_ray.stages.execute import SUCCESS_CODES
from webcollector_ray.synth import SynthSpec, synth_pages_table

SPEC = SynthSpec(num_sites=2, redirects_per_site=1, failures_per_site=1)
REGEX = r"http://site[0-9]+\.test/(list|show)-[0-9]+\.html"


def sequential_crawl(
    pages, seeds, rules, depth, config, visitor=None, next_filter=None
):
    """Single-process reference model over plain dicts."""
    store = {}
    d = pages.to_pydict()
    for i in range(len(pages)):
        store[d["url"][i]] = {k: d[k][i] for k in pages.column_names}
    rule = RegexRule(rules)
    dispatcher = VisitorMethodDispatcher(
        visitor or Visitor(), auto_parse=True, regex_rule=rule
    )
    crawldb = {}
    for s in seeds:
        crawldb.setdefault(s, CrawlDatum(s, execute_time=0))
    per_depth_generated = []
    for _i in range(depth):
        gen = [
            dm
            for k, dm in sorted(crawldb.items())
            if dm.status != STATUS_DB_SUCCESS
            and dm.execute_count <= config.max_execute_count
        ]
        if config.topn > 0:
            gen = gen[: config.topn]
        if not gen:
            break
        per_depth_generated.append({dm.key for dm in gen})
        fetch_rows, link_rows = [], []
        for dm in gen:
            nxt = CrawlDatums()
            try:
                row = store.get(dm.url)
                if row is None:
                    raise RuntimeError("no route")
                dm.code = row["code"]
                if row["location"] is not None:
                    dm.location = row["location"]
                if row["code"] not in SUCCESS_CODES:
                    raise RuntimeError("bad code")
                page = Page(dm, row["content_type"], row["html"])
                dispatcher.dispatch(page, nxt)
                if next_filter is not None:
                    nxt2 = CrawlDatums()
                    for nd in nxt:
                        r = next_filter(nd, dm)
                        if r is not None:
                            nxt2.add(r)
                    nxt = nxt2
                dm.status = STATUS_DB_SUCCESS
            except Exception:
                dm.status = STATUS_DB_FAILED
            dm.execute_count += 1
            fetch_rows.append(dm)
            if dm.status == STATUS_DB_SUCCESS and len(nxt):
                link_rows.extend(nxt)
        # merge: fetch overwrites, link insert-if-absent (tie: min url/meta)
        for dm in fetch_rows:
            crawldb[dm.key] = dm
        link_sorted = sorted(
            link_rows, key=lambda x: (x.key, x.url, str(sorted(x.meta_map.items())))
        )
        for dm in link_sorted:
            crawldb.setdefault(dm.key, dm)
    return crawldb, per_depth_generated


@pytest.fixture(scope="module")
def pages():
    return synth_pages_table(SPEC)


def _final_state(res):
    df = res.crawldb.to_pandas().set_index("key").sort_index()
    return df


def test_bfs_matches_sequential_model(ray_session, pages, tmp_path):
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=8)
    seeds = SPEC.seeds()
    expected_db, expected_gen = sequential_crawl(pages, seeds, [REGEX], 10, cfg)

    c = BreadthCrawler(
        str(tmp_path / "crawl"), True, pages, config=cfg, deterministic_time=True
    )
    c.add_seed(seeds)
    c.add_regex(REGEX)
    res = c.start(10)

    # per-depth generated key sets (canonical order)
    for i, m in enumerate(res.depths):
        fdir = os.path.join(str(tmp_path / "crawl"), f"depth={m.depth}", "fetch")
        if m.generated == 0:
            continue
        got = set(pq.read_table(fdir, columns=["key"])["key"].to_pylist())
        assert got == expected_gen[i], f"depth {i}"
    assert len(res.depths) - 1 == len(expected_gen)  # +1 empty final round

    df = _final_state(res)
    assert set(df.index) == set(expected_db.keys())
    for k, dm in expected_db.items():
        row = df.loc[k]
        assert int(row["status"]) == dm.status, k
        assert int(row["execute_count"]) == dm.execute_count, k
        assert int(row["code"]) == dm.code, k


def test_failed_pages_retry_until_max(ray_session, pages):
    bad = f"http://site0.test/bad-0.html"
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4, max_execute_count=2)
    c = RamCrawler(pages, config=cfg, deterministic_time=True)
    c.add_seed(bad)
    c.add_regex(REGEX)
    res = c.start(10)
    df = _final_state(res)
    row = df.loc[bad]
    assert int(row["status"]) == STATUS_DB_FAILED
    # generated while execute_count <= 2, i.e. attempts at counts 0,1,2
    assert int(row["execute_count"]) == 3
    assert int(row["code"]) == 500
    assert [m.generated for m in res.depths] == [1, 1, 1, 0]


def test_redirect_row_is_success_with_location(ray_session, pages):
    old = "http://site0.test/old-0.html"
    c = RamCrawler(pages, config=CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4), deterministic_time=True)
    c.add_seed(old)
    c.add_regex(REGEX)
    res = c.start(3)
    df = _final_state(res)
    row = df.loc[old]
    assert int(row["status"]) == STATUS_DB_SUCCESS  # 301 is a success code
    assert int(row["code"]) == 301
    assert row["location"] == "/list-0.html"


def test_topn_limits_per_depth_in_key_order(ray_session, pages):
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4, topn=3)
    seeds = SPEC.seeds()
    expected_db, expected_gen = sequential_crawl(pages, seeds, [REGEX], 4, cfg)
    c = RamCrawler(pages, config=cfg, deterministic_time=True)
    c.add_seed(seeds)
    c.add_regex(REGEX)
    res = c.start(4)
    assert [m.generated for m in res.depths] == [len(s) for s in expected_gen]
    assert all(m.generated <= 3 for m in res.depths)
    df = _final_state(res)
    assert set(df.index) == set(expected_db.keys())


def test_next_filter_blocklist(ray_session, pages):
    # HashSetNextFilter (plugin/nextfilter/HashSetNextFilter.java:28-40)
    blocked = {f"http://site0.test/show-{j}.html" for j in range(0, 12, 2)}

    def nf(datum, referer):
        return None if datum.key in blocked else datum

    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4)
    expected_db, _ = sequential_crawl(
        pages, SPEC.seeds(), [REGEX], 10, cfg, next_filter=nf
    )
    c = RamCrawler(pages, config=cfg, next_filter=nf, deterministic_time=True)
    c.add_seed(SPEC.seeds())
    c.add_regex(REGEX)
    res = c.start(10)
    df = _final_state(res)
    assert set(df.index) == set(expected_db.keys())
    assert not (blocked & set(df.index))


def test_generator_filter(ray_session, pages):
    # G4: user hook drops site1 urls at generate time
    def gf(datum):
        return None if "site1" in datum.url else datum

    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4)
    c = RamCrawler(pages, config=cfg, generator_filter=gf, deterministic_time=True)
    c.add_seed(SPEC.seeds())
    c.add_regex(REGEX)
    res = c.start(10)
    df = _final_state(res)
    fetched = df[df["status"] == STATUS_DB_SUCCESS]
    assert all("site1" not in u for u in fetched.index)


def test_resume_equivalence(ray_session, pages, tmp_path):
    """Run 2 depths, then resume for 8 more == straight run of 10
    (resumable semantics crawler/Crawler.java:101-110)."""
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=8)
    seeds = SPEC.seeds()

    straight = BreadthCrawler(
        str(tmp_path / "a"), True, pages, config=cfg, deterministic_time=True
    )
    straight.add_seed(seeds)
    straight.add_regex(REGEX)
    df_a = _final_state(straight.start(10))

    part1 = BreadthCrawler(
        str(tmp_path / "b"), True, pages, config=cfg, deterministic_time=True
    )
    part1.add_seed(seeds)
    part1.add_regex(REGEX)
    part1.start(2)

    part2 = BreadthCrawler(
        str(tmp_path / "b"), True, pages,
        config=cfg.replace(resumable=True), deterministic_time=True,
    )
    part2.add_seed(seeds)
    part2.add_regex(REGEX)
    df_b = _final_state(part2.start(8))

    cols = ["url", "status", "execute_count", "code"]
    assert df_a[cols].equals(df_b[cols])


def test_forced_seed_overwrites(ray_session, pages, tmp_path):
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4)
    url = "http://site0.test/list-0.html"
    # first run: crawl completes, status=5
    c1 = BreadthCrawler(str(tmp_path / "c"), True, pages, config=cfg, deterministic_time=True)
    c1.add_seed(url)
    c1.add_regex(REGEX)
    c1.start(1)
    # resume with a forced seed: overwrites back to unexecuted
    c2 = BreadthCrawler(
        str(tmp_path / "c"), True, pages,
        config=cfg.replace(resumable=True), deterministic_time=True,
    )
    c2.add_seed(url, force=True)
    c2.add_regex(REGEX)
    res = c2.start(1)
    assert res.depths[0].generated >= 1  # the forced seed was re-fetched


def test_extracted_text_through_crawl(ray_session, pages):
    """Crawl then extract: per-url text byte-identical to golden column."""
    from webcollector_ray.stages.extract import extract_news_batch

    out = extract_news_batch(pages)
    got = dict(zip(out["url"].to_pylist(), out["content"].to_pylist()))
    pd_pages = pages.to_pydict()
    for url, text in zip(pd_pages["url"], pd_pages["text"]):
        if text is not None:
            assert got[url] == text, url


def test_fast_path_matches_dispatch_path(ray_session):
    """The pure-autoParse fast kernel must emit byte-identical output to
    the per-record visitor dispatch path (forced by passing an explicit
    bare Visitor) — success pages, missing pages, and non-success codes
    alike."""
    from webcollector_ray.config import CrawlerConfig
    from webcollector_ray.dispatch import Visitor
    from webcollector_ray.model import CrawlDatum, datums_to_table
    from webcollector_ray.regex_rule import RegexRule
    from webcollector_ray.sources.pagestore import SynthPageStore
    from webcollector_ray.stages.execute import ExecuteStage
    from webcollector_ray.synth import SynthSpec

    spec = SynthSpec(num_sites=4)
    store = SynthPageStore(spec)
    rule = RegexRule([r"http://site[0-9]+\.test/(list|show)-[0-9]+\.html"])
    datums = [
        CrawlDatum(f"http://site{s}.test/list-{j}.html", execute_time=0)
        for s in range(4) for j in range(2)
    ] + [
        CrawlDatum("http://nowhere.test/missing.html", execute_time=0),
        CrawlDatum("http://site0.test/show-0.html", execute_time=0,
                   meta={"depth": "2", "k": "v"}),
    ]
    batch = datums_to_table(datums)
    kw = dict(
        store_handle=store.handle(), regex_rule=rule,
        config=CrawlerConfig(), execute_time_ms=777,
    )
    fast = ExecuteStage(**kw)
    slow = ExecuteStage(visitor=Visitor(), **kw)
    assert fast._fast and not slow._fast
    out_f = fast(batch)
    out_s = slow(batch)
    assert out_f.equals(out_s), (
        out_f.to_pandas().compare(out_s.to_pandas())
        if len(out_f) == len(out_s) else (len(out_f), len(out_s))
    )
    assert len(out_f) > len(batch)  # links actually extracted


def test_resume_completed_crawl_terminates_fast(ray_session, pages, tmp_path):
    """Resuming a crawl that already reached its fixed point must break
    on the first depth via the generate-eligible short-circuit (no
    execute pipeline spins) and leave the crawldb unchanged."""
    cfg = CrawlerConfig(fetch_concurrency=2, merge_num_buckets=4)
    c1 = BreadthCrawler(
        str(tmp_path / "z"), True, pages, config=cfg, deterministic_time=True
    )
    c1.add_seed(SPEC.seeds())
    c1.add_regex(REGEX)
    df_a = _final_state(c1.start(10))

    c2 = BreadthCrawler(
        str(tmp_path / "z"), True, pages,
        config=cfg.replace(resumable=True), deterministic_time=True,
    )
    c2.add_seed(SPEC.seeds())
    c2.add_regex(REGEX)
    res = c2.start(5)
    assert len(res.depths) == 1
    assert res.depths[0].generated == 0
    df_b = _final_state(res)
    cols = ["url", "status", "execute_count", "code"]
    assert df_a[cols].equals(df_b[cols])
