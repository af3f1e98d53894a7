"""Typed-page dispatch demo — reference
example/DemoAnnotatedMatchTypeCrawler.java:62-97: links are submitted
with a `type` riding in meta ("s_t"), and visit methods route on
@MatchType instead of URL regexes. List pages type their outgoing show
links as "content"; content pages extract title/time via CSS selects.

Run: python examples/demo_match_type.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from webcollector_ray.config import CrawlerConfig
from webcollector_ray.dispatch import Visitor, match_type
from webcollector_ray.model import CrawlDatums
from webcollector_ray.page import Page
from webcollector_ray.pipelines.crawler import RamCrawler
from webcollector_ray.sources.pagestore import SynthPageStore
from webcollector_ray.synth import SynthSpec


class TypedVisitor(Visitor):
    @match_type("list")
    def visit_list(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        # show links become typed "content" datums; next list page stays "list"
        next.add_and_return(page.links("ul.items a")).set_type("content")
        next.add_and_return(page.links("div.pager a")).set_type("list")

    @match_type("content")
    def visit_content(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        title = page.select_text("h1")
        time = page.select_text("span.pubtime")
        page.crawl_datum.set_meta("title", title or "")
        page.crawl_datum.set_meta("time", time or "")


def main() -> None:
    spec = SynthSpec(num_sites=2)
    c = RamCrawler(
        SynthPageStore(spec),
        visitor=TypedVisitor(),
        auto_parse=False,  # typed dispatch replaces regex autoParse
        config=CrawlerConfig(fetch_concurrency=4),
    )
    for seed in spec.seeds():
        c.add_seed(seed, type="list")
    res = c.start(8)
    df = res.crawldb.to_pandas()
    content = df[df["meta"].str.contains('"title"', na=False)]
    print(f"fetched={res.total_fetched}, content pages with titles={len(content)}")
    print(content[["key", "meta"]].head(3).to_string())


if __name__ == "__main__":
    main()
    ray.shutdown()
