"""Annotated visitor + redirect-following demo — reference
example/DemoAnnotatedRedirectCrawler.java:47-58 and
DemoAnnotatedDepthCrawler.java:58-70 idioms:

- @MatchCode(301,302) -> re-add the resolved Location with copied meta
- @AfterParse -> depth/referer propagation onto detected links
- default visit() handles 200 pages

Run: python examples/demo_annotated_redirect.py
"""

from urllib.parse import urljoin

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from webcollector_ray.config import CrawlerConfig
from webcollector_ray.dispatch import Visitor, after_parse, match_code
from webcollector_ray.model import CrawlDatum, CrawlDatums
from webcollector_ray.page import Page
from webcollector_ray.pipelines.crawler import RamCrawler
from webcollector_ray.sources.pagestore import SynthPageStore
from webcollector_ray.synth import SynthSpec


class RedirectVisitor(Visitor):
    @match_code(301, 302)
    def visit_redirect(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        target = urljoin(page.url(), page.location() or "")
        d = CrawlDatum(target)
        for k, v in page.crawl_datum.meta_map.items():
            d.set_meta(k, v)
        next.add(d)

    @after_parse
    def on_after_parse(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        depth = page.meta_as_int("depth") if page.meta("depth") is not None else 0
        next.set_meta("depth", depth + 1)
        next.set_meta("referer", page.url())

    def visit(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        print(f"visit {page.url()} depth={page.meta('depth')}")


def main() -> None:
    spec = SynthSpec(num_sites=2)
    c = RamCrawler(
        SynthPageStore(spec),
        visitor=RedirectVisitor(),
        config=CrawlerConfig(fetch_concurrency=4),
    )
    # seed the redirect page: 301 -> /list-0.html
    c.add_seed(CrawlDatum("http://site0.test/old-0.html").set_meta("depth", 0))
    c.add_regex(r"http://site0\.test/(list|show)-[0-9]+\.html")
    res = c.start(4)
    df = res.crawldb.to_pandas()
    print(df[["key", "status", "code", "location"]].to_string())


if __name__ == "__main__":
    main()
    ray.shutdown()
