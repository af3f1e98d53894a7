"""Bare-executor crawler demo — reference example/DemoSeleniumCrawler.java:45-68
(`new Crawler(dbManager, executor)`: a user Executor replaces the whole
requester/visitor/autoParse layer; here it inspects raw page bytes
itself and emits next URLs by hand).

Run: python examples/demo_custom_executor.py
"""

import re

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from webcollector_ray.config import CrawlerConfig
from webcollector_ray.model import CrawlDatums
from webcollector_ray.page import Page
from webcollector_ray.pipelines.crawler import Crawler
from webcollector_ray.sources.pagestore import SynthPageStore
from webcollector_ray.synth import SynthSpec

LINK_RE = re.compile(r'href="(show-\d+\.html)"')


def my_executor(page: Page, next: CrawlDatums) -> None:  # noqa: A002
    """Executor contract (fetcher/Executor.java:26-28): raise ==
    record FAILED; append to `next` to schedule follow-ups."""
    html = page.html() or ""
    for rel in LINK_RE.findall(html)[:3]:
        next.add(f"http://site0.test/{rel}")


def main() -> None:
    spec = SynthSpec(num_sites=1)
    c = Crawler(
        SynthPageStore(spec),
        executor=my_executor,
        auto_parse=False,
        config=CrawlerConfig(fetch_concurrency=2),
    )
    c.add_seed("http://site0.test/list-0.html")
    res = c.start(3)
    print(res.crawldb.to_pandas()[["key", "status", "code"]].to_string())


if __name__ == "__main__":
    main()
    ray.shutdown()
