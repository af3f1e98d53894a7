"""AutoNewsCrawler demo — reference example/DemoAutoNewsCrawler.java:96-145.

Seeds + `add_regex` auto-parse rules + topN + CEPF news extraction in
the visitor, over the deterministic synthetic web (no network in this
sandbox; swap SynthPageStore for a parquet pages table or
BucketedPageStore dir in production).

Run: python examples/demo_auto_news.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from webcollector_ray.config import CrawlerConfig
from webcollector_ray.pipelines.autonews import NewsVisitor
from webcollector_ray.pipelines.crawler import BreadthCrawler
from webcollector_ray.sources.pagestore import SynthPageStore
from webcollector_ray.synth import SynthSpec


def main() -> None:
    spec = SynthSpec(num_sites=3)
    crawler = BreadthCrawler(
        "/tmp/crawl_auto_news",            # crawldb checkpoint dir
        True,                              # autoParse
        SynthPageStore(spec),
        visitor=NewsVisitor(store_content=True),
        config=CrawlerConfig(topn=100, fetch_concurrency=4),
    )
    crawler.add_seed(spec.seeds())
    crawler.add_regex(r"http://site[0-9]+\.test/(list|show)-[0-9]+\.html")
    result = crawler.start(4)
    for m in result.depths:
        print(f"depth {m.depth}: generated={m.generated} links={m.links} "
              f"ok={m.fetch_success} fail={m.fetch_failed}")
    df = result.crawldb.to_pandas()
    articles = df[df["meta"].str.contains("title", na=False)]
    print(f"{len(articles)} articles extracted; sample meta:")
    print(articles["meta"].iloc[0][:200])


if __name__ == "__main__":
    main()
    ray.shutdown()
