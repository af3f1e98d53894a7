from .crawler import Crawler, BreadthCrawler, RamCrawler, CrawlResult  # noqa: F401
