"""AutoNewsCrawler — the reference's flagship demo as a pipeline.

Reference: example/DemoAutoNewsCrawler.java:96-145 — BreadthCrawler
with autoParse link rules over list pages and CEPF ContentExtractor
news extraction inside visit() for article (show) pages. Here the
visitor runs inside the fused fetch+parse stage; extracted fields ride
back on the frontier row's meta JSON (the engine's dynamic-column
channel, SURVEY.md §1.1) so page bodies never leave the stage.
"""

from __future__ import annotations

from typing import Optional

from ..dispatch import Visitor, match_url
from ..extractor import ContentExtractor
from ..model import CrawlDatums
from ..page import Page


class NewsVisitor(Visitor):
    """CEPF-extract every article page; list pages only feed links."""

    def __init__(self, show_url_regex: str = r".*/show-[0-9]+\.html",
                 store_content: bool = False):
        self._show_regex = show_url_regex
        self._store_content = store_content

    def visit(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        if page.match_url(self._show_regex):
            self.visit_show(page, next)

    def visit_show(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        news = ContentExtractor(page.doc()).get_news()
        d = page.crawl_datum
        d.set_meta("title", news.title or "")
        d.set_meta("time", news.time or "")
        if self._store_content:
            d.set_meta("content", news.content or "")
        else:
            import hashlib

            d.set_meta(
                "content_md5",
                hashlib.md5((news.content or "").encode()).hexdigest(),
            )
