"""Extract — CEPF news extraction as a vectorized-per-batch transform.

Maps the pages table (url, html, ...) to (url, title, content, time):
the standalone ContentExtractor entry point of the reference
(contentextractor/ContentExtractor.java:436-512, auxiliary entry in
SURVEY.md §3.3). CPU-bound pure function -> stateless map_batches
tasks, num_cpus=1, modest batch_size because html rows are wide.

Per-row failures (extraction failed, empty html) yield null columns
instead of dropping the row, so output row count == input row count.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..charset import decode_html
from ..extractor import ContentExtractor
from .. import dom

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("content", pa.string()),
        ("time", pa.string()),
    ]
)


def extract_news_row(html_bytes: Optional[bytes], url: str):
    if not html_bytes:
        return None, None, None
    try:
        html = decode_html(html_bytes)
        news = ContentExtractor(dom.parse(html, url)).get_news()
        return news.title, news.content, news.time
    except Exception:
        return None, None, None


def extract_news_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    titles, contents, times = [], [], []
    for url, hb in zip(urls, htmls):
        t, c, tm = extract_news_row(hb, url)
        titles.append(t)
        contents.append(c)
        times.append(tm)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "content": pa.array(contents, pa.string()),
            "time": pa.array(times, pa.string()),
        },
        schema=EXTRACT_SCHEMA,
    )


def extract_news(pages, batch_size: int = 64):
    """pages: Dataset with (url, html) -> Dataset(url, title, content, time)."""
    return pages.map_batches(
        extract_news_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
