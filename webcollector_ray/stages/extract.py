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


# ------------------------------------------------------------ anchor text


def anchor_rows_batch(batch: pa.Table, url_regex: Optional[str] = None) -> pa.Table:
    """(target_url, anchor_text) rows for every <a href> on every page
    in the batch, hrefs absolutized against the page URL (X5 semantics)
    and optionally full-match filtered. The raw material of an
    anchor-text corpus — the query-document training pairs used by
    retrieval / ranking models."""
    import re as _re

    pat = _re.compile(url_regex) if url_regex else None
    srcs, targets, texts = [], [], []
    for url, hb in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        if not hb:
            continue
        try:
            doc = dom.parse(decode_html(hb), url)
        except Exception:
            continue
        for a in doc.select("a"):
            href = a.attr("abs:href")
            if not href:
                continue
            if pat and not pat.fullmatch(href):
                continue
            srcs.append(url)
            targets.append(href)
            texts.append(a.text())
    return pa.table(
        {
            "src_url": pa.array(srcs, pa.string()),
            "target_url": pa.array(targets, pa.string()),
            "anchor_text": pa.array(texts, pa.string()),
        }
    )


def anchor_text_counts(pages_ds, *, url_regex: Optional[str] = None,
                       num_buckets: int = 32):
    """Aggregated anchor-text corpus: (target_url, anchor_text, n).
    Extraction is map-only; the count is ONE target-hash bucket
    exchange with a vectorized per-bucket groupby — all anchors of a
    target land in the same bucket, so per-target rollups downstream
    need no further shuffle."""
    import numpy as np
    import pandas as pd

    from ..functions.joins import exchange_reduce

    def tag(batch: pa.Table) -> pa.Table:
        out = anchor_rows_batch(batch, url_regex)
        t = np.asarray(out["target_url"].to_pylist(), dtype=object)
        b = (
            pd.util.hash_array(t, categorize=False) % np.uint64(num_buckets)
        ).astype(np.int32) if len(t) else np.zeros(0, dtype=np.int32)
        return out.append_column("__bucket", pa.array(b))

    empty = pa.table(
        {
            "target_url": pa.array([], pa.string()),
            "anchor_text": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_count(t: pa.Table) -> pa.Table:
        df = t.select(["target_url", "anchor_text"]).to_pandas()
        g = df.groupby(["target_url", "anchor_text"], sort=False).size()
        g = g.rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return exchange_reduce(
        pages_ds.map_batches(tag, batch_format="pyarrow"),
        bucket_count, empty, num_buckets,
    )
