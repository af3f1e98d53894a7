"""Page — transient per-row fetch result with lazy parsed views.

Reference: model/Page.java. A Page wraps (crawl_datum, content_type,
content bytes) with lazy cached `html()` (charset-detected decode,
:363-381) and `doc()` (base-URL-aware DOM parse, :403-416), plus the
scalar extraction helper library (:98-321) used inside visit() bodies.

In the Ray engine a Page never persists: it exists only inside the
parse `map_batches` UDF, built from the fetch stage's output columns
(url, code, location, content_type, content).
"""

from __future__ import annotations

import json
import re
from typing import Any, List, Optional

from . import dom
from .charset import decode_html, guess_encoding
from .links import Links
from .model import CrawlDatum
from .regex_rule import RegexRule


class Page:
    def __init__(
        self,
        datum: CrawlDatum,
        content_type: Optional[str] = None,
        content: Optional[bytes] = None,
    ):
        self.crawl_datum = datum
        self.content_type = content_type
        self.content = content
        self._html: Optional[str] = None
        self._doc: Optional[dom.Document] = None
        self._charset: Optional[str] = None
        self.obj: Any = None  # generic attachment (Page.java:520-526)

    # --- datum delegation (Page.java:69-90, 448-480) ---
    def url(self) -> Optional[str]:
        return self.crawl_datum.url

    def key(self) -> Optional[str]:
        return self.crawl_datum.key

    def code(self) -> int:
        return self.crawl_datum.code

    def location(self) -> Optional[str]:
        return self.crawl_datum.location

    def match_url(self, regex: str) -> bool:
        return self.crawl_datum.match_url(regex)

    def match_type(self, t: Optional[str]) -> bool:
        return self.crawl_datum.match_type(t)

    def match_url_regex_rule(self, rule: RegexRule) -> bool:
        return self.crawl_datum.match_url_regex_rule(rule)

    def match_content_type(self, regex: Optional[str]) -> bool:
        # Page.java:98-103: null-safe full match on contentType
        ct = self.content_type
        if regex is None:
            return ct is None
        return ct is not None and re.fullmatch(regex, ct) is not None

    def meta(self, key: Optional[str] = None):
        return self.crawl_datum.meta(key)

    def meta_as_int(self, key: str) -> int:
        return self.crawl_datum.meta_as_int(key)

    def meta_as_double(self, key: str) -> float:
        return self.crawl_datum.meta_as_double(key)

    def meta_as_boolean(self, key: str) -> bool:
        return self.crawl_datum.meta_as_boolean(key)

    # --- lazy views (Page.java:363-416, 493-498) ---
    def charset(self) -> str:
        if self._charset is None:
            self._charset = guess_encoding(self.content or b"")
        return self._charset

    def html(self) -> str:
        if self._html is None:
            self._html = decode_html(self.content or b"", self.charset())
        return self._html

    def set_html(self, html: str) -> None:
        self._html = html
        self._doc = None

    def doc(self) -> dom.Document:
        if self._doc is None:
            self._doc = dom.parse(self.html(), self.url() or "")
        return self._doc

    # --- CSS select + typed extraction (Page.java:206-285) ---
    def select(self, css: str, index: Optional[int] = None):
        eles = self.doc().select(css)
        if index is None:
            return eles
        # negative indexing from the end (Page.java:274-285)
        return eles[index] if -len(eles) <= index < len(eles) else None

    def select_text(self, css: str, index: Optional[int] = None) -> Optional[str]:
        if index is None:
            first = self.select(css).first()
            return first.text() if first is not None else None
        ele = self.select(css, index)
        return ele.text() if ele is not None else None

    def select_text_list(self, css: str) -> List[str]:
        return [e.text() for e in self.select(css)]

    def select_int(self, css: str, index: int = 0) -> Optional[int]:
        t = self.select_text(css, index)
        return None if t is None else int(t.strip())

    def select_double(self, css: str, index: int = 0) -> Optional[float]:
        t = self.select_text(css, index)
        return None if t is None else float(t.strip())

    def select_long(self, css: str, index: int = 0) -> Optional[int]:
        return self.select_int(css, index)

    def attr(self, css: str, attr_name: str) -> str:
        return self.select(css).attr(attr_name)

    def attrs(self, css: str, attr_name: str) -> List[str]:
        return self.select(css).each_attr(attr_name)

    # --- regex extraction (Page.java:287-321) ---
    def regex(
        self,
        regex: str,
        group: int = 0,
        default_result: Optional[str] = None,
    ) -> Optional[str]:
        m = re.search(regex, self.html())
        return m.group(group) if m else default_result

    def regex_and_format(
        self, regex: str, fmt: str, default_result: Optional[str] = None
    ) -> Optional[str]:
        m = re.search(regex, self.html())
        if not m:
            return default_result
        out = fmt
        for gi in range(m.lastindex or 0, 0, -1):
            out = out.replace(f"${gi}", m.group(gi) or "")
        return out

    # --- JSON views (Page.java:105-127) ---
    def json_object(self) -> dict:
        return json.loads(self.html())

    def json_array(self) -> list:
        return json.loads(self.html())

    def regex_json_object(self, regex: str) -> dict:
        return json.loads(self.regex(regex) or "null")

    def regex_json_array(self, regex: str) -> list:
        return json.loads(self.regex(regex) or "null")

    # --- link extraction (Page.java:162-203) ---
    def links(self, css_or_none: Optional[str] = None, parse_src: bool = False) -> Links:
        if css_or_none is None:
            return Links().add_from_element(self.doc(), parse_src)
        return Links().add_by_selector(self.doc(), css_or_none, parse_src)

    def regex_links(self, rule, parse_src: bool = False) -> Links:
        return Links().add_by_regex(self.doc(), rule, parse_src)
