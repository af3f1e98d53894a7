"""CEPF news-content extraction (tag-path feature fusion).

Algorithm reproduced from the reference
contentextractor/ContentExtractor.java (526 LoC):

- clean(): drop script,noscript,style,iframe,br (:69-71)
- computeInfo(): bottom-up per element textCount / linkTextCount /
  tagCount / linkTagCount / leafList / density / densitySum / pCount
  (:73-120); density = (textCount-linkTextCount)/(tagCount-linkTagCount)
  with zero guards
- computeScore(tag) = log(sqrt(var(leafList)+1)) * densitySum
  * log(textCount-linkTextCount+1) * log10(pCount+2) (:122-127);
  var() of a single leaf is data[0] **integer-divided** by 2 (:133-135)
- content element = argmax score over elements except <a> and <body>
  (:149-169). The reference iterates a java.util.HashMap so its
  tie-break is nondeterministic; this port makes it deterministic:
  document order, first strict maximum wins.
- getTime/getDate: regex scan of outer HTML walking up 2 parents then
  6 ancestors (:200-260)
- getTitle: h1-h6 before the content element scored by
  position-weighted LCS similarity to doc.title() (:280-339), fallback
  *[id^=title]... selector with 5<len<40 guard, then best TextNode by
  similarity (:341-374)

Pure per-row function; the Ray stage wrapping it lives in
stages/extract.py.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, List, Optional

from . import dom
from .dom import Document, Element, Node, TextNode


@dataclass
class News:
    """contentextractor/News.java equivalent."""

    url: Optional[str] = None
    title: Optional[str] = None
    content: Optional[str] = None
    time: Optional[str] = None
    content_element: Optional[Element] = None


class _CountInfo:
    __slots__ = (
        "text_count",
        "link_text_count",
        "tag_count",
        "link_tag_count",
        "density",
        "density_sum",
        "score",
        "p_count",
        "leaf_list",
    )

    def __init__(self):
        self.text_count = 0
        self.link_text_count = 0
        self.tag_count = 0
        self.link_tag_count = 0
        self.density = 0.0
        self.density_sum = 0.0
        self.score = 0.0
        self.p_count = 0
        self.leaf_list: List[int] = []


_TIME_RE = re.compile(
    r"([1-2][0-9]{3})[^0-9]{1,5}?([0-1]?[0-9])[^0-9]{1,5}?([0-9]{1,2})"
    r"[^0-9]{1,5}?([0-2]?[1-9])[^0-9]{1,5}?([0-9]{1,2})[^0-9]{1,5}?([0-9]{1,2})"
)
_DATE_RE = re.compile(
    r"([1-2][0-9]{3})[^0-9]{1,5}?([0-1]?[0-9])[^0-9]{1,5}?([0-9]{1,2})"
)
_H_RE = re.compile(r"h[1-6]")


class ContentExtractor:
    def __init__(self, doc: Document):
        self.doc = doc
        self.info_map: Dict[int, _CountInfo] = {}
        self._elems: List[Element] = []  # document order of scored elements

    def _clean(self) -> None:
        self.doc.select("script,noscript,style,iframe,br").remove()

    def _compute_info(self, node: Node) -> _CountInfo:
        if isinstance(node, Element):
            info = _CountInfo()
            for child in node.children:
                ci = self._compute_info(child)
                info.text_count += ci.text_count
                info.link_text_count += ci.link_text_count
                info.tag_count += ci.tag_count
                info.link_tag_count += ci.link_tag_count
                info.leaf_list.extend(ci.leaf_list)
                info.density_sum += ci.density
                info.p_count += ci.p_count
            info.tag_count += 1
            if node.tag == "a":
                info.link_text_count = info.text_count
                info.link_tag_count += 1
            elif node.tag == "p":
                info.p_count += 1
            pure_len = info.text_count - info.link_text_count
            n_tags = info.tag_count - info.link_tag_count
            info.density = 0.0 if (pure_len == 0 or n_tags == 0) else pure_len / n_tags
            self.info_map[id(node)] = info
            self._elems.append(node)
            return info
        if isinstance(node, TextNode):
            info = _CountInfo()
            length = len(node.text())
            info.text_count = length
            info.leaf_list.append(length)
            return info
        return _CountInfo()

    @staticmethod
    def _var(data: List[int]) -> float:
        if len(data) == 0:
            return 0.0
        if len(data) == 1:
            return float(data[0] // 2)  # Java int division (:133-135)
        ave = sum(data) / len(data)
        return sum((x - ave) ** 2 for x in data) / len(data)

    def _score(self, el: Element) -> float:
        info = self.info_map[id(el)]
        var = math.sqrt(self._var(info.leaf_list) + 1)
        return (
            math.log(var)
            * info.density_sum
            * math.log(info.text_count - info.link_text_count + 1)
            * math.log10(info.p_count + 2)
        )

    def get_content_element(self) -> Element:
        self._clean()
        body = self.doc.body()
        self._compute_info(body)
        max_score = 0.0
        content: Optional[Element] = None
        for el in self._elems:  # deterministic: document (post-order) walk
            if el.tag == "a" or el is body:
                continue
            score = self._score(el)
            if score > max_score:
                max_score = score
                content = el
        if content is None:
            raise ValueError("extraction failed")
        return content

    def get_news(self) -> News:
        news = News()
        content_element = self.get_content_element()
        news.content_element = content_element
        news.content = content_element.text()
        if self.doc.base_uri:
            news.url = self.doc.base_uri
        try:
            news.time = self._get_time(content_element)
        except ValueError:
            pass
        try:
            news.title = self._get_title(content_element)
        except ValueError:
            pass
        return news

    # ---- time/date (:200-260): climb 2 parents, then scan 6 ancestors ----
    def _walk_scan(self, content_element: Element, pattern: re.Pattern, fmt) -> str:
        body = self.doc.body()
        current: Optional[Element] = content_element
        for _ in range(2):
            if current is not None and current is not body:
                parent = current.parent
                if parent is not None:
                    current = parent
        for _ in range(6):
            if current is None:
                break
            m = pattern.search(current.outer_html())
            if m:
                return fmt(m)
            if current is not body:
                current = current.parent
        raise ValueError("not found")

    def _get_time(self, content_element: Element) -> str:
        try:
            return self._walk_scan(
                content_element,
                _TIME_RE,
                lambda m: f"{m.group(1)}-{m.group(2)}-{m.group(3)} "
                f"{m.group(4)}:{m.group(5)}:{m.group(6)}",
            )
        except ValueError:
            return self._walk_scan(
                content_element,
                _DATE_RE,
                lambda m: f"{m.group(1)}-{m.group(2)}-{m.group(3)}",
            )

    # ---- title (:262-374) ----
    @staticmethod
    def _lcs(x: str, y: str) -> int:
        # LCS length (ContentExtractor.java:376-397 semantics).
        # Vectorized row DP: cur[j+1] = max(prev[j+1], prev[j]+eq[j],
        # cur[j]) — the cur[j] carry is a running max, so each row is
        # one np.maximum + one np.maximum.accumulate.
        m, n = len(x), len(y)
        if m == 0 or n == 0:
            return 0
        if m * n <= 4096:
            # small-grid fast path: numpy per-row overhead exceeds the
            # vectorization gain below ~64x64 (typical title lengths)
            prev = [0] * (n + 1)
            for i in range(m - 1, -1, -1):
                cur = [0] * (n + 1)
                xi = x[i]
                for j in range(n - 1, -1, -1):
                    if xi == y[j]:
                        cur[j] = prev[j + 1] + 1
                    else:
                        pj, cj = prev[j], cur[j + 1]
                        cur[j] = pj if pj >= cj else cj
                prev = cur
            return prev[0]
        import numpy as _np

        ya = _np.frombuffer(y.encode("utf-32-le"), dtype=_np.uint32)
        prev = _np.zeros(n + 1, dtype=_np.int32)
        for ch in x:
            eq = ya == ord(ch)
            cand = _np.maximum(prev[1:], prev[:-1] + eq)
            prev = _np.concatenate(
                ([0], _np.maximum.accumulate(cand))
            ).astype(_np.int32, copy=False)
        return int(prev[-1])

    @classmethod
    def _str_sim(cls, a: str, b: str) -> float:
        len1, len2 = len(a), len(b)
        if len1 == 0 or len2 == 0:
            return 0.0
        ratio = len1 / len2 if len1 > len2 else len2 / len1
        if ratio >= 3:
            return 0.0
        return cls._lcs(a, b) / max(len1, len2)

    def _get_title(self, content_element: Element) -> str:
        meta_title = self.doc.title().strip()
        if meta_title:
            title_list: List[Element] = []
            title_sim: List[float] = []
            content_index = [0]
            done = [False]

            def head(node: Node, _depth: int) -> None:
                if done[0] or not isinstance(node, Element):
                    return
                if node is content_element:
                    content_index[0] = len(title_list)
                    done[0] = True  # reference keeps traversing but only
                    return          # titles before the content el matter
                if _H_RE.fullmatch(node.tag):
                    title_sim.append(self._str_sim(node.text().strip(), meta_title))
                    title_list.append(node)

            self.doc.body().traverse(head)
            index = content_index[0]
            if index > 0:
                max_score = 0.0
                max_index = -1
                for i in range(index):
                    score = (i + 1) * title_sim[i]
                    if score > max_score:
                        max_score = score
                        max_index = i
                if max_index != -1:
                    return title_list[max_index].text()

        titles = self.doc.body().select(
            "*[id^=title],*[id$=title],*[class^=title],*[class$=title]"
        )
        if titles:
            title = titles.first().text()
            if 5 < len(title) < 40:
                return titles.first().text()
        return self._get_title_by_text_sim(content_element)

    def _get_title_by_text_sim(self, _content_element: Element) -> str:
        meta_title = self.doc.title()
        best = [0.0]
        sb: List[str] = []

        def head(node: Node, _depth: int) -> None:
            if isinstance(node, TextNode):
                text = node.text().strip()
                sim = self._str_sim(text, meta_title)
                if sim > 0 and sim > best[0]:
                    best[0] = sim
                    sb.clear()
                    sb.append(text)

        self.doc.body().traverse(head)
        if sb:
            return sb[0]
        raise ValueError("title not found")


# ---- static API (ContentExtractor.java:436-512) ----

def get_content_element_by_html(html: str, url: str = "") -> Element:
    return ContentExtractor(dom.parse(html, url)).get_content_element()


def get_content_by_html(html: str, url: str = "") -> str:
    return get_content_element_by_html(html, url).text()


def get_news_by_html(html: str, url: str = "") -> News:
    return ContentExtractor(dom.parse(html, url)).get_news()
