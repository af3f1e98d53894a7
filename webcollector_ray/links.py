"""Links — extracted URL collection.

Reference: model/Links.java. Extraction semantics:
- add_from_element: all `a[href]` absolute hrefs, plus `img[src]`
  absolute srcs when parse_img (:93-104);
- add_by_selector: hrefs (and optionally srcs) of elements matching a
  CSS selector (:114-132);
- add_by_regex: `a[href]` absolute hrefs satisfying a RegexRule, and
  when parse_src all `*[src]` absolute srcs too (:134-148) — this is
  the autoParse path (fetcher/VisitorMethodDispatcher.java:240-250);
- filter_by_regex (:76-91).

Kept as a thin list-like; the Ray parse stage consumes the resulting
lists and explodes them into link-segment rows.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterable, Iterator, List, Optional, Union

from .dom import Element
from .regex_rule import RegexRule
from .urls import abs_url, abs_url_fast


class Links:
    def __init__(self, links: Optional[Iterable[str]] = None):
        self._list: List[str] = []
        if links is not None:
            self.add(links)

    def add(self, item: Union[str, Iterable[str]]) -> "Links":
        if isinstance(item, str):
            self._list.append(item)
        else:
            self._list.extend(item)
        return self

    def filter_by_regex(self, rule: Union[RegexRule, str]) -> "Links":
        if isinstance(rule, str):
            rule = RegexRule([rule])
        self._list = [u for u in self._list if rule.satisfy(u)]
        return self

    def add_from_element(self, ele: Element, parse_img: bool = False) -> "Links":
        self.add(ele.select("a[href]").each_attr("abs:href"))
        if parse_img:
            self.add(ele.select("img[src]").each_attr("abs:src"))
        return self

    def add_by_selector(
        self, ele: Element, css_selector: str, parse_src: bool = False
    ) -> "Links":
        for a in ele.select(css_selector):
            if a.has_attr("href"):
                self.add(a.attr("abs:href"))
            if parse_src and a.has_attr("src"):
                self.add(a.attr("abs:src"))
        return self

    def add_by_regex(
        self,
        ele: Element,
        rule: Union[RegexRule, str],
        parse_src: bool = False,
    ) -> "Links":
        if isinstance(rule, str):
            rule = RegexRule([rule])
        for href in ele.select("a[href]").each_attr("abs:href"):
            if rule.satisfy(href):
                self.add(href)
        if parse_src:
            for src in ele.select("*[src]").each_attr("abs:src"):
                if rule.satisfy(src):
                    self.add(src)
        return self

    def __iter__(self) -> Iterator[str]:
        return iter(self._list)

    def __len__(self) -> int:
        return len(self._list)

    def __getitem__(self, i: int) -> str:
        return self._list[i]

    def is_empty(self) -> bool:
        return not self._list

    def __repr__(self) -> str:
        return f"Links({self._list!r})"


def make_abs(doc, url: Optional[str] = None) -> None:
    """Rewrite every href/src attribute in the DOM to its absolute form
    (reference: util/JsoupUtils.java:31-56, X6 in SURVEY.md §2.7)."""
    if url is not None:
        doc.base_uri = url

    def head(node, _depth):
        if isinstance(node, Element):
            if node.has_attr("href"):
                node.attrs["href"] = node.abs_attr("href")
            if node.has_attr("src"):
                node.attrs["src"] = node.abs_attr("src")

    doc.traverse(head)


# ------------------------- vectorized autoParse fast path (no DOM) ---


class _FastLinkScan(HTMLParser):
    """SAX-level collector of a[href] (and *[src]) attribute values —
    the exact event stream dom.parse consumes (same html.parser, same
    convert_charrefs), with dom._TreeBuilder's attribute semantics
    (lowercase names, FIRST duplicate wins, valueless attr -> ''), but
    no tree build. Used by ExecuteStage's pure-autoParse fast path
    (VERDICT r2 §wrong.4/§next.5): add_by_regex over the built DOM and
    this scan see the same tags in the same document order."""

    def __init__(self, parse_src: bool):
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []
        self.srcs: List[str] = []
        self._parse_src = parse_src

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "a":
            seen = False
            for k, v in attrs:
                if k.lower() == "href" and not seen:
                    self.hrefs.append(v if v is not None else "")
                    seen = True
        if self._parse_src and tag != "head":  # head attrs are dropped
            seen = False
            for k, v in attrs:
                if k.lower() == "src" and not seen:
                    self.srcs.append(v if v is not None else "")
                    seen = True

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)


def fast_links_by_regex(
    html: str,
    base_uri: str,
    rule: RegexRule,
    parse_src: bool = False,
) -> List[str]:
    """Equivalent of Links().add_by_regex(dom.parse(html, base), rule,
    parse_src) without building the DOM: all a[href] abs-resolved and
    regex-filtered first, then (when parse_src) all *[src]."""
    scan = _FastLinkScan(parse_src)
    scan.feed(html)
    scan.close()
    out: List[str] = []
    for v in scan.hrefs:
        u = abs_url_fast(base_uri, v)
        if rule.satisfy(u):
            out.append(u)
    if parse_src:
        for v in scan.srcs:
            u = abs_url_fast(base_uri, v)
            if rule.satisfy(u):
                out.append(u)
    return out
