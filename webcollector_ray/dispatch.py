"""Visitor API + method dispatch.

Reference: fetcher/Visitor.java (annotations :44-83) and
fetcher/VisitorMethodDispatcher.java. A visitor declares methods
decorated with match predicates; each fetched Page is routed to exactly
ONE method with precedence

    code -> type -> urlRegex -> urlRegexRule -> default visit

(VisitorMethodDispatcher.java:206-220), preceded by @before_visit and
followed by autoParse link extraction then @after_parse (:223-229,
240-250).

Python mapping: decorators stamp attributes on methods; the dispatcher
builds its tables once per parse actor (ST3: built once per crawl in the
reference, AutoParseCrawler.java:60-64). Within one annotation kind the
reference iterates a HashMap (nondeterministic); here declaration order
decides, which is a superset-deterministic behavior.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from .links import Links
from .model import CrawlDatums
from .page import Page
from .regex_rule import RegexRule

_SENTINEL_NULL_TYPE = object()


def match_code(*codes: int):
    def deco(fn):
        fn._wc_match_code = list(codes)
        return fn

    return deco


def match_type(*types: str):
    def deco(fn):
        fn._wc_match_type = list(types)
        return fn

    return deco


def match_null_type(fn):
    fn._wc_match_null_type = True
    return fn


def match_url(url_regex: str):
    def deco(fn):
        fn._wc_match_url = url_regex
        return fn

    return deco


def match_url_regex_rule(*rules: str):
    def deco(fn):
        fn._wc_match_url_regex_rule = list(rules)
        return fn

    return deco


def before_visit(fn):
    fn._wc_before_visit = True
    return fn


def after_parse(fn):
    fn._wc_after_parse = True
    return fn


class Visitor:
    """Base visitor; override visit and/or add decorated methods."""

    def visit(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        pass


class VisitorMethodDispatcher:
    def __init__(
        self,
        visitor: Visitor,
        auto_parse: bool,
        regex_rule: Optional[RegexRule],
        auto_detect_img: bool = False,
    ):
        self.visitor = visitor
        self.auto_parse = auto_parse
        self.regex_rule = regex_rule or RegexRule()
        self.auto_detect_img = auto_detect_img

        self.code_methods: dict = {}
        self.type_methods: dict = {}
        self.url_regex_methods: List[Tuple[str, Callable]] = []
        self.url_regex_rule_methods: List[Tuple[RegexRule, Callable]] = []
        self.before_visit_method: Optional[Callable] = None
        self.after_parse_method: Optional[Callable] = None
        self.visit_method: Callable = visitor.visit

        for name in dir(visitor):
            if name.startswith("__"):
                continue
            fn = getattr(visitor, name)
            if not callable(fn):
                continue
            if getattr(fn, "_wc_before_visit", False):
                self.before_visit_method = fn
            if getattr(fn, "_wc_after_parse", False):
                self.after_parse_method = fn
            for code in getattr(fn, "_wc_match_code", []):
                self.code_methods[code] = fn
            for t in getattr(fn, "_wc_match_type", []):
                self.type_methods[t] = fn
            if getattr(fn, "_wc_match_null_type", False):
                self.type_methods[_SENTINEL_NULL_TYPE] = fn
            regex = getattr(fn, "_wc_match_url", None)
            if regex is not None:
                self.url_regex_methods.append((regex, fn))
            rules = getattr(fn, "_wc_match_url_regex_rule", None)
            if rules is not None:
                self.url_regex_rule_methods.append((RegexRule(rules), fn))

    def _route(self, page: Page) -> Callable:
        m = self.code_methods.get(page.code())
        if m is None:
            t = page.crawl_datum.type()
            m = self.type_methods.get(t if t is not None else _SENTINEL_NULL_TYPE)
        if m is None:
            for regex, fn in self.url_regex_methods:
                if page.match_url(regex):
                    m = fn
                    break
        if m is None:
            for rule, fn in self.url_regex_rule_methods:
                if page.match_url_regex_rule(rule):
                    m = fn
                    break
        if m is None:
            m = self.visit_method
        return m

    def dispatch(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        if self.before_visit_method is not None:
            self.before_visit_method(page, next)
        self._route(page)(page, next)
        if self.auto_parse and not self.regex_rule.is_empty():
            self._parse_link(page, next)
        if self.after_parse_method is not None:
            self.after_parse_method(page, next)

    def _parse_link(self, page: Page, next: CrawlDatums) -> None:  # noqa: A002
        # VisitorMethodDispatcher.java:240-250. When the routed visit
        # never built the DOM (page._doc untouched), extract links with
        # the SAX fast scan instead of building a tree just to walk it —
        # differential-tested equal to the DOM path
        # (test_fast_links_random_html_differential). A visitor that DID
        # parse gets its cached doc reused, no second parse.
        ct = page.content_type
        if ct is not None and "text/html" in ct:
            if page._doc is None:
                from .links import fast_links_by_regex

                next.add(
                    fast_links_by_regex(
                        page.html(), page.url() or "",
                        self.regex_rule, self.auto_detect_img,
                    )
                )
                return
            doc = page.doc()
            if doc is not None:
                links = Links().add_by_regex(
                    doc, self.regex_rule, self.auto_detect_img
                )
                next.add(links)
