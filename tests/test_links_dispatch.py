"""Links extraction (model/Links.java) and visitor dispatch precedence
(fetcher/VisitorMethodDispatcher.java:206-220)."""

from webcollector_ray import dom
from webcollector_ray.dispatch import (
    Visitor,
    VisitorMethodDispatcher,
    after_parse,
    before_visit,
    match_code,
    match_type,
    match_url,
)
from webcollector_ray.links import Links
from webcollector_ray.model import CrawlDatum, CrawlDatums
from webcollector_ray.page import Page
from webcollector_ray.regex_rule import RegexRule

HTML = """<body>
<a href="show-1.html">one</a>
<a href="/abs/show-2.html">two</a>
<a href="http://other.test/x.html">off-site</a>
<a href="#frag">frag</a>
<a href="pic.jpg">jpg</a>
<img src="img.png">
<div class="zone"><a href="zoned.html">z</a></div>
</body>"""

BASE = "http://s.test/dir/page.html"


def _doc():
    return dom.parse(HTML, BASE)


def test_add_from_element():
    links = Links().add_from_element(_doc().body())
    assert links._list == [
        "http://s.test/dir/show-1.html",
        "http://s.test/abs/show-2.html",
        "http://other.test/x.html",
        "http://s.test/dir/page.html#frag",
        "http://s.test/dir/pic.jpg",
        "http://s.test/dir/zoned.html",
    ]


def test_add_from_element_with_img():
    links = Links().add_from_element(_doc().body(), parse_img=True)
    assert "http://s.test/dir/img.png" in links._list


def test_add_by_regex_rule():
    rule = RegexRule([r"+http://s\.test/.*", r"-.*\.jpg"])
    links = Links().add_by_regex(_doc().body(), rule)
    assert "http://s.test/dir/pic.jpg" not in links._list
    assert "http://other.test/x.html" not in links._list
    assert "http://s.test/dir/show-1.html" in links._list


def test_add_by_selector():
    links = Links().add_by_selector(_doc().body(), "div.zone a")
    assert links._list == ["http://s.test/dir/zoned.html"]


def test_filter_by_regex():
    links = Links(["http://a.test/1.html", "http://a.test/1.jpg"])
    links.filter_by_regex(RegexRule([r"+.*\.html"]))
    assert links._list == ["http://a.test/1.html"]


def _page(url="http://s.test/p.html", code=200, type=None, html=b"<body>x</body>"):
    d = CrawlDatum(url, code=code)
    if type:
        d.set_type(type)
    return Page(d, content_type="text/html", content=html)


class _V(Visitor):
    def __init__(self):
        self.calls = []

    @before_visit
    def pre(self, page, next):
        self.calls.append("pre")

    @match_code(404)
    def on_404(self, page, next):
        self.calls.append("404")

    @match_type("list")
    def on_list(self, page, next):
        self.calls.append("type")

    @match_url(".*show.*")
    def on_show(self, page, next):
        self.calls.append("urlregex")

    def visit(self, page, next):
        self.calls.append("visit")

    @after_parse
    def post(self, page, next):
        self.calls.append("post")


def _dispatch(page):
    v = _V()
    VisitorMethodDispatcher(v, auto_parse=False, regex_rule=None).dispatch(
        page, CrawlDatums()
    )
    return v.calls


def test_precedence_code_first():
    # a 404 list-typed show url -> code wins
    assert _dispatch(_page(url="http://s.test/show.html", code=404, type="list")) == [
        "pre", "404", "post",
    ]


def test_precedence_type_then_urlregex_then_default():
    assert _dispatch(_page(type="list")) == ["pre", "type", "post"]
    assert _dispatch(_page(url="http://s.test/show-9.html")) == ["pre", "urlregex", "post"]
    assert _dispatch(_page()) == ["pre", "visit", "post"]


def test_auto_parse_appends_links():
    v = Visitor()
    rule = RegexRule([r"+http://s\.test/.*\.html"])
    disp = VisitorMethodDispatcher(v, auto_parse=True, regex_rule=rule)
    page = _page(html=HTML.encode())
    page.crawl_datum.url = BASE
    nxt = CrawlDatums()
    disp.dispatch(page, nxt)
    urls = [d.url for d in nxt]
    assert "http://s.test/dir/show-1.html" in urls
    assert "http://s.test/dir/pic.jpg" not in urls


def test_auto_parse_skips_non_html():
    rule = RegexRule([".*"])
    disp = VisitorMethodDispatcher(Visitor(), auto_parse=True, regex_rule=rule)
    page = _page()
    page.content_type = "application/json"
    nxt = CrawlDatums()
    disp.dispatch(page, nxt)
    assert len(nxt) == 0


def test_anchor_text_counts(ray_session):
    import ray.data as rd

    from webcollector_ray.stages.extract import anchor_text_counts
    from webcollector_ray.synth import SynthSpec, synth_pages_table

    spec = SynthSpec(num_sites=1)
    pages = synth_pages_table(spec)
    out = anchor_text_counts(
        rd.from_arrow(pages.select(["url", "html"])),
        url_regex=r"http://site[0-9]+\.test/(list|show)-[0-9]+\.html",
    ).to_pandas()
    by = out.set_index(["target_url", "anchor_text"])["n"]
    # Home on every list (4) + show (12) page
    assert by[("http://site0.test/list-0.html", "Home")] == 16
    # each show is listed once with its title, Related/More once each
    rel = out[out["anchor_text"] == "Related"]
    assert len(rel) == 12 and (rel["n"] == 1).all()
    # pager: Next exists for list-1..3 only
    nxt = out[out["anchor_text"] == "Next"]
    assert sorted(nxt["target_url"]) == [
        f"http://site0.test/list-{i}.html" for i in (1, 2, 3)
    ]
    # out-of-scope anchors (About/Top/Banner/Partner/logo) excluded
    assert not set(out["anchor_text"]) & {
        "About", "Top", "Banner", "Partner", "logo"
    }


def test_abs_url_fast_matches_abs_url():
    """abs_url_fast's string-ops shortcuts must agree with abs_url
    (urljoin) on every URL shape, falling back where it can't."""
    import itertools

    from webcollector_ray.urls import abs_url, abs_url_fast

    bases = [
        "http://site0.test/list-0.html", "http://site0.test",
        "http://site0.test/", "https://h.test:8080/a/b/c.html",
        "http://h.test/a/b/", "http://h.test/x.html?q=1",
        "http://h.test/x.html#f", "http://h.test/./a/x.html",
        "http://h.test/a/../x.html", "", "ftp://h.test/x",
        "//proto.test/x", "not a url",
    ]
    rels = [
        "show-3.html", "a/b/c.html", "/abs.html", "//other.test/y",
        "http://o.test/y.html", "https://o.test/y/../z.html",
        "HTTP://O.test/y", "../up.html", "./here.html", "x/../y.html",
        "?q=2", "#frag", "mailto:a@b", "javascript:void(0)", "", "  ",
        "a b.html", "sp%20.html", "x.html?a=1#b", "dir/", "/", None,
        "..", ".", "http://o.test/a//b", "tel:123", "a,b.html",
        "~u/x.html", "%2e%2e/x",
    ]
    for b, r in itertools.product(bases, rels):
        assert abs_url_fast(b, r) == abs_url(b, r), (b, r)


def test_fast_links_by_regex_matches_dom():
    from webcollector_ray import dom
    from webcollector_ray.links import Links, fast_links_by_regex
    from webcollector_ray.regex_rule import RegexRule

    html = (
        "<html><head><title>t</title></head><body>"
        '<a href="show-1.html">x</a><a name="n">no href</a>'
        '<A HREF="http://other.test/a.html"></A>'
        "<!-- <a href='commented.html'>hidden</a> -->"
        "<script>var s = '<a href=\"scripted.html\">';</script>"
        '<a href>valueless</a><a href="show-1.html">dup</a>'
        '<a href="../up.html">up</a><img src="i.png">'
        '<div><a href="deep/./x.html">deep</a></div>'
        "</body></html>"
    )
    base = "http://site0.test/d/list-0.html"
    for rule, src in [
        (RegexRule([r".*\.html"]), False),
        (RegexRule([".*"]), True),
        (RegexRule([".*show.*", r"-.*other.*"]), False),
    ]:
        fast = fast_links_by_regex(html, base, rule, src)
        slow = list(Links().add_by_regex(dom.parse(html, base), rule, src))
        assert fast == slow, (fast, slow)


def test_fast_links_random_html_differential():
    """Randomized differential: the SAX fast scan must match the DOM
    path over generated html with nested tags, comments, scripts,
    malformed nesting, entities and duplicate/valueless attrs."""
    import random

    from webcollector_ray import dom
    from webcollector_ray.links import Links, fast_links_by_regex
    from webcollector_ray.regex_rule import RegexRule

    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "x&amp;y", "café"]
    hrefs = ["a.html", "/b.html", "http://o.test/c.html", "../d.html",
             "e.html?q=1#f", "", "javascript:void(0)", "dir/sub.html"]

    def rand_elem(depth):
        if depth > 3 or rng.random() < 0.3:
            return rng.choice(words)
        tag = rng.choice(["div", "p", "span", "ul", "li", "b"])
        inner = "".join(rand_elem(depth + 1) for _ in range(rng.randint(0, 3)))
        kids = []
        if rng.random() < 0.5:
            h = rng.choice(hrefs)
            attr = f' href="{h}"' if rng.random() < 0.8 else " href"
            extra = ' class="k" href="shadow.html"' if rng.random() < 0.2 else ""
            kids.append(f"<a{attr}{extra}>{rng.choice(words)}</a>")
        if rng.random() < 0.2:
            kids.append(f"<!-- <a href='{rng.choice(hrefs)}'>c</a> -->")
        if rng.random() < 0.2:
            kids.append(f"<script>var a='<a href=\"{rng.choice(hrefs)}\">';</script>")
        if rng.random() < 0.2:
            kids.append(f"<img src='{rng.choice(hrefs)}'>")
        if rng.random() < 0.15:
            kids.append("<p>unclosed <b>bold")
        rng.shuffle(kids)
        return f"<{tag}>{inner}{''.join(kids)}</{tag}>"

    rule_any = RegexRule([".*"])
    rule_html = RegexRule([r".*\.html.*"])
    for trial in range(60):
        body = "".join(rand_elem(0) for _ in range(rng.randint(1, 6)))
        html = f"<html><head><title>t</title></head><body>{body}</body></html>"
        base = "http://site9.test/d/e/list-0.html"
        for rule in (rule_any, rule_html):
            for src in (False, True):
                fast = fast_links_by_regex(html, base, rule, src)
                slow = list(
                    Links().add_by_regex(dom.parse(html, base), rule, src)
                )
                assert fast == slow, (trial, rule.positive, src, fast, slow)
