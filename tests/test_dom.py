"""DOM parser + selector subset + Jsoup-style text()."""

from webcollector_ray import dom


HTML = """<html><head><title> My  Title </title></head><body>
<div id="a" class="outer box">
  <p>Hello   <b>world</b></p>
  <p>Second</p>
  <a href="x.html">link</a>
  <img src="i.png">
</div>
<div id="b"><span class="t">S</span></div>
</body></html>"""


def test_structure_and_title():
    d = dom.parse(HTML, "http://h.test/dir/page.html")
    assert d.title() == "My Title"
    assert d.body().tag == "body"
    assert d.head().tag == "head"


def test_text_normalization():
    d = dom.parse(HTML)
    el = d.select_first("#a")
    # p are block => joined with single space; inline <b> no extra space
    assert el.select_first("p").text() == "Hello world"
    assert el.text() == "Hello world Second link"


def test_br_and_inline_spacing():
    d = dom.parse("<body><p>a<br>b</p><p>c<span>d</span></p></body>")
    assert d.body().text() == "a b cd"


def test_selectors():
    d = dom.parse(HTML)
    assert [e.tag for e in d.select("p")] == ["p", "p"]
    assert d.select_first("#b span").text() == "S"
    assert len(d.select("div.outer")) == 1
    assert len(d.select(".box")) == 1
    assert len(d.select("div > p")) == 2
    assert len(d.select("body > p")) == 0
    assert len(d.select("p, span")) == 3
    assert len(d.select("a[href]")) == 1
    assert len(d.select("*[src]")) == 1
    assert d.select("[class^=out]")[0].id() == "a"
    assert d.select("[class$=box]")[0].id() == "a"
    assert d.select("[id*=b]")[0].id() == "b"


def test_abs_attr():
    d = dom.parse(HTML, "http://h.test/dir/page.html")
    assert d.select_first("a").attr("abs:href") == "http://h.test/dir/x.html"
    assert d.select_first("img").attr("abs:src") == "http://h.test/dir/i.png"
    # no base uri -> ""
    d2 = dom.parse("<body><a href='rel.html'>x</a></body>")
    assert d2.select_first("a").attr("abs:href") == ""


def test_each_attr_requires_attribute():
    d = dom.parse("<body><a href='1'>x</a><a name='n'>y</a></body>", "http://h.test/")
    assert d.select("a").each_attr("href") == ["1"]
    assert d.select("a[href]").each_attr("abs:href") == ["http://h.test/1"]


def test_void_and_autoclose():
    d = dom.parse("<body><ul><li>one<li>two</ul><p>par<div>block</div></body>")
    lis = d.select("li")
    assert [e.text() for e in lis] == ["one", "two"]
    # <p> auto-closed by <div>
    p = d.select_first("p")
    assert p.text() == "par"


def test_entities_decoded():
    d = dom.parse("<body><p>a &amp; b &lt;c&gt;</p></body>")
    assert d.select_first("p").text() == "a & b <c>"


def test_remove():
    d = dom.parse("<body><p>keep</p><script>bad()</script></body>")
    d.select("script").remove()
    assert d.body().text() == "keep"
    assert len(d.select("script")) == 0


def test_outer_html_roundtrip():
    d = dom.parse('<body><div id="x"><p>t</p></div></body>')
    out = d.select_first("#x").outer_html()
    assert out == '<div id="x"><p>t</p></div>'
