"""CrawlDatum/CrawlDatums semantics.

Mirrors the reference unit tests (src/test/.../CrawlDatumTest.java,
CrawlDatumsTest.java, MetaTest.java) plus the JSON-array serialization
rules of CrawlDatum.java:299-328.
"""

import json

from webcollector_ray.model import (
    CODE_NOT_SET,
    CrawlDatum,
    CrawlDatums,
    STATUS_DB_UNEXECUTED,
)


def test_key_falls_back_to_url():
    d = CrawlDatum("http://a.test/")
    assert d.key == "http://a.test/"
    d.key = "custom"
    assert d.key == "custom"  # CrawlDatumTest.java:38-43


def test_type_stored_in_meta():
    d = CrawlDatum("http://a.test/").set_type("list")
    assert d.type() == "list"
    assert d.meta_map["s_t"] == "list"
    assert d.match_type("list") and not d.match_type("content")
    d2 = CrawlDatum("http://a.test/")
    assert d2.match_type(None)


def test_match_url_full_match():
    d = CrawlDatum("http://a.test/x.html")
    assert d.match_url(r"http://a\.test/.*")
    assert not d.match_url(r"a\.test")  # substring must NOT match


def test_meta_typed_roundtrip():
    # MetaTest.java:13-49
    d = CrawlDatum("http://a.test/")
    d.set_meta("i", 7).set_meta("b", True).set_meta("d", 1.5).set_meta("s", "x")
    assert d.meta_as_int("i") == 7
    assert d.meta_as_boolean("b") is True
    assert d.meta_as_double("d") == 1.5
    assert d.meta("s") == "x"


def test_json_array_roundtrip_drops_code_location():
    d = CrawlDatum(
        "http://a.test/", status=5, execute_time=123, execute_count=2,
        code=301, location="http://b.test/", meta={"k": "v"},
    )
    arr = json.loads(d.as_json_array())
    assert arr[:6] == ["http://a.test/", 5, 123, 2, 301, "http://b.test/"]
    assert arr[6] == {"k": "v"}
    r = CrawlDatum.from_json_array(d.key, d.as_json_array())
    # code/location are per-round transients (CrawlDatum.java:315-328)
    assert r.code == CODE_NOT_SET and r.location is None
    assert r.status == 5 and r.execute_count == 2 and r.meta_map == {"k": "v"}


def test_json_array_no_meta_when_empty():
    d = CrawlDatum("http://a.test/", execute_time=1)
    assert len(json.loads(d.as_json_array())) == 6


def test_datums_add_and_broadcast():
    ds = CrawlDatums()
    ds.add("http://a.test/1").add(["http://a.test/2", "http://a.test/3"])
    assert len(ds) == 3
    added = ds.add_and_return("http://a.test/4")
    added.set_meta("only", 1)
    assert ds[3].meta_map == {"only": 1}
    ds.set_meta("depth", 2).set_type("list")
    assert all(d.meta_as_int("depth") == 2 for d in ds)
    assert all(d.type() == "list" for d in ds)


def test_row_roundtrip():
    d = CrawlDatum("http://a.test/", execute_time=5, meta={"a": 1, "s_t": "x"})
    r = CrawlDatum.from_row(d.to_row())
    assert r.url == d.url and r.key == d.key and r.meta_map == d.meta_map
    assert r.status == STATUS_DB_UNEXECUTED
