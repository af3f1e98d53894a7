"""RegexRule semantics (util/RegexRule.java:67-133)."""

from webcollector_ray.regex_rule import RegexRule


def test_plus_minus_parsing():
    r = RegexRule(["+http://a\\.test/.*", "-.*\\.jpg", "http://b\\.test/.*"])
    assert r.positive == ["http://a\\.test/.*", "http://b\\.test/.*"]
    assert r.negative == [".*\\.jpg"]


def test_satisfy():
    r = RegexRule(["+http://a\\.test/.*", "-.*\\.jpg"])
    assert r.satisfy("http://a.test/x.html")
    assert not r.satisfy("http://a.test/x.jpg")   # negative wins
    assert not r.satisfy("http://c.test/x.html")  # no positive match
    assert not r.satisfy(None)


def test_full_match_not_search():
    r = RegexRule(["a.*c"])
    assert r.satisfy("abc")
    assert not r.satisfy("xabcx")  # Pattern.matches = full match


def test_empty_rule_never_satisfies():
    r = RegexRule()
    assert r.is_empty()
    assert not r.satisfy("anything")
    r2 = RegexRule(["-.*\\.jpg"])  # negatives only: still empty positives
    assert r2.is_empty()
    assert not r2.satisfy("http://a.test/")


def test_pickle_roundtrip():
    import pickle

    r = pickle.loads(pickle.dumps(RegexRule(["+a.*", "-b.*"])))
    assert r.satisfy("ax") and not r.satisfy("bx")


def test_satisfy_many():
    r = RegexRule(["+http://a\\.test/.*", "-.*\\.png"])
    mask = r.satisfy_many(
        ["http://a.test/1", "http://a.test/x.png", "http://z.test/", None]
    )
    assert mask.tolist() == [True, False, False, False]
