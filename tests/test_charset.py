"""Charset detection (util/CharsetDetector.java; CharsetDetectorTest.java)."""

from webcollector_ray.charset import decode_html, guess_encoding, normalize_codec


def test_meta_http_equiv():
    b = b'<html><head><meta http-equiv="Content-Type" content="text/html; charset=gb2312"></head></html>'
    assert guess_encoding(b).lower() == "gb2312"


def test_meta_html5():
    b = b'<html><head><meta charset="iso-8859-7"></head></html>'
    assert guess_encoding(b).lower() == "iso-8859-7"


def test_meta_precedence_over_bom():
    # http-equiv wins even with a BOM present
    b = b"\xef\xbb\xbf" + b'<meta http-equiv="content-type" content="charset=koi8-r">'
    assert guess_encoding(b).lower() == "koi8-r"


def test_bom_utf8():
    assert guess_encoding(b"\xef\xbb\xbfhello") == "UTF-8"


def test_bom_utf16():
    assert guess_encoding(b"\xff\xfeh\x00") == "UTF-16LE"
    assert guess_encoding(b"\xfe\xff\x00h") == "UTF-16BE"


def test_statistical_fallback_default_utf8():
    # plain ascii: whatever the detector says must decode ascii losslessly
    out = decode_html(b"plain ascii text")
    assert out == "plain ascii text"


def test_decode_with_declared_charset():
    html = '<html><head><meta charset="gb2312"></head><body>你好</body></html>'
    b = html.encode("gb2312")
    assert "你好" in decode_html(b)


def test_unknown_charset_falls_back():
    assert normalize_codec("not-a-charset") == "utf-8"
    b = b'<meta charset="bogus-enc">x'
    assert decode_html(b).endswith("x")
