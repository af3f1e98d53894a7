"""Charset detection (util/CharsetDetector.java; CharsetDetectorTest.java)."""

import pytest
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


# ---- statistical parity with juniversalchardet -------------------------
# CharsetDetectorTest.java:34-49 pins these four; the meta-less page
# fixtures exercise the same detector through the full guessEncoding path.

RU_SHORT = "привет"
RU_TEXT = (
    "Широкая электрификация южных губерний даст мощный толчок "
    "подъёму сельского хозяйства. " * 3
)
EL_TEXT = "Πάντ' ἀγαθὰ πράττω, ὦ φίλε."  # unmappables replaced like Java
FR_TEXT = (
    "le cœur déçu mais l'âme plutôt naïve, Louÿs rêva de crapaüter "
    "en canoë au delà des îles " * 3
)


def _meta_less_page(codec: str, body: str) -> bytes:
    html = f"<html><head><title>t</title></head><body><p>{body}</p></body></html>"
    return html.encode(codec, errors="replace")


def test_statistical_reference_cases():
    # the exact four assertions of CharsetDetectorTest.testGuessEncoding
    assert guess_encoding(RU_SHORT.encode("koi8_r")) == "KOI8-R"
    assert guess_encoding(RU_SHORT.encode("cp1251")) == "WINDOWS-1251"
    assert guess_encoding(EL_TEXT.encode("iso8859_7", errors="replace")) == "ISO-8859-7"
    assert guess_encoding("hello".encode("cp1252")) == "UTF-8"


def test_statistical_meta_less_pages():
    assert guess_encoding(_meta_less_page("koi8_r", RU_TEXT)) == "KOI8-R"
    assert guess_encoding(_meta_less_page("cp1251", RU_TEXT)) == "WINDOWS-1251"
    assert guess_encoding(_meta_less_page("iso8859_5", RU_TEXT)) == "ISO-8859-5"
    assert guess_encoding(_meta_less_page("iso8859_7", EL_TEXT)) == "ISO-8859-7"
    assert guess_encoding(_meta_less_page("cp1252", FR_TEXT)) == "WINDOWS-1252"
    # valid UTF-8 multibyte text is detected as UTF-8, not a SBCS
    assert guess_encoding(_meta_less_page("utf-8", RU_TEXT)) == "UTF-8"


def test_statistical_decode_roundtrip():
    # the decoded page must reproduce the original body text
    for codec in ("koi8_r", "cp1251", "iso8859_5"):
        page = _meta_less_page(codec, RU_TEXT)
        assert RU_TEXT.rstrip() in decode_html(page)


def test_utf8_state_machine_rejects_overlong_and_surrogates():
    from webcollector_ray.charset import _utf8_scan

    assert _utf8_scan("привет".encode("utf-8")) == (True, 6)
    assert _utf8_scan(b"abc")[0] is True
    assert _utf8_scan(b"\xc0\xaf")[0] is False       # overlong '/'
    assert _utf8_scan(b"\xed\xa0\x80")[0] is False   # surrogate
    assert _utf8_scan(b"\xf5\x80\x80\x80")[0] is False  # > U+10FFFF lead
    assert _utf8_scan(b"\x80")[0] is False           # lone continuation


# ---- multi-byte probers (juniversalchardet MBCS coverage; VERDICT r2
# §missing.2 / §next.6): meta-less CJK pages must detect correctly ----

_JA = (
    "日本語のテストです。これはウェブページの文字コード検出を確認する"
    "ための文章であり、漢字とひらがなとカタカナを含みます。今日は天気"
    "がいいですね。"
)
_ZH_SIMP = (
    "这是一个用来测试字符集检测的中文网页，其中包含了很多常见的汉字。"
    "我们的目标是正确识别编码。中国人民在这个时代有很多的发展机会。"
)
_ZH_TRAD = (
    "這是一個用來測試字符集檢測的中文網頁，其中包含了很多常見的漢字。"
    "我們的目標是正確識別編碼。人們在這個時代有很多的發展機會。"
)
_KO = (
    "이것은 문자 집합 감지를 테스트하기 위한 한국어 문서입니다. "
    "여기에는 많은 일반적인 음절이 포함되어 있습니다. 사람들이 이 "
    "기술을 사용합니다."
)


@pytest.mark.parametrize(
    "text,codec,want",
    [
        (_JA, "shift_jis", "SHIFT_JIS"),
        (_JA, "euc_jp", "EUC-JP"),
        (_ZH_SIMP, "gb18030", "GB18030"),
        (_ZH_SIMP, "gb2312", "GB18030"),  # GB2312 is a GB18030 subset
        (_ZH_TRAD, "big5", "BIG5"),
        (_KO, "euc_kr", "EUC-KR"),
    ],
)
def test_multibyte_detection_meta_less(text, codec, want):
    body = b"<html><body><p>" + text.encode(codec) + b"</p></body></html>"
    assert guess_encoding(body) == want
    # and the decode round-trips the text
    assert text in decode_html(body, guess_encoding(body))


@pytest.mark.parametrize(
    "text,codec,want",
    [
        (_JA, "shift_jis", "SHIFT_JIS"),
        (_ZH_SIMP, "gb18030", "GB18030"),
    ],
)
def test_multibyte_meta_still_wins(text, codec, want):
    # an explicit <meta charset> bypasses the statistical stage
    body = (
        b'<html><head><meta charset="utf-8"></head><body>'
        + text.encode(codec) + b"</body></html>"
    )
    assert guess_encoding(body).upper() == "UTF-8"


# ---- round-4 envelope: Hebrew/Thai SBCS + UTF-16/32 without BOM ----

HE_TEXT = (
    "האתר הזה מכיל מידע רב על ההיסטוריה של העיר ירושלים "
    "ועל תושביה לאורך הדורות " * 2
)
TH_TEXT = (
    "ประเทศไทยมีประวัติศาสตร์อันยาวนานและวัฒนธรรมที่หลากหลาย " * 2
)


def test_statistical_hebrew_thai():
    # juniversalchardet reports windows-1255 for Hebrew (its dedicated
    # HebrewProber); the letter bytes are identical in ISO-8859-8, so
    # the windows name doubles for both
    assert guess_encoding(_meta_less_page("cp1255", HE_TEXT)) == "WINDOWS-1255"
    assert guess_encoding(_meta_less_page("iso8859_8", HE_TEXT)) == "WINDOWS-1255"
    assert guess_encoding(_meta_less_page("tis_620", TH_TEXT)) == "TIS-620"
    # decode round-trips
    page = _meta_less_page("tis_620", TH_TEXT)
    assert TH_TEXT.rstrip() in decode_html(page)
    page = _meta_less_page("cp1255", HE_TEXT)
    assert HE_TEXT.rstrip() in decode_html(page)
    # existing scripts still probe to their own charsets
    assert guess_encoding(_meta_less_page("cp1251", RU_TEXT)) == "WINDOWS-1251"


@pytest.mark.parametrize(
    "codec,want",
    [
        ("utf-16-le", "UTF-16LE"),
        ("utf-16-be", "UTF-16BE"),
        ("utf-32-le", "UTF-32LE"),
        ("utf-32-be", "UTF-32BE"),
    ],
)
def test_utf16_32_without_bom(codec, want):
    # no BOM: text encoded directly with the endian-specific codec
    body = f"<html><body><p>{RU_TEXT}</p></body></html>".encode(codec)
    # endian-specific codecs write NO BOM (UTF-32BE's leading
    # \x00\x00\x00< is the '<' code unit, not a byte-order mark)
    assert not body.startswith(
        (b"\xff\xfe", b"\xfe\xff", b"\x00\x00\xfe\xff")
    )
    assert guess_encoding(body) == want
    assert RU_TEXT.rstrip() in decode_html(body)


def test_utf16_probe_no_false_positives():
    # plain ASCII, UTF-8 multibyte and SBCS bodies have no interleaved
    # null pattern -> the wide-char probe must stay silent
    assert guess_encoding(b"just plain ascii text, long enough to sample") == "UTF-8"
    assert guess_encoding(_meta_less_page("utf-8", RU_TEXT)) == "UTF-8"
    assert guess_encoding(_meta_less_page("koi8_r", RU_TEXT)) == "KOI8-R"


@pytest.mark.parametrize(
    "codec,want,text",
    [
        ("iso2022_jp", "ISO-2022-JP", "今日は良い天気です。"),
        ("iso2022_kr", "ISO-2022-KR", "안녕하세요 세계"),
        ("hz", "HZ-GB-2312", "你好世界"),
    ],
)
def test_escaped_encodings_meta_less(codec, want, text):
    # no meta, no BOM: the designator escape sequence alone must
    # identify the stream (juniversalchardet EscCharsetProber
    # envelope), and the decode must round-trip
    body = f"<html><body><p>{text}</p></body></html>".encode(codec)
    assert guess_encoding(body) == want
    assert text in decode_html(body)


def test_escaped_prober_no_false_positives():
    # a stray ESC in binary-ish or high-byte content must not claim
    # ISO-2022; pure ASCII with a tilde-brace-free body stays UTF-8
    high = b"\x1b" + bytes(range(128, 256)) * 8
    assert guess_encoding(high) != "ISO-2022-JP"
    assert guess_encoding(b"ascii with ~tilde~ but no shift") == "UTF-8"
    # ESC without any designator sequence is not an escaped charset
    assert guess_encoding(b"\x1b[31mansi colored terminal text\x1b[0m") == "UTF-8"
