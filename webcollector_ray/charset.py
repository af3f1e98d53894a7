"""Charset detection — three-stage fallback matching the reference.

Reference: util/CharsetDetector.java.
1. Nutch-style scan: decode the body as ASCII (errors replaced) and look
   for `<meta http-equiv=content-type ... charset=X>` then the HTML5
   `<meta charset=X>` form (CharsetDetector.java:35-70). NOTE the
   reference decodes the WHOLE body, not just CHUNK_SIZE — replicated.
2. BOM sniff: UTF-8 / UTF-16LE / UTF-16BE (CharsetDetector.java:71-84).
3. Statistical detection (juniversalchardet in the reference; here
   charset_normalizer), default UTF-8 (CharsetDetector.java:92-106).
"""

from __future__ import annotations

import codecs
import re
from typing import Optional

_META_PATTERN = re.compile(
    r"<meta\s+([^>]*http-equiv=(\"|')?content-type(\"|')?[^>]*)>",
    re.IGNORECASE,
)
_CHARSET_PATTERN = re.compile(r"charset=\s*([a-z][_\-0-9a-z]*)", re.IGNORECASE)
_CHARSET_PATTERN_HTML5 = re.compile(
    r"<meta\s+charset\s*=\s*[\"']?([a-z][_\-0-9a-z]*)[^>]*>",
    re.IGNORECASE,
)


def _guess_by_meta(content: bytes) -> Optional[str]:
    length = min(len(content), 2000)
    s = content.decode("ascii", errors="replace")
    encoding: Optional[str] = None
    m = _META_PATTERN.search(s)
    if m:
        cm = _CHARSET_PATTERN.search(m.group(1))
        if cm:
            encoding = cm.group(1)
    if encoding is None:
        m5 = _CHARSET_PATTERN_HTML5.search(s)
        if m5:
            encoding = m5.group(1)
    if encoding is None:
        if length >= 3 and content[:3] == b"\xef\xbb\xbf":
            encoding = "UTF-8"
        elif length >= 2:
            if content[:2] == b"\xff\xfe":
                encoding = "UTF-16LE"
            elif content[:2] == b"\xfe\xff":
                encoding = "UTF-16BE"
    return encoding


def _guess_statistical(content: bytes) -> str:
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(bytes(content)).best()
        if best is not None and best.encoding:
            return best.encoding
    except Exception:
        pass
    return "UTF-8"


def guess_encoding(content: bytes) -> str:
    """CharsetDetector.guessEncoding equivalent; always returns a name."""
    enc = _guess_by_meta(content)
    if enc is None:
        enc = _guess_statistical(content)
    return enc


def normalize_codec(name: str) -> str:
    """Map a detected charset name to a Python codec, UTF-8 on failure."""
    try:
        return codecs.lookup(name).name
    except LookupError:
        return "utf-8"


def decode_html(content: bytes, charset: Optional[str] = None) -> str:
    """Page.html() equivalent: decode with detected charset, replacing
    invalid sequences like Java's `new String(bytes, cs)`
    (model/Page.java:363-381)."""
    cs = charset or guess_encoding(content)
    return content.decode(normalize_codec(cs), errors="replace")
