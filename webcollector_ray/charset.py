"""Charset detection — three-stage fallback matching the reference.

Reference: util/CharsetDetector.java.
1. Nutch-style scan: decode the body as ASCII (errors replaced) and look
   for `<meta http-equiv=content-type ... charset=X>` then the HTML5
   `<meta charset=X>` form (CharsetDetector.java:35-70). NOTE the
   reference decodes the WHOLE body, not just CHUNK_SIZE — replicated.
2. BOM sniff: UTF-8 / UTF-16LE / UTF-16BE (CharsetDetector.java:71-84).
3. Statistical detection, default UTF-8 (CharsetDetector.java:92-106).
   The reference delegates to juniversalchardet (Mozilla's
   universalchardet ported to Java); here the same composite approach
   (Li & Momoi, "A composite approach to language/encoding detection",
   Netscape 2001) is implemented directly: a UTF-8 validation state
   machine first, then single-byte-charset probers that score each
   candidate by decoded script membership, letter case shape and
   language letter-frequency — covering the charsets pinned by
   CharsetDetectorTest.java:34-49 (KOI8-R / WINDOWS-1251 / ISO-8859-5
   Cyrillic, ISO-8859-7 / WINDOWS-1253 Greek, discounted WINDOWS-1252
   Latin) plus the rest of the juniversalchardet envelope
   (CharsetDetector.java:33-124): WINDOWS-1255/ISO-8859-8 Hebrew,
   TIS-620 Thai, and UTF-16/32 in either endianness WITHOUT a BOM
   (null-pattern gate + strict-decode plausibility scoring, multi-byte
   CJK group in _probe_mbcs). Pure-ASCII input detects nothing and
   falls to UTF-8, like juniversalchardet returning null.
"""

from __future__ import annotations

import codecs
import re
from typing import Optional, Tuple

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


# ---- UTF-8 validation state machine (Mozilla nsUTF8Prober shape) ----


def _utf8_scan(content: bytes) -> Tuple[bool, int]:
    """-> (is_valid_utf8, n_multibyte_sequences). Incremental DFA over
    the byte stream; rejects overlongs/surrogates like a strict
    decoder."""
    need = 0
    first = 0
    pending = 0
    n_multi = 0
    for b in content:
        if need == 0:
            if b < 0x80:
                continue
            if 0xC2 <= b <= 0xDF:
                need, first = 1, b
            elif 0xE0 <= b <= 0xEF:
                need, first = 2, b
            elif 0xF0 <= b <= 0xF4:
                need, first = 3, b
            else:  # 0x80-0xC1 lone continuation / overlong lead
                return False, n_multi
            pending = need
        else:
            if not (0x80 <= b <= 0xBF):
                return False, n_multi
            # overlong / surrogate / out-of-range second-byte limits
            if pending == need:  # first continuation byte
                if first == 0xE0 and b < 0xA0:
                    return False, n_multi
                if first == 0xED and b > 0x9F:
                    return False, n_multi
                if first == 0xF0 and b < 0x90:
                    return False, n_multi
                if first == 0xF4 and b > 0x8F:
                    return False, n_multi
            need -= 1
            if need == 0:
                n_multi += 1
    return need == 0, n_multi


# ---- multi-byte charset probers (juniversalchardet's MBCS group) ------
#
# CharsetDetector.java:33-124 delegates to juniversalchardet, whose
# multi-byte group covers Shift-JIS / EUC-JP / GB18030 / EUC-KR / Big5
# via per-encoding coding state machines + character distribution
# analysis (Li & Momoi 2001 §4). Replicated here: structure validation
# first (one illegal sequence eliminates the candidate), then a
# distribution score over the decoded text — script-membership for
# Japanese/Korean, a top-frequency hanzi table for Chinese (random
# byte pairs decode to RARE hanzi, real text hits the frequent set).

# top-frequency hanzi (public frequency lists); simplified + traditional
_ZH_TOP_SIMP = (
    "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而"
    "要于就下得可你年生自会那后能对着事其里所去行过家十用发天如然作"
    "方成者多日都三小军二无同么经法当起与好看学进种将还分此心前面又"
    "定见只主没公从"
)
_ZH_TOP_TRAD = (
    "的一是不了人我在有他這為之大來以個中上們到說國和地也子時道出而"
    "要於就下得可你年生自會那後能對著事其裡所去行過家十用發天如然作"
    "方成者多日都三小軍二無同麼經法當起與好看學進種將還分此心前面又"
    "定見只主沒公從"
)
# common Hangul syllables (high-frequency Korean text syllables)
_KO_TOP = (
    "이다의에하는을로가고지서은한그여를기들시사람있것수보않없나주아"
    "니말일도되게면해었습니으려무와과내중년대국누저때문같우리인전자"
    "정보용더만즈했젠만든술때매우포함"
)

_MBCS_MIN_CONFIDENCE = 0.35


def _scan_mbcs(data: bytes, kind: str) -> Tuple[bool, int]:
    """Coding state machine: (structurally legal, n multibyte seqs)."""
    i, n, multi = 0, len(data), 0
    while i < n:
        b = data[i]
        if kind == "sjis":
            if b < 0x80 or 0xA1 <= b <= 0xDF:
                i += 1
                continue
            if (0x81 <= b <= 0x9F) or (0xE0 <= b <= 0xFC):
                if i + 1 < n and (
                    0x40 <= data[i + 1] <= 0x7E or 0x80 <= data[i + 1] <= 0xFC
                ):
                    multi += 1
                    i += 2
                    continue
            return False, multi
        elif kind == "eucjp":
            if b < 0x80:
                i += 1
                continue
            if b == 0x8E:
                if i + 1 < n and 0xA1 <= data[i + 1] <= 0xDF:
                    multi += 1
                    i += 2
                    continue
                return False, multi
            if b == 0x8F:
                if (
                    i + 2 < n
                    and 0xA1 <= data[i + 1] <= 0xFE
                    and 0xA1 <= data[i + 2] <= 0xFE
                ):
                    multi += 1
                    i += 3
                    continue
                return False, multi
            if 0xA1 <= b <= 0xFE:
                if i + 1 < n and 0xA1 <= data[i + 1] <= 0xFE:
                    multi += 1
                    i += 2
                    continue
            return False, multi
        elif kind == "euckr":
            if b < 0x80:
                i += 1
                continue
            if 0xA1 <= b <= 0xFE:
                if i + 1 < n and 0xA1 <= data[i + 1] <= 0xFE:
                    multi += 1
                    i += 2
                    continue
            return False, multi
        elif kind == "gb18030":
            if b < 0x80:
                i += 1
                continue
            if 0x81 <= b <= 0xFE:
                if i + 1 < n:
                    t = data[i + 1]
                    if 0x40 <= t <= 0xFE and t != 0x7F:
                        multi += 1
                        i += 2
                        continue
                    if 0x30 <= t <= 0x39:  # 4-byte form
                        if (
                            i + 3 < n
                            and 0x81 <= data[i + 2] <= 0xFE
                            and 0x30 <= data[i + 3] <= 0x39
                        ):
                            multi += 1
                            i += 4
                            continue
            return False, multi
        else:  # big5
            if b < 0x80:
                i += 1
                continue
            if 0x81 <= b <= 0xFE:
                if i + 1 < n and (
                    0x40 <= data[i + 1] <= 0x7E or 0xA1 <= data[i + 1] <= 0xFE
                ):
                    multi += 1
                    i += 2
                    continue
            return False, multi
    return True, multi


# (reported name, python codec, state machine kind, language)
_MBCS_PROBERS = [
    ("SHIFT_JIS", "shift_jis", "sjis", "ja"),
    ("EUC-JP", "euc_jp", "eucjp", "ja"),
    ("GB18030", "gb18030", "gb18030", "zh"),
    ("BIG5", "big5", "big5", "zh-trad"),
    ("EUC-KR", "euc_kr", "euckr", "ko"),
]


def _mbcs_confidence(lang: str, decoded: str) -> float:
    """Distribution score of a structurally-valid decoding: fraction of
    non-ASCII chars that belong to the language's high-frequency set
    (full weight) or merely to its script (0.3), with replacement chars
    as strong negatives. Random/garbage decodings land far below real
    text on the frequent-set fraction."""
    non_ascii = [ch for ch in decoded if ord(ch) >= 128]
    if not non_ascii:
        return 0.0
    n = len(non_ascii)
    bad = sum(1 for ch in non_ascii if ch == "�")
    score = 0.0
    for ch in non_ascii:
        o = ord(ch)
        if lang == "ja":
            if 0x3040 <= o <= 0x30FF:  # hiragana + katakana
                score += 1.0
            elif 0x4E00 <= o <= 0x9FFF or o in (0x3001, 0x3002):
                score += 0.3
        elif lang == "ko":
            if ch in _KO_TOP:
                score += 1.0
            elif 0xAC00 <= o <= 0xD7A3:
                score += 0.3
        else:  # zh / zh-trad
            top = _ZH_TOP_TRAD if lang == "zh-trad" else _ZH_TOP_SIMP
            if ch in top:
                score += 1.0
            elif 0x4E00 <= o <= 0x9FFF or o in (0x3001, 0x3002, 0xFF0C):
                score += 0.3
    return (score / n) * max(0.0, 1.0 - 2.0 * bad / n)


def _probe_mbcs(data: bytes) -> Tuple[Optional[str], float]:
    best, best_conf = None, 0.0
    for name, codec, kind, lang in _MBCS_PROBERS:
        legal, multi = _scan_mbcs(data, kind)
        if not legal or multi == 0:
            continue
        decoded = data.decode(codec, errors="replace")
        conf = _mbcs_confidence(lang, decoded)
        if conf > best_conf:
            best, best_conf = name, conf
    return best, best_conf


# ---- single-byte charset probers --------------------------------------

# language letter-frequency strings, most-common first (public letter
# frequency tables for Russian and Greek; Mozilla's sequence models are
# built from the same orderings)
_RU_FREQ = "оеаинтсрвлкмдпуяыьгзбчйхжшюцщэфъё"
_EL_FREQ = "αοιετσνηυρπκμλωδγχθφβξζψς"
_EL_ACCENT = "άέήίόύώϊϋΐΰ"
_LATIN_EXT = "àáâãäåæçèéêëìíîïñòóôõöøùúûüýÿšžœßðþ"

# Hebrew and Thai models (juniversalchardet's HebrewProber / Thai
# sequence model, CharsetDetector.java:33-124 envelope). Both scripts
# are caseless; letter frequencies from public corpus tables.
_HE_FREQ = "יהוארתמלשב"
_HE_ALPHA = "אבגדהוזחטיכךלמםנןסעפףצץקרשת"
_TH_FREQ = "านรเอิงกมยตวลดส"
_TH_ALPHA = (
    "กขฃคฅฆงจฉชซฌญฎฏฐฑฒณดตถทธนบปผฝพฟภมยรฤลฦวศษสหฬอฮ"
    "ะัาำิีึืุูเแโใไๅๆ็่้๊๋์"
)

# (codec, frequent letters, full alphabet) per candidate, in the probe
# order juniversalchardet's SBCS group uses for these charsets
_SBCS_PROBERS = [
    ("WINDOWS-1251", "cp1251", _RU_FREQ[:16], _RU_FREQ),
    ("KOI8-R", "koi8_r", _RU_FREQ[:16], _RU_FREQ),
    ("ISO-8859-5", "iso8859_5", _RU_FREQ[:16], _RU_FREQ),
    ("ISO-8859-7", "iso8859_7", _EL_FREQ[:14], _EL_FREQ + _EL_ACCENT),
    ("WINDOWS-1253", "cp1253", _EL_FREQ[:14], _EL_FREQ + _EL_ACCENT),
    ("WINDOWS-1255", "cp1255", _HE_FREQ, _HE_ALPHA),
    ("ISO-8859-8", "iso8859_8", _HE_FREQ, _HE_ALPHA),
    ("TIS-620", "tis_620", _TH_FREQ, _TH_ALPHA),
    ("WINDOWS-1252", "cp1252", _LATIN_EXT[:12], _LATIN_EXT),
]

# Latin-1 is so often a wrong default that Mozilla discounts its prober
_LATIN1_DISCOUNT = 0.70

_SBCS_MIN_CONFIDENCE = 0.25


def _sbcs_score(
    decoded: str, frequent: str, alphabet: str, latin: bool = False
) -> float:
    """Score a candidate decoding: frequent lowercase letters of the
    model language score high, rare-but-valid letters low, uppercase
    (rare in running text) lower still, anything outside the script is
    a strong negative. Normalized by the number of non-ASCII chars.

    The `latin` flag models how the script mixes with ASCII: Latin
    accents sit INSIDE ASCII words (cœur, déçu), while a Cyrillic or
    Greek letter adjacent to an ASCII letter means the decoding is
    almost surely wrong — this is what keeps French cp1252 from
    probing as WINDOWS-1251 (both decode every high byte to "letters").
    """
    freq_set = set(frequent)
    alpha_set = set(alphabet) | {c.upper() for c in alphabet}
    total = 0
    score = 0.0
    prev_in = False
    n = len(decoded)
    for i, ch in enumerate(decoded):
        if ord(ch) < 128:
            prev_in = False
            continue
        total += 1
        prev_ascii_alpha = i > 0 and decoded[i - 1].isascii() and decoded[i - 1].isalpha()
        next_ascii_alpha = (
            i + 1 < n and decoded[i + 1].isascii() and decoded[i + 1].isalpha()
        )
        ascii_neighbor = prev_ascii_alpha or next_ascii_alpha
        if ch in freq_set:
            score += 2.0
            if prev_in:
                score += 0.5  # adjacent in-model letters: word shape
            prev_in = True
        elif ch in alpha_set:
            # caseless scripts (Hebrew/Thai) count as running text, not
            # as the rare-uppercase shape
            lower = not ch.isupper()
            score += 1.0 if lower else 0.25
            prev_in = lower
        else:
            score -= 2.0
            prev_in = False
            continue
        if latin:
            if ascii_neighbor:
                score += 1.0
        elif ascii_neighbor:
            score -= 2.0
    if total == 0:
        return 0.0
    return score / (2.5 * total)  # 1.0 == all frequent+adjacent


_WIDE_CANDIDATES = (
    ("UTF-32LE", "utf-32-le", 4),
    ("UTF-32BE", "utf-32-be", 4),
    ("UTF-16LE", "utf-16-le", 2),
    ("UTF-16BE", "utf-16-be", 2),
)


def _probe_utf1632(data: bytes) -> Optional[str]:
    """UTF-16/32 WITHOUT a BOM (the juniversalchardet envelope,
    CharsetDetector.java:33-124). Gate: real wide-char text of any
    script carries null bytes (markup/spaces/newlines are ASCII-range),
    so a byte stream with <10% nulls is never probed — ASCII, UTF-8 and
    every SBCS page exits here for the cost of one count(). Candidates
    that survive a STRICT decode are scored on text plausibility
    (letters/digits/ASCII-printables) with a minimum whitespace share;
    wrong widths/endianness produce NULs, lone surrogates or private-
    use soup and fail. CJK-dominant UTF-16 with no markup is out of
    reach, as it is for the reference's detector. This must run BEFORE
    the UTF-8 validator: interleaved nulls are valid UTF-8 bytes, so
    the validator would happily claim the stream."""
    n = len(data)
    if n < 20 or data.count(0) / n < 0.10:
        return None
    best, best_score = None, 0.0
    for name, codec, unit in _WIDE_CANDIDATES:
        q = n - (n % unit)
        if q < unit * 10:
            continue
        try:
            s = data[:q].decode(codec)
        except (UnicodeDecodeError, ValueError):
            continue
        if not s:
            continue
        ws = sum(1 for ch in s if ch in " \t\r\n")
        if ws / len(s) < 0.02:
            continue
        ok = sum(
            1 for ch in s if ch.isalnum() or ch in " \t\r\n" or 32 < ord(ch) < 127
        )
        score = ok / len(s)
        if score >= 0.9 and score > best_score:
            best, best_score = name, score
    return best


# juniversalchardet EscCharsetProber envelope: each escaped charset
# announces itself with a designator escape sequence (or HZ's ~{
# shift); the reference's detector returns as soon as one state
# machine reaches ItsMe (CharsetDetector.java:33-124 delegates to the
# library, whose EscCharsetProber runs these four machines).
_ESC_SIGNATURES = [
    ("ISO-2022-KR", (b"\x1b$)C",)),
    ("ISO-2022-CN", (b"\x1b$)A", b"\x1b$)G", b"\x1b$*H")),
    ("ISO-2022-JP", (b"\x1b$B", b"\x1b$@", b"\x1b(J", b"\x1b$(D")),
    ("HZ-GB-2312", (b"~{",)),
]


def _probe_escaped(data: bytes) -> Optional[str]:
    """ISO-2022-JP/KR/CN and HZ-GB-2312 by designator signature.

    Gate: these encodings are pure 7-bit streams (that is the point of
    escaped encodings), so any stream with >2% high bytes is never one
    of them; within the gate the first matching designator wins, in
    the same specificity order as the reference's parallel state
    machines. MUST run before the UTF-8 validator — an ISO-2022 stream
    is byte-wise valid (7-bit) UTF-8, so the validator would claim
    it."""
    n = len(data)
    if n < 4:
        return None
    has_esc = b"\x1b" in data
    if not has_esc and b"~{" not in data:
        return None
    if sum(1 for b in data[:4096] if b > 0x7F) / min(n, 4096) > 0.02:
        return None
    for name, sigs in _ESC_SIGNATURES:
        if name == "HZ-GB-2312" and has_esc:
            continue  # real HZ text has no ESC designators
        if any(s in data for s in sigs):
            return name
    return None


def _guess_statistical(content: bytes) -> str:
    """guessEncodingByMozilla equivalent: escaped-charset designator
    probe, null-pattern UTF-16/32 probe, UTF-8 state machine, then the
    single-byte prober group; None-equivalent (pure ASCII / nothing
    confident) falls back to UTF-8."""
    data = bytes(content)
    esc = _probe_escaped(data)
    if esc is not None:
        return esc
    wide = _probe_utf1632(data)
    if wide is not None:
        return wide
    valid_utf8, n_multi = _utf8_scan(data)
    if valid_utf8:
        # pure ASCII detects nothing (juniversalchardet returns null)
        return "UTF-8"
    mb_name, mb_conf = _probe_mbcs(data)
    best_name, best_conf = None, 0.0
    for name, codec, frequent, alphabet in _SBCS_PROBERS:
        try:
            decoded = data.decode(codec, errors="replace")
        except LookupError:  # pragma: no cover
            continue
        latin = name == "WINDOWS-1252"
        conf = _sbcs_score(decoded, frequent, alphabet, latin=latin)
        if latin:
            conf *= _LATIN1_DISCOUNT
        if conf > best_conf:
            best_name, best_conf = name, conf
    # pick the most confident prober across both groups, each gated by
    # its own floor (juniversalchardet returns the max-confidence probe)
    mb_ok = mb_name is not None and mb_conf >= _MBCS_MIN_CONFIDENCE
    sb_ok = best_name is not None and best_conf >= _SBCS_MIN_CONFIDENCE
    if mb_ok and (not sb_ok or mb_conf >= best_conf):
        return mb_name
    if sb_ok:
        return best_name
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
