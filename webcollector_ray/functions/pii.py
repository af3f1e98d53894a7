"""PII scrubbing for training-data pipelines.

A 100 TB web-text corpus must be scrubbed of emails / phone numbers /
IP addresses before training. This stage is map-only (no shuffle):
one pass of vectorized RE2 kernels per batch. pyarrow.compute's
regex functions and DuckDB's regexp_* are BOTH RE2, so the operator
is value-exact against a SQL oracle — the leftmost-longest,
non-overlapping global-replace semantics agree bit for bit.

Scrub order is fixed (email -> ip -> phone) and each count is taken
on the text as it stands BEFORE that pattern's own scrub, so an
octet run inside an already-scrubbed token can never double-count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible (no backrefs / lookaround) — keep these identical to
# the SQL oracle strings in __ray_entry__.py.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# country/area prefix OPTIONAL: plain '555-123-4567' / '(555) 123-4567'
# are the most common real-world forms and must redact too (ADVICE r2)
PHONE_RE = r"(\+?[0-9]{1,2}[ \-.]?)?\(?[0-9]{3}\)?[ \-.][0-9]{3}[ \-.][0-9]{4}"

# (output-count column, pattern, replacement token), applied in order
PII_RULES = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ips", IP_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
]


def pii_scrub_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "text"
) -> pa.Table:
    """Count and redact each PII class; fully vectorized (three RE2
    count passes + three RE2 replace passes, no Python per row).
    Appends one int64 count column per rule and writes the scrubbed
    text to `out_col` (replacing `text_col` when they are the same
    name)."""
    text = batch[text_col]
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[name] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
    for name, col in counts.items():
        batch = batch.append_column(name, col)
    if out_col in batch.column_names:
        batch = batch.set_column(
            batch.column_names.index(out_col), out_col, text
        )
    else:
        batch = batch.append_column(out_col, text)
    return batch
