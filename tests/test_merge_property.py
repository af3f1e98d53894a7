"""Property-based conformance: the distributed merge equals the
dict-based reference semantics (fetch overwrites, crawldb keeps, link
insert-if-absent; deterministic min-status tie-break within a source)
on arbitrary inputs.

execute_count is derived from status so rows with equal sort rank are
fully identical — the engine's tie-break only pins (url, meta, status),
and this model must not depend on which identical row survives.
"""

from hypothesis import given, settings, strategies as st

import ray.data as rd

from webcollector_ray.model import CrawlDatum, datums_to_table
from webcollector_ray.stages.merge import merge_segments

_key = st.integers(min_value=0, max_value=12).map(lambda i: f"http://h/{i}")
_rows = st.lists(st.tuples(_key, st.integers(0, 5)), max_size=12)


def _count(status: int) -> int:
    return (status * 7) % 5


def _first_by_key(rows):
    """min-status-per-key (the engine's within-source tie-break when
    url/meta are equal)."""
    best = {}
    for k, s in sorted(rows):
        best.setdefault(k, s)
    return best


def _expected(crawldb, fetch, link):
    db = _first_by_key(crawldb)
    db.update(_first_by_key(fetch))          # fetch overwrites
    for k, s in _first_by_key(link).items():  # link insert-if-absent
        db.setdefault(k, s)
    return {k: (s, _count(s)) for k, s in db.items()}


@settings(max_examples=15, deadline=None)
@given(_rows, _rows, _rows)
def test_merge_matches_reference_dict_model(ray_session, crawldb, fetch, link):
    def ds_of(rows):
        if not rows:
            return None
        return datums_to_table(
            [
                CrawlDatum(k, status=s, execute_time=0, execute_count=_count(s))
                for k, s in rows
            ]
        )

    tables = [ds_of(crawldb), ds_of(fetch), ds_of(link)]
    if all(t is None for t in tables):
        return
    dsets = [rd.from_arrow(t) if t is not None else None for t in tables]
    out = merge_segments(dsets[0], dsets[1], dsets[2], num_buckets=4).to_pandas()
    got = {
        r["key"]: (int(r["status"]), int(r["execute_count"]))
        for _, r in out.iterrows()
    }
    assert got == _expected(crawldb, fetch, link)
