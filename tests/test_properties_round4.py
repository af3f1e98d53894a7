"""Random-input property tests (hypothesis) for round-4 operators vs
in-process brute-force references — the merge/joins property-test
precedent. Few examples per property (each example runs a Ray
pipeline); determinism does the rest."""
import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                     # user
        st.integers(0, 3_600_000),             # offset seconds
    ),
    min_size=1, max_size=60,
)


@settings(**_SETTINGS)
@given(events_strategy)
def test_user_gap_median_matches_reference(ray_session, rows):
    from webcollector_ray.functions.windows import user_gap_median

    base = dt.datetime(2024, 1, 1)
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array(
            [base + dt.timedelta(seconds=s) for _, s in rows],
            pa.timestamp("us"),
        ),
    })
    gdf = user_gap_median(rd.from_arrow(t), num_buckets=3).to_pandas()
    # reference
    df = t.to_pandas()
    ref = {}
    for u, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].astype("datetime64[us]").astype("int64"))
        gaps = np.sort(np.diff(ts))
        if len(gaps):
            ref[u] = (len(gaps), int(gaps[(len(gaps) - 1) // 2]))
    if not len(gdf):
        # Ray's to_pandas drops columns on an all-empty result
        assert not ref
        return
    got = gdf.set_index("user_id").sort_index()
    assert sorted(got.index) == sorted(ref)
    for u, (n, med) in ref.items():
        assert got.loc[u, "n_gaps"] == n
        assert got.loc[u, "median_gap_us"] == med


@settings(**_SETTINGS)
@given(events_strategy)
def test_spike_windows_matches_reference(ray_session, rows):
    from webcollector_ray.functions.windows import spike_windows

    base = dt.datetime(2024, 1, 1)
    t = pa.table({
        "event_type": pa.array(
            [f"t{u % 2}" for u, _ in rows], pa.string()
        ),
        "ts": pa.array(
            [base + dt.timedelta(seconds=s) for _, s in rows],
            pa.timestamp("us"),
        ),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    got = {
        (r["event_type"], int(r["window_start"]))
        for _, r in spike_windows(
            rd.from_arrow(t), key_col="event_type", window_sec=600,
            factor=2, num_buckets=3,
        ).to_pandas().iterrows()
    }
    df = t.to_pandas()
    df["w"] = (
        df["ts"].astype("datetime64[us]").astype("int64")
        // (600 * 1_000_000) * 600
    )
    ref = set()
    for k, g in df.groupby("event_type"):
        counts = g.groupby("w").size()
        tn, nw = int(counts.sum()), len(counts)
        for w, n in counts.items():
            if int(n) * nw > 2 * tn:
                ref.add((k, int(w)))
    assert got == ref


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 12), min_size=0, max_size=40))
def test_length_percentile_matches_reference(ray_session, lens):
    from webcollector_ray.functions.textstats import length_percentile

    t = pa.table({
        "doc_id": pa.array(list(range(len(lens))), pa.int64()),
        "text": pa.array(
            [" ".join(["w"] * n) for n in lens], pa.string()
        ),
    })
    gdf = length_percentile(rd.from_arrow(t)).to_pandas()
    if not len(gdf):
        assert not lens
        return
    got = gdf.set_index("doc_id").sort_index()
    arr = np.array(lens, dtype=np.int64)
    for i, n in enumerate(lens):
        nb = int((arr < n).sum())
        assert got.loc[i, "n_tokens"] == n
        assert got.loc[i, "n_below"] == nb
        assert got.loc[i, "pct"] == nb / max(1, len(arr))
