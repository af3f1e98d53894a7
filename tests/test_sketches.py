"""Sketch / sampling operators (functions/sketches.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from webcollector_ray.functions.sketches import (
    approx_distinct_hll,
    quantiles_by_key,
    stratified_sample,
    vocab_top_words,
)


def test_hll_estimate_accuracy(ray_session):
    # 5000 distinct ids, each appearing twice -> estimate ~5000
    ids = list(range(5000)) * 2
    ds = rd.from_arrow(pa.table({"uid": pa.array(ids, pa.int64())}))
    out = approx_distinct_hll(ds, "uid", p=12)
    est = float(out["estimate"][0])
    assert abs(est - 5000) / 5000 < 0.05
    assert int(out["nonzero_registers"][0]) > 1000


def test_hll_deterministic_and_order_free(ray_session):
    ids = [f"u{i}" for i in range(777)]
    a = approx_distinct_hll(
        rd.from_arrow(pa.table({"u": ids})), "u"
    )
    b = approx_distinct_hll(
        rd.from_arrow(pa.table({"u": ids[::-1]})).repartition(7), "u"
    )
    assert a["estimate"][0] == b["estimate"][0]
    assert a["register_sum"][0] == b["register_sum"][0]


def test_quantiles_by_key_matches_numpy(ray_session):
    rng = np.random.RandomState(3)
    keys = ["a"] * 100 + ["b"] * 57
    vals = rng.randn(157)
    ds = rd.from_arrow(
        pa.table({"k": keys, "v": pa.array(vals, pa.float64())})
    ).repartition(5)
    out = quantiles_by_key(ds, key_col="k", value_col="v").to_pandas()
    out = out.set_index("k").sort_index()
    for key, n0, n1 in (("a", 0, 100), ("b", 100, 157)):
        sub = vals[n0:n1]
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert out.loc[key, col] == round(
                float(np.quantile(sub, q, method="linear")), 6
            )


def test_quantiles_by_key_int_keys(ray_session):
    # key dtype must survive the exchange (regression: output was
    # hardcoded string, crashing on int64 keys)
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([7, 7, 7, 42], pa.int64()),
                "v": pa.array([1.0, 2.0, 3.0, 10.0], pa.float64()),
            }
        )
    ).repartition(2)
    out = quantiles_by_key(ds, key_col="k", value_col="v").to_pandas()
    out = out.set_index("k").sort_index()
    assert out.index.dtype == np.int64
    assert out.loc[7, "p50"] == 2.0
    assert out.loc[42, "p50"] == 10.0


def test_vocab_top_words(ray_session):
    texts = ["the cat sat", "the dog", "THE the cat", None, "  "]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    out = vocab_top_words(ds, text_col="text", n=3).to_pandas()
    got = list(zip(out["word"], out["n"]))
    assert got == [("the", 4), ("cat", 2), ("dog", 1)]


def test_stratified_sample_deterministic_k_per_stratum(ray_session):
    df = pd.DataFrame(
        {
            "lang": ["en"] * 50 + ["de"] * 30 + ["fr"] * 2,
            "doc_id": list(range(82)),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    a = stratified_sample(ds, strata_col="lang", id_col="doc_id", k=5)
    b = stratified_sample(
        rd.from_pandas(df.iloc[::-1]), strata_col="lang", id_col="doc_id", k=5
    )
    assert a.groupby("lang").size().to_dict() == {"de": 5, "en": 5, "fr": 2}
    pd.testing.assert_frame_equal(a, b)


def test_quantiles_sketch_partition_invariant_and_bounded_error(ray_session):
    from webcollector_ray.functions.sketches import quantiles_sketch_by_key

    rng = np.random.RandomState(7)
    keys = np.where(rng.rand(4000) < 0.7, "hot", "cold")
    vals = rng.randn(4000) * 10
    t = pa.table({"k": pa.array(keys.tolist(), pa.string()),
                  "v": pa.array(vals, pa.float64())})
    a = quantiles_sketch_by_key(
        rd.from_arrow(t).repartition(3), key_col="k", value_col="v"
    ).to_pandas().sort_values("k").reset_index(drop=True)
    b = quantiles_sketch_by_key(
        rd.from_arrow(t).repartition(11), key_col="k", value_col="v"
    ).to_pandas().sort_values("k").reset_index(drop=True)
    # integer bin counts merge order-free -> identical across layouts
    assert a.equals(b)
    binw = (vals.max() - vals.min()) / 256
    for key in ("hot", "cold"):
        sub = vals[keys == key]
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            exact = float(np.quantile(sub, q))
            est = float(a.set_index("k").loc[key, col])
            assert abs(est - exact) <= 2 * binw


def test_kmv_exact_below_k_and_estimator_above(ray_session):
    from webcollector_ray.functions.sketches import (
        _md5le64,
        kmv_distinct_by_key,
    )

    # "small": 10 distinct users (< k=16) -> exact; "big": 500 distinct
    small = pd.DataFrame({"k": "small", "u": [i % 10 for i in range(200)]})
    big = pd.DataFrame({"k": "big", "u": range(500)})
    df = pd.concat([small, big], ignore_index=True)
    out = (
        kmv_distinct_by_key(
            rd.from_pandas(df).repartition(7), key_col="k", col="u", k=16
        )
        .to_pandas()
        .set_index("k")
    )
    assert out.loc["small", "n_hashes"] == 10
    assert out.loc["small", "estimate"] == 10.0
    # reference: bottom-16 of all distinct hashes computed directly
    h = np.unique(
        np.array([_md5le64(str(u)) for u in range(500)], dtype=np.uint64)
    )
    ref = 15.0 / (float(h[15]) / float(2**64))
    assert out.loc["big", "n_hashes"] == 16
    assert out.loc["big", "estimate"] == ref
    # 1/sqrt(k-2) relative error bound, generous factor
    assert abs(ref - 500) / 500 < 3 / np.sqrt(14)


def test_kmv_partition_invariant(ray_session):
    from webcollector_ray.functions.sketches import kmv_distinct_by_key

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": np.where(rng.rand(3000) < 0.5, "a", "b"),
            "u": rng.randint(0, 800, 3000),
        }
    )
    a = (
        kmv_distinct_by_key(
            rd.from_pandas(df).repartition(2), key_col="k", col="u", k=32
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        kmv_distinct_by_key(
            rd.from_pandas(df.iloc[::-1]).repartition(13),
            key_col="k",
            col="u",
            k=32,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
