"""Edit-distance similarity join (functions/dedup.py PassJoin path)."""

import random

import pandas as pd
import pyarrow as pa
import ray.data as rd

from webcollector_ray.functions.dedup import editdist_pairs, levenshtein


def _ref_lev(a: str, b: str) -> int:
    # textbook quadratic DP, the independent reference
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_levenshtein_matches_reference_dp():
    rng = random.Random(11)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("kitten", "sitting"), ("flaw", "lawn"), ("ab", "ba")]
    for _ in range(200):
        a = "".join(rng.choices("abcx ", k=rng.randint(0, 15)))
        b = "".join(rng.choices("abcx ", k=rng.randint(0, 15)))
        cases.append((a, b))
    for a, b in cases:
        assert levenshtein(a, b) == _ref_lev(a, b), (a, b)


def _brute_pairs(df, prefix_len, k):
    out = set()
    rows = list(df.itertuples(index=False))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a.lang != b.lang:
                continue
            d = _ref_lev(a.text[:prefix_len], b.text[:prefix_len])
            if d <= k:
                out.add(
                    (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id), d)
                )
    return out


def test_editdist_pairs_matches_bruteforce(ray_session):
    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "omega", "kappa"]
    texts, ids, langs = [], [], []
    base = []
    for i in range(40):
        t = " ".join(rng.choices(words, k=8))
        base.append(t)
        texts.append(t)
        ids.append(i)
        langs.append("en" if i % 2 else "de")
    # planted near-dups: substitution, deletion (length change), insert
    mut = [
        (base[0][:10] + "X" + base[0][11:], 100, "de"),  # 1 sub
        (base[1][:7] + base[1][8:], 101, "en"),          # 1 del
        (base[2][:5] + "zz" + base[2][5:], 102, "en"),   # 2 ins
        (base[3], 103, "de"),                             # exact dup prefix
    ]
    for t, i, lg in mut:
        texts.append(t)
        ids.append(i)
        langs.append(lg)
    df = pd.DataFrame({"doc_id": ids, "text": texts, "lang": langs})
    got = (
        editdist_pairs(
            rd.from_pandas(df).repartition(5),
            prefix_len=24, max_dist=2, num_buckets=8,
        )
        .to_pandas()
    )
    got_set = set(
        (int(r.id_a), int(r.id_b), int(r.dist))
        for r in got.itertuples(index=False)
    )
    assert got_set == _brute_pairs(df, 24, 2)
    assert len(got) == len(got_set)  # no duplicate pair rows


def test_editdist_pairs_bucketed_join_path_matches_broadcast(ray_session):
    # force the bucketed text-attach path with broadcast_limit=0 and
    # pin it to the broadcast path's output
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["hello world", "hello w0rld", "hello", "help"],
            "lang": ["en"] * 4,
        }
    )
    a = (
        editdist_pairs(
            rd.from_pandas(df), prefix_len=16, max_dist=2, num_buckets=4
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    b = (
        editdist_pairs(
            rd.from_pandas(df), prefix_len=16, max_dist=2, num_buckets=4,
            broadcast_limit=0,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert {(1, 2), (3, 4)} <= set(zip(a.id_a, a.id_b))


def test_pair_key_separator_is_pandas_groupby_safe():
    # pandas 2.x object-string hashtables (groupby/unique/factorize)
    # compare C-strings and stop at NUL: "a\x00b" and "a\x00c" collapse
    # into ONE group. The candidate-key separator must not do that.
    import pandas as pd

    nul = pd.DataFrame({"k": ["a\x00b", "a\x00c"], "v": [1, 2]})
    assert nul.groupby("k")["v"].count().size == 1  # the pitfall
    us = pd.DataFrame({"k": ["a\x1fb", "a\x1fc"], "v": [1, 2]})
    assert us.groupby("k")["v"].count().size == 2  # the fix holds
