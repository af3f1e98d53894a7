"""Edit-distance join probe: editdist_pairs far beyond sf0.1's 5,000
documents, at two sizes, to pin the SUB-QUADRATIC shape question.

A quadratic same-group join would grow 4x in work when docs double;
the PassJoin candidate scheme must grow ~linearly (constant keys per
string, candidate crosses bounded by genuine near-dup density). The
corpus is a deterministic word stream with ~1% planted near-dup pairs
(substitution / deletion / insertion at the prefix) so the verify set
scales with the plant rate, not the corpus square.

Prints one JSON line with wall-times at both sizes, pair counts, the
wall growth ratio, and /proc/stat steal so the capture is honest about
contention.

Usage: python tools/probe_editdist_scale.py [--docs 50000]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")

WORDS = [
    "alpha", "beta", "gamma", "delta", "omega", "kappa", "sigma",
    "theta", "lambda", "epsilon", "zeta", "iota", "rho", "tau", "phi",
    "chi", "psi", "mu", "nu", "xi",
]


def synth_docs(n: int) -> pa.Table:
    """Deterministic corpus: LCG-strided word streams, ~1% of docs are
    a near-dup of an earlier doc (one substitution, one deletion, or a
    two-char insertion inside the 64-char prefix)."""
    texts, langs = [], []
    langs_pool = ["en", "de", "fr", "es", "zh"]

    def xorshift():
        x = 88172645463325252
        while True:
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            yield x

    it = xorshift()
    for i in range(n):
        ws = [WORDS[next(it) % len(WORDS)] for _ in range(14)]
        t = " ".join(ws)
        if i and next(it) % 100 == 0:
            # mutate a recent doc instead of a fresh stream
            src = texts[i - 1 - (next(it) % min(i, 50))]
            mode = next(it) % 3
            pos = 5 + next(it) % 40
            if mode == 0:
                t = src[:pos] + "X" + src[pos + 1:]
            elif mode == 1:
                t = src[:pos] + src[pos + 1:]
            else:
                t = src[:pos] + "zz" + src[pos:]
        else:
            next(it)
            next(it)
            next(it)
        texts.append(t)
        langs.append(langs_pool[next(it) % len(langs_pool)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    from webcollector_ray.functions.dedup import editdist_pairs

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, log_to_driver=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out = {"metric": "editdist_scale", "unit": "sec",
           "num_cpus": args.cpus, "sizes": {}}
    for n in (args.docs, args.docs * 2):
        t = synth_docs(n)
        ds = rd.from_arrow(t).repartition(max(8, args.cpus)).materialize()
        s0 = steal()
        t0 = time.time()
        pairs = editdist_pairs(
            ds, prefix_len=64, max_dist=2, num_buckets=64
        ).to_pandas()
        wall = time.time() - t0
        out["sizes"][str(n)] = {
            "wall_s": round(wall, 2),
            "pairs": int(len(pairs)),
            "docs_per_s": round(n / wall, 1),
            "steal_jiffies": steal() - s0,
        }
    a, b = (out["sizes"][str(args.docs)],
            out["sizes"][str(args.docs * 2)])
    out["wall_growth_2x_docs"] = round(b["wall_s"] / a["wall_s"], 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
