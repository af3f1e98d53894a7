"""AllPairs exact-Jaccard join probe far beyond sf0.1, at two sizes,
to pin the prefix-filter shape question.

A naive all-pairs scheme grows 4x in work when docs double; prefix
filtering must grow ~linearly: candidate crosses are bounded by
per-gram prefix-group sizes (rarest-first ordering), and the verify
set scales with the genuine near-dup plant rate (~2%), not the corpus
square. Same deterministic xorshift word-stream corpus family as the
editdist probe, with whole-doc near-dup plants (word substitution /
trailing extension) that land above the 0.8 Jaccard threshold.

Prints one JSON line with wall-times at both sizes, pair counts, the
wall growth ratio, and /proc/stat steal so the capture is honest
about contention.

Usage: python tools/probe_allpairs_scale.py [--docs 50000]
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
    """Deterministic corpus: 40-word xorshift streams over a 50k-word
    vocabulary (real webtext's trigram universe scales with the
    corpus; a toy 20-word vocab collapses it to ~8k grams, which is
    the documented degenerate input for ANY exact prefix filter —
    prefix groups then grow with N and candidate generation turns
    quadratic, as an early revision of this probe demonstrated at 2x
    docs -> 3.9x wall). ~2% of docs are a near-dup of a recent doc
    (one word swapped, or two words appended) — trigram Jaccard
    ~0.85-0.95, above the 0.8 cut."""
    texts = []

    def xorshift():
        x = 88172645463325252
        while True:
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            yield x

    it = xorshift()
    for i in range(n):
        if i and next(it) % 50 == 0:
            src = texts[i - 1 - (next(it) % min(i, 50))].split()
            if next(it) % 2 == 0:
                pos = next(it) % len(src)
                src[pos] = "XSUB"
                texts.append(" ".join(src))
            else:
                texts.append(" ".join(src) + " xtail ytail")
        else:
            texts.append(
                " ".join(f"w{next(it) % 50000}" for _ in range(40))
            )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    from webcollector_ray.functions.dedup import allpairs_jaccard_pairs

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, log_to_driver=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out = {"metric": "allpairs_scale", "unit": "sec",
           "num_cpus": args.cpus, "threshold": args.threshold,
           "sizes": {}}
    for n in (args.docs, args.docs * 2):
        t = synth_docs(n)
        ds = rd.from_arrow(t).repartition(max(8, args.cpus)).materialize()
        s0 = steal()
        t0 = time.time()
        pairs = allpairs_jaccard_pairs(
            ds, threshold=args.threshold, num_buckets=64
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
