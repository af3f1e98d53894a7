"""Dedup-at-scale probe: refresh BASELINE's round-2 100k/1M-doc dedup
numbers at the current engine (the signature kernel, band/candidate
scans, CC star-contraction and verify attach have all been rewritten
since round 2 — the committed numbers predate every one of those).

Synthesizes N docs shard-parallel (deterministic LCG word streams, ~1%
planted near-duplicate rate: every 100th doc is a copy of its
predecessor with one word changed), then times exact_dedup,
minhash_dedup_pairs, cluster_pairs_minlabel over the found pairs, and
simhash_dedup_pairs. Prints one JSON line with walls, outputs and
/proc/stat steal.

Usage: python tools/probe_dedup_scale.py [--docs 1000000]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def synth_docs(n: int, words_per_doc: int = 100, shards: int = 32):
    """ray.data Dataset of n docs built INSIDE tasks (shard-parallel,
    nothing driver-side): doc i's words come from an LCG stream seeded
    by i; every 100th doc repeats doc i-1's stream with one word
    swapped — a planted near-dup the banded minhash must find."""
    import ray
    import ray.data as rd

    per = n // shards

    def build(batch: pa.Table) -> pa.Table:
        s = int(batch["shard"][0].as_py())
        base = s * per
        ids, texts = [], []
        for i in range(base, base + per):
            seed = i - 1 if (i % 100 == 99 and i > base) else i
            x = (seed * 6364136223846793005 + 1442695040888963407) \
                & 0xFFFFFFFFFFFFFFFF
            ws = []
            for _ in range(words_per_doc):
                x = (x * 6364136223846793005 + 1442695040888963407) \
                    & 0xFFFFFFFFFFFFFFFF
                ws.append(f"w{(x >> 33) % 5000}")
            if seed != i:
                ws[37] = f"x{i % 97}"  # the one-word edit
            ids.append(i)
            texts.append(" ".join(ws))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return rd.from_items(
        [{"shard": s} for s in range(shards)]
    ).repartition(shards).map_batches(
        build, batch_format="pyarrow", batch_size=None
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus,
            include_dashboard=False, log_to_driver=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webcollector_ray.functions.dedup import (
        cluster_pairs_minlabel,
        exact_dedup,
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    n = args.docs
    t0 = time.time()
    docs = synth_docs(n).materialize()
    synth_s = round(time.time() - t0, 3)

    out = {
        "probe": "dedup_scale", "docs": n, "num_cpus": args.cpus,
        "synth_s": synth_s, "ops": {},
    }

    def run(name, fn, consume="count"):
        s0, t0 = steal(), time.time()
        res = fn()
        val = res.count() if consume == "count" else res
        dt = time.time() - t0
        sj = steal() - s0
        out["ops"][name] = {
            "secs": round(dt, 3), "rows_out": int(val),
            "docs_per_s": round(n / dt),
            "steal_jiffies": sj,
            "steal_ratio": round(sj / (dt * 100 * args.cpus), 5),
        }
        return res

    run("exact_dedup", lambda: exact_dedup(docs))
    pairs = run(
        "minhash_pairs",
        lambda: minhash_dedup_pairs(docs).materialize(),
    )
    run("cc_minlabel", lambda: cluster_pairs_minlabel(pairs))
    run("simhash_pairs", lambda: simhash_dedup_pairs(docs))

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
