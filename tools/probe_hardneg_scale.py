"""Hard-negative-mining probe at 100x the sf0.1 embeddings table
(round-5 probe protocol): 50k deterministic vectors, exact per-anchor
cross-label top-k.

The SHAPE question: chunk-pair tasks grow as K^2/2 with K = N /
target_chunk_rows while each task's working set stays two chunks + a
strip slab, and the reduce moves only O(k) rows per (anchor, chunk) —
so wall should track the O(N^2 d) matmul flops spread over the pool,
not the reduce. Prints one JSON line with /proc/stat steal embedded.

Usage: python tools/probe_hardneg_scale.py [--rows 50000] [--dim 32]
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


def synth_embeddings(n: int, d: int, n_labels: int = 20) -> pa.Table:
    """Deterministic LCG embeddings with label-correlated structure:
    each label owns a direction; vectors = label direction + LCG
    noise, so cross-label near-neighbors exist (the mining target)."""
    idx = np.arange(n, dtype=np.int64)
    lab = (idx * 16807 % n_labels).astype(np.int32)
    # LCG stream reshaped to (n, d), centered to [-0.5, 0.5)
    seq = (idx[:, None] * np.int64(d) + np.arange(d, dtype=np.int64))
    noise = ((seq * 48271 + 12345) % 100003) / 100003.0 - 0.5
    dirs = ((np.arange(n_labels)[:, None] * np.int64(d)
             + np.arange(d, dtype=np.int64)) * 69621 % 99991) / 99991.0
    m = (dirs[lab] + 0.8 * noise).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(idx, pa.int64()),
            "embedding": pa.array(
                list(m), pa.list_(pa.float32(), d)
            ),
            "label": pa.array(lab, pa.int32()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=4096)
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

    from webcollector_ray.functions.similarity import hard_negatives

    t0 = time.time()
    tbl = synth_embeddings(args.rows, args.dim)
    synth_s = round(time.time() - t0, 3)

    # warmup, untimed
    hard_negatives(
        rd.from_arrow(tbl.slice(0, 1000)), k=args.k,
        target_chunk_rows=256,
    ).to_pandas()

    ds = rd.from_arrow(tbl)
    s0, w0 = steal(), time.time()
    res = hard_negatives(
        ds, k=args.k, target_chunk_rows=args.chunk,
    ).to_pandas()
    dt = time.time() - w0
    sj = steal() - s0
    n_chunks = -(-args.rows // args.chunk)
    print(json.dumps({
        "probe": "hardneg_scale",
        "rows": args.rows,
        "dim": args.dim,
        "k": args.k,
        "chunk_rows": args.chunk,
        "n_chunk_pairs": n_chunks * (n_chunks + 1) // 2,
        "num_cpus": args.cpus,
        "synth_s": synth_s,
        "secs": round(dt, 3),
        "out_rows": len(res),
        "pairs_per_s": round(args.rows * args.rows / dt),
        "steal_jiffies": sj,
        "steal_ratio": round(sj / (dt * 100 * args.cpus), 5),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
