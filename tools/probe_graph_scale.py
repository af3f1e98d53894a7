"""Large-graph probe: pagerank / HITS / k-core on a 1M+-edge synthetic
link graph (VERDICT r4 stretch item 7 — the round-2 "10x protocol"
applied to the round-4 graph family).

Synthesizes a deterministic skewed web graph far beyond sf0.1's 80-node
crawl graph, runs each operator on the shared node-hash bucket layout
at num_buckets=32, and prints one JSON line with wall-times, row
counts and /proc/stat steal so the capture is honest about contention.
The point is the SHAPE question: the two-task-waves-per-iteration
design must not blow up when node and edge counts grow 10,000x — the
per-wave task count stays 2 x num_buckets regardless of graph size.

Usage: python tools/probe_graph_scale.py [--nodes 150000] [--fanout 7]
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


def synth_edges(n_nodes: int, fanout: int) -> pa.Table:
    """Deterministic skewed digraph: every node links to `fanout`
    pseudo-random targets (LCG stride, so reproducible with no RNG
    state) plus one hub link into a 1,000-node core — the hub column
    gives the hot-key skew a crawl graph has (popular sites), which is
    exactly what the bucket exchanges must absorb."""
    src_idx = np.repeat(np.arange(n_nodes, dtype=np.int64), fanout + 1)
    js = np.tile(np.arange(fanout + 1, dtype=np.int64), n_nodes)
    dst_idx = (src_idx * 16807 + js * 48271 + 12345) % n_nodes
    hub = js == fanout
    dst_idx[hub] = (src_idx[hub] * 31) % 1000  # hot hubs
    fmt = np.vectorize(
        lambda i: f"http://h{i % 5000}.test/p{i}", otypes=[object]
    )
    return pa.table(
        {
            "src": pa.array(fmt(src_idx), pa.string()),
            "dst": pa.array(fmt(dst_idx), pa.string()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=150_000)
    ap.add_argument("--fanout", type=int, default=7)
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

    from webcollector_ray.functions.graph import (
        degree_histogram,
        hits_fixed,
        kcore_peel,
        label_propagation,
        pagerank_fixed,
        ra_link_prediction,
    )

    t_synth0 = time.time()
    edges_tbl = synth_edges(args.nodes, args.fanout)
    n_edges = len(edges_tbl)
    synth_s = round(time.time() - t_synth0, 3)

    # warmup: spawn workers / import graph module in tasks, untimed
    pagerank_fixed(
        rd.from_arrow(edges_tbl.slice(0, 2000)), iters=1, num_buckets=4
    ).to_pandas()

    out = {
        "probe": "graph_scale",
        "n_nodes": args.nodes,
        "n_edges": n_edges,
        "num_cpus": args.cpus,
        "synth_s": synth_s,
        "ops": {},
    }
    ops = [
        ("pagerank_3it", lambda ds: pagerank_fixed(
            ds, iters=3, num_buckets=32)),
        ("hits_2it", lambda ds: hits_fixed(ds, iters=2, num_buckets=32)),
        ("kcore_k3_3r", lambda ds: kcore_peel(
            ds, k=3, rounds=3, num_buckets=32)),
        ("degree_hist", lambda ds: degree_histogram(ds, num_buckets=32)),
        ("lpa_3it", lambda ds: label_propagation(
            ds, iters=3, num_buckets=32)),
        # RA with the hub knob ON (max_center_degree=64): the 1,000
        # hot-core centers (undirected degree ~n/1000) would each emit
        # deg^2/2 wedges — the knob drops them, which is exactly its
        # documented at-scale role; regular centers stay exact
        ("ra_top50_hubcap64", lambda ds: ra_link_prediction(
            ds, k=50, num_buckets=32, max_center_degree=64)),
    ]
    for name, fn in ops:
        ds = rd.from_arrow(edges_tbl)
        s0, t0 = steal(), time.time()
        res = fn(ds).to_pandas()
        dt = time.time() - t0
        sj = steal() - s0
        out["ops"][name] = {
            "secs": round(dt, 3),
            "rows": len(res),
            "edges_per_s": round(n_edges / dt),
            "steal_jiffies": sj,
            "steal_ratio": round(sj / (dt * 100 * args.cpus), 5),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
