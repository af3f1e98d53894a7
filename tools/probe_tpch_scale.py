"""TPC-H-family scale probe: the heaviest members of the repo's
15-query TPC-H suite on a synthetic warehouse 10x sf0.1's volumes
(the round-2 "10x protocol" applied to the round-5 join/aggregate
family).

Synthesizes a deterministic TPC-H-shaped warehouse (same column names
and types as /root/testdata, LCG-derived values, shard-parallel
writes), then times tpch_q1 / q6 / q7 / q13 / q17 / q18 from
__ray_entry__ against it at a chosen row multiplier. The SHAPE
question: every query pre-aggregates fixed-point partials inside
map_batches before its exchanges, so 10x rows must cost well under
10x wall (the exchanges move order/supplier partials, never line
items).

Usage: python tools/probe_tpch_scale.py [--mult 10] [--cpus 32]
  --mult 1 ~= sf0.1 volumes (600k lineitem / 150k orders)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

N_NATIONS = 25
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
ADJS = ["small", "red", "blue", "hot", "green"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
FLAGS = ["A", "N", "R"]
EPOCH = np.datetime64("1995-01-01")
DAY_SPAN = 2400  # ~6.5 years of order dates


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _lcg(x: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-row pseudo-random uint64 stream."""
    v = (x.astype(np.uint64) + np.uint64(salt)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    v ^= v >> np.uint64(29)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(32)
    return v


def _pick(choices, idx_u64: np.ndarray) -> list:
    """np.take with uint64 indices (numpy refuses the unsafe cast)."""
    return np.take(np.asarray(choices), idx_u64.astype(np.int64)).tolist()


def synth_shard(out_dir: str, table: str, shard: int, lo: int, hi: int,
                n_cust: int, n_supp: int, n_part: int,
                lines_per_order: int) -> str:
    """One shard of one table — runs as a Ray task so generation is
    parallel and no single process holds the 10x warehouse."""
    idx = np.arange(lo, hi, dtype=np.int64)
    if table == "orders":
        r = _lcg(idx, 1)
        t = pa.table(
            {
                "o_orderkey": pa.array(idx),
                "o_custkey": pa.array(
                    (r % np.uint64(n_cust)).astype(np.int64)
                ),
                "o_orderstatus": pa.array(
                    _pick(FLAGS, (r >> np.uint64(8))
                            % np.uint64(3)), pa.string()
                ),
                "o_totalprice": pa.array(
                    ((r >> np.uint64(16)) % np.uint64(50_000_000)
                     ).astype(np.float64) / 100.0
                ),
                "o_orderdate": pa.array(
                    EPOCH + ((r >> np.uint64(24)) % np.uint64(DAY_SPAN)
                             ).astype("timedelta64[D]")
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    _pick(PRIORITIES, (r >> np.uint64(40))
                            % np.uint64(5)), pa.string()
                ),
            }
        )
    elif table == "lineitem":
        # lines attach to order block [lo/L, hi/L)
        okeys = np.repeat(idx // lines_per_order, 1)
        r = _lcg(idx, 2)
        ro = _lcg(okeys, 1)  # the owning order's stream (for shipdate)
        odate_days = (ro >> np.uint64(24)) % np.uint64(DAY_SPAN)
        ship_days = odate_days + np.uint64(1) + (
            r % np.uint64(120)
        )  # always after the order date
        t = pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "l_partkey": pa.array(
                    (r % np.uint64(n_part)).astype(np.int64)
                ),
                "l_suppkey": pa.array(
                    ((r >> np.uint64(8)) % np.uint64(n_supp)
                     ).astype(np.int64)
                ),
                "l_linenumber": pa.array(
                    (idx % lines_per_order).astype(np.int32) + 1
                ),
                "l_quantity": pa.array(
                    ((r >> np.uint64(16)) % np.uint64(50)
                     ).astype(np.float64) + 1.0
                ),
                "l_extendedprice": pa.array(
                    (((r >> np.uint64(24)) % np.uint64(10_000_000))
                     ).astype(np.float64) / 100.0
                ),
                "l_discount": pa.array(
                    ((r >> np.uint64(48)) % np.uint64(11)
                     ).astype(np.float64) / 100.0
                ),
                "l_tax": pa.array(
                    ((r >> np.uint64(52)) % np.uint64(9)
                     ).astype(np.float64) / 100.0
                ),
                "l_returnflag": pa.array(
                    _pick(FLAGS, (r >> np.uint64(56)) % np.uint64(3)), pa.string()
                ),
                "l_linestatus": pa.array(
                    _pick(["F", "O"], (r >> np.uint64(58))
                            % np.uint64(2)), pa.string()
                ),
                "l_shipdate": pa.array(
                    EPOCH + ship_days.astype("timedelta64[D]")
                ).cast(pa.timestamp("us")),
            }
        )
    elif table == "customer":
        r = _lcg(idx, 3)
        t = pa.table(
            {
                "c_custkey": pa.array(idx),
                "c_name": pa.array(
                    [f"Customer#{i}" for i in idx], pa.string()
                ),
                "c_nationkey": pa.array(
                    (r % np.uint64(N_NATIONS)).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    (((r >> np.uint64(8)) % np.uint64(1_100_000))
                     ).astype(np.float64) / 100.0 - 1000.0
                ),
                "c_mktsegment": pa.array(
                    _pick(SEGMENTS, (r >> np.uint64(32))
                            % np.uint64(5)), pa.string()
                ),
            }
        )
    elif table == "supplier":
        r = _lcg(idx, 4)
        t = pa.table(
            {
                "s_suppkey": pa.array(idx),
                "s_name": pa.array(
                    [f"Supplier#{i}" for i in idx], pa.string()
                ),
                "s_nationkey": pa.array(
                    (r % np.uint64(N_NATIONS)).astype(np.int32)
                ),
                "s_acctbal": pa.array(
                    (((r >> np.uint64(8)) % np.uint64(1_100_000))
                     ).astype(np.float64) / 100.0 - 1000.0
                ),
            }
        )
    elif table == "part":
        r = _lcg(idx, 5)
        t = pa.table(
            {
                "p_partkey": pa.array(idx),
                # testdata-style "adj noun" names so Q20's LIKE
                # 'small%' prefix filter is selective, not empty
                "p_name": pa.array(
                    [f"{a} {n}" for a, n in zip(
                        _pick(ADJS, (r >> np.uint64(40))
                              % np.uint64(len(ADJS))),
                        _pick(NOUNS, (r >> np.uint64(44))
                              % np.uint64(len(NOUNS))),
                    )],
                    pa.string(),
                ),
                "p_brand": pa.array(
                    _pick(BRANDS, r % np.uint64(25)),
                    pa.string(),
                ),
                "p_type": pa.array(
                    _pick(TYPES, (r >> np.uint64(8)) % np.uint64(6)), pa.string()
                ),
                "p_size": pa.array(
                    ((r >> np.uint64(16)) % np.uint64(50)
                     ).astype(np.int32) + 1
                ),
                "p_retailprice": pa.array(
                    (((r >> np.uint64(24)) % np.uint64(200_000))
                     ).astype(np.float64) / 100.0
                ),
            }
        )
    else:
        raise ValueError(table)
    os.makedirs(f"{out_dir}/{table}.parquet", exist_ok=True)
    path = f"{out_dir}/{table}.parquet/part-{shard:04d}.parquet"
    pq.write_table(t, path)
    return path


def synth_warehouse(out_dir: str, mult: int) -> dict:
    """Shard-parallel deterministic warehouse at `mult` x sf0.1-ish
    volumes. Returns row counts."""
    import ray

    n_orders = 150_000 * mult
    lines_per_order = 7  # sum(qty) can exceed Q18's 250 threshold
    n_lineitem = n_orders * lines_per_order
    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    shard_rows = 500_000

    task = ray.remote(synth_shard)
    futs = []
    for table, n in [("orders", n_orders), ("lineitem", n_lineitem),
                     ("customer", n_cust), ("supplier", n_supp),
                     ("part", n_part)]:
        for s, lo in enumerate(range(0, n, shard_rows)):
            futs.append(task.remote(
                out_dir, table, s, lo, min(lo + shard_rows, n),
                n_cust, n_supp, n_part, lines_per_order,
            ))
    ray.get(futs)
    # nation/region are true dims — tiny, written inline; the
    # nationkey % 5 region mapping mirrors the driver testdata
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(
                    np.arange(N_NATIONS, dtype=np.int64)
                ),
                "n_name": pa.array(
                    [f"NATION_{i}" for i in range(N_NATIONS)],
                    pa.string(),
                ),
                "n_regionkey": pa.array(
                    (np.arange(N_NATIONS) % 5).astype(np.int64)
                ),
            }
        ),
        f"{out_dir}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(
                    np.arange(len(REGIONS), dtype=np.int64)
                ),
                "r_name": pa.array(REGIONS, pa.string()),
            }
        ),
        f"{out_dir}/region.parquet",
    )
    return {"orders": n_orders, "lineitem": n_lineitem,
            "customer": n_cust, "supplier": n_supp, "part": n_part}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", default="tpch_q1,tpch_q6,tpch_q7,"
                                         "tpch_q13,tpch_q17,tpch_q18")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, log_to_driver=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    qs = E.queries()
    out_dir = tempfile.mkdtemp(prefix=f"tpch_x{args.mult}_",
                               dir="/tmp")
    try:
        t0 = time.time()
        counts = synth_warehouse(out_dir, args.mult)
        gen_s = round(time.time() - t0, 2)

        results = {}
        s0 = steal()
        for name in args.queries.split(","):
            t0 = time.time()
            r = qs[name](out_dir)
            n = r.count() if hasattr(r, "count") and not isinstance(
                r, pa.Table
            ) else len(r)
            results[name] = {"wall_s": round(time.time() - t0, 2),
                             "rows": int(n)}
        s1 = steal()
        print(json.dumps(
            {
                "metric": "tpch_scale_probe",
                "mult": args.mult,
                "cpus": args.cpus,
                "rows": counts,
                "gen_s": gen_s,
                "queries": results,
                "steal_jiffies": s1 - s0,
            }
        ))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
