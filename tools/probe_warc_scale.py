"""WARC-at-scale probe (VERDICT r4 stretch item 8): read_warc + CDX
random access over a multi-archive, multi-GB-shaped layout.

Writes N Common-Crawl-layout archives (.warc.gz, one gzip member per
record) under /tmp, each with `pages` response records of ~`page_kb`
KiB HTML, then measures: (1) the streaming read_warc scan — one
generator task per archive, blocks bounded by rows_per_block — and
(2) build_warc_cdx + a batch of single-record ranged reads through
the CDX store. Prints one JSON line with archives/s, records/s,
MB/s and steal.

Usage: python tools/probe_warc_scale.py [--archives 16] [--pages 2000]
       [--page-kb 24]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, ".")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archives", type=int, default=16)
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--page-kb", type=int, default=24)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/warc_scale_probe")
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

    from webcollector_ray.sources.warc import (
        build_warc_cdx,
        read_warc,
        write_response_warc,
    )

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    # --- write the layout (driver-side, untimed vs the read path;
    # deterministic filler so archives compress like real HTML, not
    # like zeros)
    filler_unit = (
        "<p>the quick brown fox jumps over the lazy dog %04d</p>\n"
    )
    t_w0 = time.time()
    paths = []
    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    for a in range(args.archives):
        pages = []
        for i in range(args.pages):
            body_parts = [
                filler_unit % ((a * 131 + i * 17 + j) % 9973)
                for j in range(args.page_kb * 1024 // len(filler_unit))
            ]
            html = (
                f"<html><head><title>a{a} p{i}</title></head><body>"
                + "".join(body_parts) + "</body></html>"
            ).encode()
            pages.append({
                "url": f"http://site{a}.test/page-{i}.html",
                "warc_ts": ts,
                "code": 200,
                "content_type": "text/html",
                "html": html,
            })
        p = os.path.join(args.workdir, f"crawl-{a:05d}.warc.gz")
        write_response_warc(p, pages, compress=True)
        paths.append(p)
    write_s = round(time.time() - t_w0, 3)
    total_bytes = sum(os.path.getsize(p) for p in paths)
    uncompressed_mb = round(
        args.archives * args.pages * args.page_kb / 1024, 1
    )

    # warmup scan over one archive (worker spawn, untimed)
    read_warc(paths[:1]).count()

    # --- timed full scan: count + total html bytes forces every
    # record through parse without materializing pages on the driver
    s0, t0 = steal(), time.time()
    ds = read_warc(paths, rows_per_block=256)
    import pyarrow.compute as pc

    def sizer(b):
        import pyarrow as pa

        return pa.table({
            "n": pa.array([len(b)], pa.int64()),
            "html_bytes": pa.array(
                [pc.sum(pc.binary_length(b["html"])).as_py() or 0],
                pa.int64(),
            ),
        })

    agg = ds.map_batches(sizer, batch_format="pyarrow").to_pandas()
    scan_dt = time.time() - t0
    scan_sj = steal() - s0
    n_records = int(agg["n"].sum())
    html_mb = round(agg["html_bytes"].sum() / (1 << 20), 1)

    # --- timed CDX build + random access
    cdx_dir = os.path.join(args.workdir, "cdx")
    s1, t1 = steal(), time.time()
    store = build_warc_cdx(paths, cdx_dir, num_buckets=16)
    cdx_dt = time.time() - t1
    cdx_sj = steal() - s1

    from webcollector_ray.sources.warc import WarcStoreReader

    h = store.handle()
    reader = WarcStoreReader(h["cdx_dir"], h["num_buckets"])
    probe_urls = [
        f"http://site{a % args.archives}.test/page-{(a * 137) % args.pages}.html"
        for a in range(200)
    ]
    s2, t2 = steal(), time.time()
    got = [reader.get(u) for u in probe_urls]
    rand_dt = time.time() - t2
    rand_sj = steal() - s2
    n_hits = sum(1 for g in got if g is not None)

    out = {
        "probe": "warc_scale",
        "archives": args.archives,
        "records": n_records,
        "archive_bytes_mb": round(total_bytes / (1 << 20), 1),
        "uncompressed_payload_mb": uncompressed_mb,
        "html_mb_scanned": html_mb,
        "num_cpus": args.cpus,
        "write_s": write_s,
        "scan": {
            "secs": round(scan_dt, 3),
            "archives_per_s": round(args.archives / scan_dt, 2),
            "records_per_s": round(n_records / scan_dt),
            "payload_mb_per_s": round(html_mb / scan_dt, 1),
            "steal_jiffies": scan_sj,
            "steal_ratio": round(scan_sj / (scan_dt * 100 * args.cpus), 5),
        },
        "cdx_build": {
            "secs": round(cdx_dt, 3),
            "records_per_s": round(n_records / cdx_dt),
            "steal_jiffies": cdx_sj,
        },
        "random_access": {
            "reads": len(probe_urls),
            "hits": n_hits,
            "secs": round(rand_dt, 3),
            "reads_per_s": round(len(probe_urls) / rand_dt),
            "steal_jiffies": rand_sj,
        },
    }
    print(json.dumps(out))
    shutil.rmtree(args.workdir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
