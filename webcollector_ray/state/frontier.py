"""Per-depth Parquet checkpoint store with lineage manifests.

Layout (SURVEY.md §4 checkpoint row):

    <root>/depth=<k>/crawldb/part-*.parquet   merged frontier AFTER depth k's merge
    <root>/depth=<k>/fetch/part-*.parquet     fetch segment written BY depth k
    <root>/depth=<k>/link/part-*.parquet      link segment written BY depth k
    <root>/depth=<k>/_MANIFEST.json           counts + metrics + completeness marker

The manifest is written LAST (atomic rename), so a depth directory
without a manifest is incomplete and ignored on resume — this is the
Parquet equivalent of the reference's resumable crawldb
(crawler/Crawler.java:101-110: `resumable` keeps the KV dirs; every
executed/parsed datum lands in segments immediately and a crash loses
only in-flight records). Resume = read the newest complete depth's
crawldb + segments and continue; finished depths are never recomputed.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from ..model import FRONTIER_SCHEMA


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- paths ---
    def depth_dir(self, depth: int) -> str:
        return os.path.join(self.root, f"depth={depth}")

    def table_dir(self, depth: int, name: str) -> str:
        return os.path.join(self.depth_dir(depth), name)

    def manifest_path(self, depth: int) -> str:
        return os.path.join(self.depth_dir(depth), "_MANIFEST.json")

    # --- lifecycle ---
    def clear(self) -> None:
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)

    def exists(self) -> bool:
        return any(
            e.startswith("depth=") for e in os.listdir(self.root)
        ) if os.path.isdir(self.root) else False

    # --- write ---
    def write_table(self, ds, depth: int, name: str) -> int:
        """Write a Dataset as one checkpoint table; returns row count
        (from parquet metadata, no data re-read)."""
        path = self.table_dir(depth, name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        return self.count_rows(depth, name)

    def partition_lineage(self, depth: int) -> dict:
        """Per-partition lineage: every parquet part written at this
        depth with its row count and size (from file metadata) — a
        failed re-run can skip finished partitions file-by-file."""
        out: dict = {}
        for name in ("crawldb", "fetch", "link", "crawldb_final"):
            path = self.table_dir(depth, name)
            if not os.path.isdir(path):
                continue
            parts = []
            for fn in sorted(os.listdir(path)):
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(path, fn)
                parts.append(
                    {
                        "file": fn,
                        "rows": pq.ParquetFile(full).metadata.num_rows,
                        "bytes": os.path.getsize(full),
                    }
                )
            out[name] = parts
        return out

    def write_manifest(self, depth: int, payload: dict) -> None:
        payload = dict(payload)
        payload.setdefault("partitions", self.partition_lineage(depth))
        tmp = self.manifest_path(depth) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self.manifest_path(depth))

    # --- read ---
    def count_rows(self, depth: int, name: str) -> int:
        path = self.table_dir(depth, name)
        total = 0
        if not os.path.isdir(path):
            return 0
        for fn in os.listdir(path):
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows
        return total

    def has_table(self, depth: int, name: str) -> bool:
        path = self.table_dir(depth, name)
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )

    def read_dataset(self, depth: int, name: str):
        import ray.data as rd

        if not self.has_table(depth, name):
            return rd.from_arrow(FRONTIER_SCHEMA.empty_table())
        # columns pinned to the frontier schema: without this, hive
        # partition inference resurrects the `depth=<k>` path segment
        # as a phantom column on resume
        return rd.read_parquet(
            self.table_dir(depth, name), columns=list(FRONTIER_SCHEMA.names)
        )

    def read_manifest(self, depth: int) -> Optional[dict]:
        p = self.manifest_path(depth)
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    def latest_complete_depth(self) -> Optional[int]:
        best = None
        if not os.path.isdir(self.root):
            return None
        for e in os.listdir(self.root):
            if e.startswith("depth="):
                d = int(e.split("=", 1)[1])
                if self.read_manifest(d) is not None:
                    best = d if best is None else max(best, d)
        return best
