"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a JSON meta column
(same convention as the frontier's meta, SURVEY.md §1.1). The decode
kernels themselves are STUBBED — no image/audio libraries exist in this
container — behind `DecodeStage(fake=...)`:

- fake=False: raises NotImplementedError at first batch (the real
  deployment would plug PIL/ffmpeg here);
- fake=True: a deterministic md5-seeded pixel array per payload, so the
  downstream plumbing (actor-pool signature, Arrow tensor columns,
  batch sizing for wide binary rows, resize/feature stages) is real and
  testable.

All stages are callable classes -> actor pools (decode state built once
per actor), batch_format="pyarrow" end-to-end, small batch sizes
because payload rows are wide.
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),      # JSON: {width, height, codec, ...}
    ]
)


_STREAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _seed64(s: str) -> int:
    """md5-derived 64-bit seed: little-endian first 8 digest bytes
    (= DuckDB's md5_number_upper, so the SQL oracle gets the same
    value)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _hash_stream(seeds: np.ndarray, n: int) -> np.ndarray:
    """(len(seeds), n) uint64 matrix; element j of row i is
    ((seed_i + j + 1) * 0x9E3779B97F4A7C15) mod 2^64 — one wrap-around
    multiply per element, vectorized over the whole batch, and
    re-derivable in SQL via split multiplication (the fake kernels
    below feed the media_* driver oracles)."""
    j = np.arange(1, n + 1, dtype=np.uint64)
    return (seeds[:, None] + j[None, :]) * _STREAM_MULT


def _hash_bytes(seeds: np.ndarray, n: int) -> np.ndarray:
    """Top byte of each stream element -> (len(seeds), n) uint8."""
    return (_hash_stream(seeds, n) >> np.uint64(56)).astype(np.uint8)


def _fake_decode(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-pixels from the payload's hex digest."""
    seed = np.array([_seed64((payload or b"").hex())], dtype=np.uint64)
    return _hash_bytes(seed, h * w * c).reshape(h, w, c)


class DecodeStage:
    """payload -> pixels (flattened) + shape columns."""

    def __init__(self, fake: bool = False, height: int = 16, width: int = 16):
        self.fake = fake
        self.h = height
        self.w = width

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg — not available in "
                "this container; construct DecodeStage(fake=True) for the "
                "deterministic test path"
            )
        seeds = np.array(
            [_seed64((p or b"").hex()) for p in batch["payload"].to_pylist()],
            dtype=np.uint64,
        )
        pix = _hash_bytes(seeds, self.h * self.w * 3)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array([p.tolist() for p in pix], pa.list_(pa.uint8())),
                "height": pa.array([self.h] * len(seeds), pa.int32()),
                "width": pa.array([self.w] * len(seeds), pa.int32()),
            }
        )


class ResizeStage:
    """Average-pool decoded pixels to (out_h, out_w)."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        hs = batch["height"].to_pylist()
        ws = batch["width"].to_pylist()
        for px, h, w in zip(batch["pixels"].to_pylist(), hs, ws):
            arr = np.asarray(px, dtype=np.uint8).reshape(h, w, 3)
            fh, fw = h // self.out_h, w // self.out_w
            pooled = (
                arr[: fh * self.out_h, : fw * self.out_w]
                .reshape(self.out_h, fh, self.out_w, fw, 3)
                .mean(axis=(1, 3))
                .astype(np.uint8)
            )
            out.append(pooled.ravel().tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array(out, pa.list_(pa.uint8())),
                "height": pa.array([self.out_h] * len(out), pa.int32()),
                "width": pa.array([self.out_w] * len(out), pa.int32()),
            }
        )


class FeatureStage:
    """Per-channel mean/std feature vector from pixels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        hs = batch["height"].to_pylist()
        ws = batch["width"].to_pylist()
        for px, h, w in zip(batch["pixels"].to_pylist(), hs, ws):
            arr = np.asarray(px, dtype=np.float64).reshape(h, w, 3)
            feats.append(
                np.concatenate([arr.mean(axis=(0, 1)), arr.std(axis=(0, 1))]).tolist()
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Video payload -> every k-th frame's pixels (fake decode derives a
    deterministic frame sequence from the payload digest; a real
    deployment plugs ffmpeg here). Actor-pool stage: one output row per
    sampled frame (flat-map shape)."""

    def __init__(self, fake: bool = False, num_frames: int = 8,
                 every: int = 4, height: int = 8, width: int = 8):
        self.fake = fake
        self.num_frames = num_frames
        self.every = every
        self.h = height
        self.w = width

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real video decode requires ffmpeg — not available in this "
                "container; construct FrameSampleStage(fake=True) for the "
                "deterministic test path"
            )
        ids, frames, seeds = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for f in range(0, self.num_frames, self.every):
                ids.append(mid)
                frames.append(f)
                # frame seed: payload hex + 8-hex-char frame index
                seeds.append(_seed64((payload or b"").hex() + format(f, "08x")))
        pix = _hash_bytes(np.asarray(seeds, dtype=np.uint64), self.h * self.w * 3)
        pixels = [p.tolist() for p in pix]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "pixels": pa.array(pixels if ids else [], pa.list_(pa.uint8())),
                "height": pa.array([self.h] * len(ids), pa.int32()),
                "width": pa.array([self.w] * len(ids), pa.int32()),
            }
        )


class AudioFeatureStage:
    """Audio payload -> (duration_s, rms, zero_crossings). Fake decode
    derives a deterministic PCM-ish waveform from the payload digest;
    a real deployment plugs soundfile/ffmpeg here."""

    def __init__(self, fake: bool = False, sample_rate: int = 8000,
                 n_samples: int = 4096):
        self.fake = fake
        self.sr = sample_rate
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires soundfile/ffmpeg — not available "
                "in this container; construct AudioFeatureStage(fake=True) "
                "for the deterministic test path"
            )
        seeds = np.array(
            [_seed64((p or b"").hex()) for p in batch["payload"].to_pylist()],
            dtype=np.uint64,
        )
        # uniform [-1, 1) samples from the hash stream (rows, n)
        u = _hash_stream(seeds, self.n).astype(np.float64) / 2.0**64
        wave = 2.0 * u - 1.0
        durs = [self.n / self.sr] * len(seeds)
        rms = np.sqrt((wave**2).mean(axis=1)).tolist()
        neg = wave < 0
        zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1).astype(np.int64).tolist()
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_s": pa.array(durs, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )


def synth_media_table(n: int = 32, kind: str = "image") -> pa.Table:
    """Deterministic fixture payloads."""
    ids = list(range(n))
    payloads = [hashlib.md5(f"media-{i}".encode()).digest() * 8 for i in ids]
    metas = [json.dumps({"codec": "fake", "i": i}) for i in ids]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_pipeline(ds, fake: bool = True, batch_size: int = 16,
                   concurrency: int = 2):
    """decode -> resize -> features, all actor pools."""
    return (
        ds.map_batches(
            DecodeStage,
            fn_constructor_kwargs=dict(fake=fake),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(
            ResizeStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(
            FeatureStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    )
