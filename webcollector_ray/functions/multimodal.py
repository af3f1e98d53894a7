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


def _fake_decode(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-pixels from the payload digest."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


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
        pixels, heights, widths = [], [], []
        for payload in batch["payload"].to_pylist():
            arr = _fake_decode(payload, self.h, self.w)
            pixels.append(arr.ravel())
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array([p.tolist() for p in pixels], pa.list_(pa.uint8())),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
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
        ids, frames, pixels = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for f in range(0, self.num_frames, self.every):
                arr = _fake_decode(
                    (payload or b"") + f.to_bytes(4, "big"), self.h, self.w
                )
                ids.append(mid)
                frames.append(f)
                pixels.append(arr.ravel().tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "pixels": pa.array(pixels, pa.list_(pa.uint8())),
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
        durs, rms, zc = [], [], []
        for payload in batch["payload"].to_pylist():
            seed = int.from_bytes(
                hashlib.md5(payload or b"").digest()[:4], "big"
            )
            rng = np.random.RandomState(seed)
            wave = rng.randn(self.n).astype(np.float64)
            durs.append(self.n / self.sr)
            rms.append(float(np.sqrt((wave**2).mean())))
            zc.append(int((np.diff(np.signbit(wave)) != 0).sum()))
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
