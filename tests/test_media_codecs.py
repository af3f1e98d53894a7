"""Real media decode: pure-stdlib BMP/PPM/WAV codecs + the fake=False
paths of the multimodal stages (closing the last NotImplementedError
surface from round 3)."""

import struct

import numpy as np
import pytest
import ray.data as rd

from webcollector_ray.functions import media_codecs as mc
from webcollector_ray.functions.multimodal import (
    AudioFeatureStage,
    DecodeStage,
    FrameSampleStage,
    _formula_pixels,
    media_pipeline,
    synth_real_media_table,
)


@pytest.mark.parametrize("shape", [(16, 16), (5, 3), (7, 4), (1, 1), (3, 5)])
def test_bmp_round_trip(shape):
    # widths 3/5 exercise the 4-byte row-stride padding
    rng = np.random.default_rng(hash(shape) % 2**32)
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(a)), a)


def test_bmp_top_down():
    a = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(r.tobytes() + pad for r in a[:, :, ::-1])
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    assert np.array_equal(mc.decode_bmp(fh + dib + body), a)


def test_bmp_rejects_unsupported():
    a = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(mc.encode_bmp(a))
    struct.pack_into("<H", buf, 28, 8)  # bpp = 8
    with pytest.raises(ValueError, match="24bpp"):
        mc.decode_bmp(bytes(buf))


def test_ppm_round_trip_and_comments():
    a = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(a)), a)
    with_comments = b"P6\n# made by hand\n 6 # width\n4\n255\n" + a.tobytes()
    assert np.array_equal(mc.decode_ppm(with_comments), a)


def test_ppm_stream_round_trip():
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (4, 6, 3), np.uint8) for _ in range(5)]
    out = mc.decode_ppm_stream(mc.encode_ppm_stream(frames))
    assert len(out) == 5
    assert all(np.array_equal(x, y) for x, y in zip(out, frames))


def test_ppm_truncated_raises():
    a = np.zeros((4, 4, 3), np.uint8)
    buf = mc.encode_ppm(a)[:-5]
    with pytest.raises(ValueError, match="truncated"):
        mc.decode_ppm(buf)


@pytest.mark.parametrize("sampwidth,tol", [(1, 1 / 128), (2, 1 / 32768), (4, 1e-9)])
def test_wav_round_trip(sampwidth, tol):
    rng = np.random.default_rng(sampwidth)
    x = rng.uniform(-1, 0.999, 1000)
    y, sr = mc.decode_wav(mc.encode_wav(x, 8000, sampwidth=sampwidth))
    assert sr == 8000 and len(y) == 1000
    assert np.abs(y - x).max() <= tol


def test_wav_stereo_mixdown():
    x = np.linspace(-0.9, 0.9, 500)
    stereo = np.stack([x, -x], axis=1)
    y, sr = mc.decode_wav(mc.encode_wav(stereo, 16000, sampwidth=2, nchannels=2))
    assert sr == 16000
    assert np.abs(y).max() < 1 / 32768  # L and R cancel


def test_decode_image_dispatch():
    a = np.full((2, 2, 3), 9, np.uint8)
    assert np.array_equal(mc.decode_image(mc.encode_bmp(a)), a)
    assert np.array_equal(mc.decode_image(mc.encode_ppm(a)), a)
    with pytest.raises(ValueError, match="unsupported image format"):
        mc.decode_image(b"\x89PNG....")
    with pytest.raises(ValueError, match="empty"):
        mc.decode_image(b"")


def test_real_decode_stage_pixels_match_formula():
    tbl = synth_real_media_table(4)
    out = DecodeStage(fake=False)(tbl)
    assert out["height"].to_pylist() == [16] * 4
    for i in range(4):
        px = np.asarray(out["pixels"][i].as_py(), np.uint8).reshape(16, 16, 3)
        assert np.array_equal(px, _formula_pixels(i, 16, 16))


def test_real_media_pipeline_end_to_end(ray_session):
    # decode(real BMP) -> resize -> features through Ray actor pools;
    # features must equal the direct numpy computation on the same pixels.
    ds = rd.from_arrow(synth_real_media_table(8))
    out = media_pipeline(ds, fake=False).to_pandas().sort_values("media_id")
    assert len(out) == 8
    arr = _formula_pixels(3, 16, 16).astype(np.float64)
    pooled = (
        arr.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3)).astype(np.uint8)
    ).astype(np.float64)
    expect = np.concatenate(
        [pooled.mean(axis=(0, 1)), pooled.std(axis=(0, 1))]
    )
    got = np.asarray(list(out[out["media_id"] == 3]["features"])[0])
    assert np.allclose(got, expect)


def test_real_frame_sample_stage(ray_session):
    media = synth_real_media_table(3, kind="video", height=8, width=8,
                                   num_frames=8)
    out = (
        rd.from_arrow(media)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs=dict(fake=False, every=4),
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["media_id", "frame"])
    )
    assert out["frame"].tolist() == [0, 4] * 3
    row = out[(out["media_id"] == 2) & (out["frame"] == 4)].iloc[0]
    px = np.asarray(row["pixels"], np.uint8).reshape(8, 8, 3)
    assert np.array_equal(px, _formula_pixels(2, 8, 8, frame=4))


def test_real_audio_feature_stage(ray_session):
    media = synth_real_media_table(3, kind="audio")
    out = (
        rd.from_arrow(media)
        .map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs=dict(fake=False),
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert out["duration_s"].tolist() == [4096 / 8000] * 3
    # clip 1: recompute rms/zc straight from the closed form
    j = np.arange(4096, dtype=np.int64)
    wave = ((j * 2654435761 + 1 * 40503) % 65536 - 32768) / 32768.0
    row = out[out["media_id"] == 1].iloc[0]
    assert np.isclose(row["rms"], np.sqrt((wave**2).mean()))
    neg = wave < 0
    assert row["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())
