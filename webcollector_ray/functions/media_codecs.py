"""Pure-stdlib media codecs for the multimodal decode stages.

The container has no PIL/ffmpeg/soundfile, so the *real* (fake=False)
decode path in functions/multimodal.py is implemented for the
uncompressed formats whose specs are simple enough to parse with
struct/numpy alone:

- BMP   (24-bit BI_RGB, BITMAPINFOHEADER+, bottom-up or top-down)
- PPM   (binary P6, maxval <= 255, '#' comments)
- "video" = a stream of concatenated P6 frames (the layout ffmpeg
  emits for ``-f image2pipe -vcodec ppm``)
- WAV   (PCM 8/16/32-bit, any channel count, via the stdlib ``wave``
  module; channels are mixed down by mean)

Encoders exist so tests and the driver can synthesise byte-real
fixtures deterministically. Everything is numpy-vectorized per image /
per clip; per-*record* iteration happens in the calling actor stage
(payload decode is inherently per-record work, exactly like the
reference's per-page ``visit`` dispatch, Executor semantics in
SURVEY.md §2.4).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --------------------------------------------------------------- BMP

_BMP_WS = b" \t\r\n"


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> 24-bit BI_RGB bottom-up BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    # bottom-up rows, BGR channel order
    rows = arr[::-1, :, ::-1]
    body = b"".join(r.tobytes() + pad for r in rows)
    pixel_offset = 14 + 40
    file_header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + dib + body


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> RGB uint8 (h, w, 3). Handles both
    bottom-up (positive height) and top-down (negative height) rows and
    the 4-byte row-stride padding."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w, h = struct.unpack_from("<ii", buf, 18)
    _planes, bpp = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, np.uint8, count=stride * h, offset=pixel_offset)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


# --------------------------------------------------------------- PPM


def _ppm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    n = len(buf)
    while pos < n:
        ch = buf[pos : pos + 1]
        if ch in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        elif ch == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos : pos + 1] not in (b" ", b"\t", b"\r", b"\n"):
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def encode_ppm(arr: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> binary P6 bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm_at(buf: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Parse one P6 image at ``pos``; returns (pixels, next_pos) so a
    concatenated frame stream can be walked."""
    magic, pos = _ppm_token(buf, pos)
    if magic != b"P6":
        raise ValueError("not a binary P6 PPM payload")
    wtok, pos = _ppm_token(buf, pos)
    htok, pos = _ppm_token(buf, pos)
    mtok, pos = _ppm_token(buf, pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pos += 1  # exactly one whitespace byte after maxval (spec)
    need = w * h * 3
    if pos + need > len(buf):
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(buf, np.uint8, count=need, offset=pos).reshape(h, w, 3)
    return arr.copy(), pos + need


def decode_ppm(buf: bytes) -> np.ndarray:
    arr, _ = decode_ppm_at(buf, 0)
    return arr


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Frames -> concatenated P6 stream (ffmpeg image2pipe layout)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(buf: bytes) -> list[np.ndarray]:
    frames, pos = [], 0
    while pos < len(buf):
        arr, pos = decode_ppm_at(buf, pos)
        frames.append(arr)
    return frames


# ------------------------------------------------------------- image


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff the magic and decode: BMP ('BM') or PPM ('P6')."""
    if not buf:
        raise ValueError("empty image payload")
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] == b"P6":
        return decode_ppm(buf)
    raise ValueError(
        f"unsupported image format (magic {buf[:2]!r}); BMP and binary "
        "PPM are decodable without PIL — plug PIL here for JPEG/PNG"
    )


# --------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int,
               sampwidth: int = 2, nchannels: int = 1) -> bytes:
    """Float samples in [-1, 1) (1-D mono, or (n, nchannels)) ->
    PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != nchannels:
        raise ValueError("sample shape does not match nchannels")
    if sampwidth == 1:
        pcm = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
    elif sampwidth == 2:
        pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    elif sampwidth == 4:
        pcm = np.clip(
            np.round(x * 2147483648.0), -2147483648, 2147483647
        ).astype("<i4")
    else:
        raise ValueError("sampwidth must be 1, 2 or 4")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(nchannels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(pcm).tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float64 mono samples in [-1, 1), sample_rate).
    Multi-channel audio is mixed down by per-frame mean."""
    try:
        with wave.open(io.BytesIO(buf), "rb") as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            sr = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr
