"""Pure-stdlib media codecs: real decode for PNG and WAV.

The container has no codec libraries (PIL/libvips/ffmpeg), but two
formats need none: PNG is zlib (stdlib) + the five spec filters
(RFC 2083 / W3C PNG 6.3-6.6), and 16-bit PCM WAV is the stdlib ``wave``
module + a frombuffer. These decoders upgrade the multimodal family from
"decode stubbed" to real decode for the formats a training pipeline can
handle without native deps; JPEG/video remain behind the declared stub
(`multimodal.decode_image_stub`).

Scale shape: both decoders are called from mapInPandas batches
(byte-aware batching in `multimodal.py`); the PNG un-filter is numpy-
vectorized for filters None/Up and per-byte for Sub/Average/Paeth
(sequential in x by construction of the spec).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Tuple

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_png(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    """(width, height, channels, HxWxC uint8 array) for an 8-bit-depth,
    non-interlaced PNG of color type gray/RGB/gray+alpha/RGBA.

    Raises ValueError for anything else (palette, 16-bit, Adam7) — the
    caller falls back to the declared stub.
    """
    if not is_png(payload):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={bitdepth}, color={colortype}, "
            f"interlace={interlace})"
        )
    channels = _CHANNELS[colortype]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    p = 0
    for y in range(height):
        f = int(raw[p])
        row = raw[p + 1 : p + 1 + stride].astype(np.int32)
        p += 1 + stride
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up — vectorized
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub — sequential in x
            cur = row
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = row
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, channels, out.reshape(height, width, channels)


def _filter_row(cur: np.ndarray, prev: np.ndarray, f: int, bpp: int) -> np.ndarray:
    """Forward filter (encoder side) — exact inverse of the decode step."""
    cur32 = cur.astype(np.int32)
    prev32 = prev.astype(np.int32)
    n = len(cur32)
    out = np.empty(n, dtype=np.int32)
    for x in range(n):
        a = int(cur32[x - bpp]) if x >= bpp else 0
        b = int(prev32[x])
        c = int(prev32[x - bpp]) if x >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pp = a + b - c
            pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (cur32[x] - pred) & 0xFF
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced) for fixtures and sinks.

    ``filter_type`` applies one spec filter to every row — used by the
    cross-filter roundtrip test (the same pixels encoded under each of
    the five filters must decode identically).
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    flat = arr.reshape(height, stride).astype(np.uint8)
    rows = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        rows.append(filter_type)
        rows.extend(_filter_row(flat[y], prev, filter_type, channels).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + chunk(b"IEND", b"")
    )


def image_features_from_pixels(
    width: int, height: int, channels: int, pixels: np.ndarray
) -> list:
    """8-dim deterministic feature: per-channel mean (padded to 4),
    overall std, aspect ratio (min(w/h, h/w)), luma mean, 0-pad."""
    px = pixels.astype(np.float64) / 255.0
    means = [float(px[:, :, c].mean()) for c in range(channels)]
    means += [0.0] * (4 - channels)
    std = float(px.std())
    aspect = min(width / height, height / width)
    luma = float(px.mean())
    feat = means + [std, aspect, luma, 0.0]
    return [round(v, 6) for v in feat]


def decode_wav(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, samples int16 [n_frames, n_channels])
    for 16-bit PCM WAV. Raises ValueError otherwise."""
    if not is_wav(payload):
        raise ValueError("not a WAV")
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = w.getframerate()
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return rate, nch, samples


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """16-bit PCM WAV writer for fixtures (samples int16 [n, ch])."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def audio_features(rate: int, nch: int, samples: np.ndarray) -> dict:
    """Deterministic audio features: duration, rms (normalized), zero-
    crossing rate of the mean channel."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    duration = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_samples": n,
        "duration_s": round(duration, 6),
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
    }


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic: src = floor(dst*src/dst)),
    the resize kernel for the training-pipeline operator — bilinear etc.
    would need float rounding policy agreement to stay reproducible."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys][:, xs]
