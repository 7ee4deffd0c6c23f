"""Real video decode for the container/codec pair implementable without
native libraries: AVI (Microsoft RIFF, the Common-Crawl-era container)
carrying MJPEG (every frame is a baseline JPEG — decoded by the in-repo
pure-numpy codec, ``jpeg.py``) or uncompressed bottom-up BGR DIB frames.

This closes the video leg of the multimodal decode stub the same way
round 3 closed images: a pure-Python demuxer plus an in-repo MUXER that
provides fixtures (``encode_avi`` writes spec-shaped RIFF/hdrl/movi/idx1
structure from our own JPEG/DIB encodings, so decode tests are
round-trip byte-exact with zero native deps). H.264 rides in AVI too
(``codec='h264'``: one Annex B access unit per chunk, decoded by the
in-repo baseline I+P+B codec, ``h264.py``), and MP4/ISO-BMFF payloads —
the container virtually all real web video ships in — are sniffed by
their ``ftyp`` box and demuxed by ``mp4.py`` (box walk, sample tables,
avcC, AVCC->Annex B) into the same H.264 decode; Matroska/WebM
payloads (the other major web container) are sniffed by the EBML magic
and demuxed by ``mkv.py`` the same way. CABAC/high profiles
plus VP9/AV1 genuinely need native libs and stay behind the declared
stub; at scale the ``native_image_backend``-style seam applies — a
production deployment plugs PyAV/ffmpeg in ahead of this decoder.

Reference parity note: the reference engine has no media codecs at all
(it is an HTML->markdown crawler); this module is part of the
training-data-pipeline surface the brief adds on top (frame sampling
for multimodal datasets). Spark-side: frames are sampled inside
``mapInPandas`` (one video per row, wide payloads — byte-aware
batching per ``media_repartition_hint``), emitted as PNG-encoded rows
so the existing image operators (features, resize, dedup) consume them
unchanged.

Format facts used (public spec: MS RIFF/AVI, OpenDML):
- RIFF chunks are ``fourcc, u32 size, payload`` with EVEN padding.
- ``hdrl`` LIST: ``avih`` (56-byte MainAVIHeader) then one ``strl``
  LIST per stream: ``strh`` (fccType 'vids', dwScale/dwRate = frame
  cadence) + ``strf`` (BITMAPINFOHEADER; biCompression 'MJPG' or 0).
- ``movi`` LIST: ``NNdc`` (compressed) / ``NNdb`` (uncompressed DIB)
  frame chunks for stream NN; DIB rows are bottom-up BGR, stride
  padded to 4 bytes.
- ``idx1``: 16-byte entries (ckid, flags, offset, length) — written by
  the muxer, tolerated-but-not-required by the demuxer (frames are
  recovered by a sequential movi walk, so index-less or torn-tail
  files still decode).
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import encode_png, normalize_decode_errors


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


# ---------------------------------------------------------------------------
# mux (fixture writer)
# ---------------------------------------------------------------------------
def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_from_rgb(frame: np.ndarray) -> bytes:
    """Bottom-up BGR rows, stride padded to 4 bytes (positive biHeight)."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _rgb_from_dib(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(data) < stride * h:
        raise ValueError("DIB frame shorter than stride * height")
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]


def encode_avi(
    frames: List[np.ndarray],
    fps_num: int = 30,
    fps_den: int = 1,
    codec: str = "mjpeg",
    subsample: bool = False,
) -> bytes:
    """AVI writer for a list of HxWx3 uint8 RGB frames. ``codec`` is
    ``'mjpeg'`` (each frame through the in-repo baseline JPEG encoder;
    DCT-exact for 8x8-block-constant fixtures) or ``'raw'``
    (uncompressed DIB — lossless for arbitrary pixels)."""
    from . import jpeg  # noqa: PLC0415

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for fr in frames:
        if fr.shape != (h, w, 3) or fr.dtype != np.uint8:
            raise ValueError("all frames must be HxWx3 uint8 with equal shape")
    if codec == "mjpeg":
        blobs = [jpeg.encode_jpeg(fr, subsample=subsample) for fr in frames]
        compression, ckid = b"MJPG", b"00dc"
    elif codec == "raw":
        blobs = [_dib_from_rgb(fr) for fr in frames]
        compression, ckid = struct.pack("<I", 0), b"00db"
    elif codec == "h264":
        # all-intra Annex B: one access unit per chunk, SPS/PPS riding
        # in the first chunk (the common AVI/H.264 layout)
        from .h264 import encode_h264, parse_annexb_nals  # noqa: PLC0415

        stream = encode_h264(list(frames), qp=26, fps=fps_num / max(fps_den, 1))
        # split at each IDR NAL start code (keep parameter sets with AU 0)
        cuts = []
        i = 0
        while i + 5 <= len(stream):
            if stream[i:i + 4] == b"\x00\x00\x00\x01" and (stream[i + 4] & 0x1F) == 5:
                cuts.append(i)
            i += 1
        parse_annexb_nals(stream)  # sanity: the writer emitted valid NALs
        blobs = []
        for k, cut in enumerate(cuts):
            lo = 0 if k == 0 else cut
            hi = cuts[k + 1] if k + 1 < len(cuts) else len(stream)
            blobs.append(stream[lo:hi])
        compression, ckid = b"H264", b"00dc"
    else:
        raise ValueError(f"unknown codec {codec!r}")

    usec_per_frame = int(round(1_000_000 * fps_den / fps_num))
    max_blob = max(len(b) for b in blobs)
    avih = struct.pack(
        "<14I",
        usec_per_frame,
        max_blob * fps_num // max(fps_den, 1),
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        max_blob,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + (compression if codec in ("mjpeg", "h264") else b"\x00\x00\x00\x00")
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # flags
            0,
            0,  # priority, language
            0,  # initial frames
            fps_den,  # dwScale
            fps_num,  # dwRate
            0,  # start
            len(frames),  # length (in frames)
            max_blob,
            0xFFFFFFFF,  # quality: default
            0,  # sample size (0: varies)
            0,
            0,
            w,
            h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,
        w,
        h,
        1,
        24,
        compression if codec in ("mjpeg", "h264") else b"\x00\x00\x00\x00",
        len(blobs[0]) if codec == "raw" else 0,
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(ckid, b) for b in blobs)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi list's type word
    idx_entries = []
    off = 4  # past b"movi"
    for b in blobs:
        idx_entries.append(struct.pack("<4sIII", ckid, 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


# ---------------------------------------------------------------------------
# demux
# ---------------------------------------------------------------------------
def _walk_chunks(buf: bytes, pos: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (fourcc_or_listtype, payload_start, payload_end). For LIST
    chunks the yielded fourcc is ``LIST:<type>`` and the payload starts
    AFTER the 4-byte list type. Tolerates a torn tail (stops cleanly)."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        start = pos + 8
        stop = start + size
        if fourcc == b"LIST" and size >= 4 and start + 4 <= end:
            # a torn tail may truncate the file inside a LIST whose size
            # field still claims the full extent — clamp and walk what's
            # there (frames before the tear are recovered)
            yield b"LIST:" + buf[start : start + 4], start + 4, min(stop, end)
        elif stop > end:
            break  # torn non-LIST chunk: ignore the incomplete payload
        else:
            yield fourcc, start, stop
        pos = stop + (size % 2)


@normalize_decode_errors("AVI")
def parse_avi(payload: bytes) -> dict:
    """Container metadata + per-frame chunk spans for video stream 0:
    ``{width, height, fps_num, fps_den, codec, n_frames, frames}`` where
    ``frames`` is a list of raw frame-chunk byte strings. Recovery is a
    sequential ``movi`` walk (no idx1 required)."""
    if not is_avi(payload):
        raise ValueError("not an AVI")
    width = height = None
    fps_num, fps_den = 30, 1
    codec = None
    stream_no = -1
    vids_stream = None
    frames: List[bytes] = []
    for fourcc, start, stop in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST:hdrl":
            for f2, s2, e2 in _walk_chunks(payload, start, stop):
                if f2 == b"LIST:strl":
                    stream_no += 1
                    is_vids = False
                    for f3, s3, e3 in _walk_chunks(payload, s2, e2):
                        if f3 == b"strh" and e3 - s3 >= 56:
                            fcc_type = payload[s3 : s3 + 4]
                            if fcc_type == b"vids" and vids_stream is None:
                                is_vids = True
                                vids_stream = stream_no
                                scale, rate = struct.unpack_from(
                                    "<II", payload, s3 + 20
                                )
                                if rate:
                                    fps_num, fps_den = rate, max(scale, 1)
                        elif f3 == b"strf" and is_vids and e3 - s3 >= 40:
                            (biw, bih) = struct.unpack_from("<ii", payload, s3 + 4)
                            comp = payload[s3 + 16 : s3 + 20]
                            width, height = biw, abs(bih)
                            if comp in (b"MJPG", b"mjpg"):
                                codec = "mjpeg"
                            elif comp == b"\x00\x00\x00\x00":
                                codec = "raw"
                            else:
                                codec = comp.decode("ascii", "replace").lower()
        elif fourcc == b"LIST:movi" and vids_stream is not None:
            want = b"%02d" % vids_stream
            for f2, s2, e2 in _walk_chunks(payload, start, stop):
                if f2[:2] == want and f2[2:4] in (b"dc", b"db"):
                    frames.append(payload[s2:e2])
    if width is None or codec is None:
        raise ValueError("no video stream header in AVI")
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "codec": codec,
        "n_frames": len(frames),
        "frames": frames,
    }


@normalize_decode_errors("AVI")
def decode_avi_frames(
    payload: bytes,
    every_n_frames: int = 1,
    max_frames: Optional[int] = None,
) -> Tuple[int, int, float, List[Tuple[int, np.ndarray]]]:
    """(width, height, fps, [(frame_index, HxWx3 uint8 RGB), ...]) taking
    every Nth frame. MJPEG frames decode through the in-repo JPEG codec;
    raw frames through the DIB un-packer. Unsupported inter-frame codecs
    raise ValueError (the decoder-boundary contract)."""
    from . import jpeg  # noqa: PLC0415

    info = parse_avi(payload)
    if info["codec"] not in ("mjpeg", "raw", "h264"):
        raise ValueError(f"unsupported AVI codec {info['codec']!r}")
    if every_n_frames < 1:
        raise ValueError("every_n_frames must be >= 1")
    if info["codec"] == "h264":
        # all-intra Annex B access units, parameter sets in chunk 0:
        # decode the concatenated stream through the in-repo codec
        from .h264 import decode_h264  # noqa: PLC0415
        from .mpeg1 import ycbcr420_to_rgb  # noqa: PLC0415

        pics, (w, h, _) = decode_h264(b"".join(info["frames"]))
        out = []
        for i in range(0, len(pics), every_n_frames):
            out.append((i, ycbcr420_to_rgb(*pics[i])))
            if max_frames is not None and len(out) >= max_frames:
                break
        return w, h, info["fps_num"] / info["fps_den"], out
    out: List[Tuple[int, np.ndarray]] = []
    for i in range(0, info["n_frames"], every_n_frames):
        blob = info["frames"][i]
        if info["codec"] == "mjpeg":
            w, h, ch, px = jpeg.decode_jpeg(blob)
            if ch == 1:
                px = np.repeat(px, 3, axis=2)
        else:
            px = _rgb_from_dib(blob, info["width"], info["height"])
        out.append((i, px))
        if max_frames is not None and len(out) >= max_frames:
            break
    return info["width"], info["height"], info["fps_num"] / info["fps_den"], out


# ---------------------------------------------------------------------------
# spark pipeline
# ---------------------------------------------------------------------------
VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_index int, frame_ts_s double, "
    "width int, height int, frame_png binary"
)


def sample_video_frames(
    media: DataFrame,
    every_n_seconds: float = 5.0,
    max_frames_per_video: int = 64,
    batch_rows: int = 8,
) -> DataFrame:
    """REAL frame sampling for AVI payloads: demux inside mapInPandas
    (one wide row at a time — videos are the widest media rows), take a
    frame every ``every_n_seconds`` of stream time, re-encode each as
    PNG so every existing image operator (features, resize, near-dup)
    consumes the output unchanged. Undecodable/foreign-codec payloads
    emit no rows (the plan-only ``frame_sample_plan`` remains the
    metadata path for those). Runs on executors; nothing collects."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            start = 0
            while start < len(pdf):
                part = pdf.iloc[start : start + batch_rows]
                start += batch_rows
                rows = {
                    "media_id": [],
                    "frame_index": [],
                    "frame_ts_s": [],
                    "width": [],
                    "height": [],
                    "frame_png": [],
                }
                for media_id, raw in zip(part["media_id"], part["payload"]):
                    payload = bytes(raw or b"")
                    try:
                        if payload[:4] == b"\x00\x00\x01\xb3":
                            # MPEG-1 elementary stream (inter-frame)
                            from .mpeg1 import (  # noqa: PLC0415
                                decode_mpeg1_frames,
                                mpeg1_fps,
                            )

                            step = max(
                                1,
                                int(round(mpeg1_fps(payload) * every_n_seconds)),
                            )
                            w, h, fps, frames = decode_mpeg1_frames(
                                payload, step, max_frames_per_video
                            )
                        elif payload[:5] in (
                            b"\x00\x00\x00\x01\x67", b"\x00\x00\x00\x01\x27"
                        ) or payload[:4] in (b"\x00\x00\x01\x67", b"\x00\x00\x01\x27"):
                            # H.264 Annex B stream opening with an SPS
                            from .h264 import (  # noqa: PLC0415
                                decode_h264_frames,
                                h264_fps,
                            )

                            step = max(
                                1,
                                int(round(h264_fps(payload) * every_n_seconds)),
                            )
                            w, h, fps, frames = decode_h264_frames(
                                payload, step, max_frames_per_video
                            )
                        elif payload[4:8] == b"ftyp":
                            # MP4 (ISO BMFF) carrying H.264
                            from .mp4 import (  # noqa: PLC0415
                                decode_mp4_frames,
                                parse_mp4,
                            )

                            inf = parse_mp4(payload)
                            fps = inf["fps_num"] / inf["fps_den"]
                            step = max(1, int(round(fps * every_n_seconds)))
                            w, h, fps, frames = decode_mp4_frames(
                                payload, step, max_frames_per_video
                            )
                        elif payload[:4] == b"\x1a\x45\xdf\xa3":
                            # Matroska/WebM carrying H.264
                            from .mkv import (  # noqa: PLC0415
                                decode_mkv_frames,
                                parse_mkv,
                            )

                            inf = parse_mkv(payload)
                            fps = inf["fps_num"] / inf["fps_den"]
                            step = max(1, int(round(fps * every_n_seconds)))
                            w, h, fps, frames = decode_mkv_frames(
                                payload, step, max_frames_per_video
                            )
                        else:
                            info = parse_avi(payload)
                            fps = info["fps_num"] / info["fps_den"]
                            step = max(1, int(round(fps * every_n_seconds)))
                            w, h, fps, frames = decode_avi_frames(
                                payload, step, max_frames_per_video
                            )
                    except ValueError:
                        continue
                    for idx, px in frames:
                        rows["media_id"].append(media_id)
                        rows["frame_index"].append(idx)
                        rows["frame_ts_s"].append(idx / fps)
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["frame_png"].append(encode_png(px))
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, VIDEO_FRAMES_SCHEMA
    )
