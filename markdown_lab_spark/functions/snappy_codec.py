"""From-scratch Snappy decoder + literal-only encoder.

Snappy is parquet's historical default codec and common in Hadoop-era
web corpora. Same verification posture as :mod:`zstd_codec`: pyarrow
bundles the real Snappy codec, so the decoder is exercised against
foreign bitstreams and the encoder's output is decoded by the real
library (``tests/test_zstd.py``). Raw Snappy format only (the framing
format adds a CRC layer nothing in this engine produces or ingests).
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated varint")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 35:
            raise SnappyError("varint too long")


def decode_snappy(payload: bytes) -> bytes:
    total, pos = _read_varint(payload, 0)
    out = bytearray()
    n = len(payload)
    while pos < n:
        tag = payload[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nbytes = length - 60
                if pos + nbytes > n:
                    raise SnappyError("truncated literal length")
                length = (
                    int.from_bytes(payload[pos : pos + nbytes], "little") + 1
                )
                pos += nbytes
            if pos + length > n:
                raise SnappyError("truncated literal")
            out += payload[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 7) + 4
            if pos >= n:
                raise SnappyError("truncated copy-1")
            offset = ((tag >> 5) << 8) | payload[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy-2")
            offset = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy-4")
            offset = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError("copy offset out of range")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:
            pattern = bytes(out[len(out) - offset :])
            out += (pattern * (length // offset + 1))[:length]
    if len(out) != total:
        raise SnappyError("decompressed size mismatch")
    return bytes(out)


def encode_snappy_store(content: bytes) -> bytes:
    """Emit valid Snappy using literal elements only (spec-legal)."""
    parts = []
    total = len(content)
    val = total
    while True:
        b = val & 0x7F
        val >>= 7
        parts.append(bytes([b | (0x80 if val else 0)]))
        if not val:
            break
    pos = 0
    while pos < total or (total == 0 and pos == 0 and False):
        length = min(total - pos, 1 << 16)
        if length <= 60:
            parts.append(bytes([(length - 1) << 2]))
        else:
            parts.append(bytes([61 << 2]))
            parts.append((length - 1).to_bytes(2, "little"))
        parts.append(content[pos : pos + length])
        pos += length
    return b"".join(parts)
