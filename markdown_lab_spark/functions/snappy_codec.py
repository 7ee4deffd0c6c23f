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


def encode_snappy(content: bytes) -> bytes:
    """Genuinely compressed Snappy (greedy hash-chain matching, copy-1
    and copy-2 elements). Decodable by any Snappy implementation —
    pinned against the real library in tests."""
    from .lz4_codec import _chain_matches  # noqa: PLC0415

    parts = []
    total = len(content)
    val = total
    while True:
        b = val & 0x7F
        val >>= 7
        parts.append(bytes([b | (0x80 if val else 0)]))
        if not val:
            break

    def emit_literal(lit: bytes) -> None:
        pos = 0
        while pos < len(lit) or (not lit and pos == 0):
            chunk = lit[pos : pos + (1 << 16)]
            if not chunk:
                break
            ln = len(chunk)
            if ln <= 60:
                parts.append(bytes([(ln - 1) << 2]))
            elif ln <= 256:
                parts.append(bytes([60 << 2, ln - 1]))
            else:
                parts.append(bytes([61 << 2]))
                parts.append((ln - 1).to_bytes(2, "little"))
            parts.append(chunk)
            pos += ln

    def emit_copy(offset: int, length: int) -> None:
        while length > 0:
            if length > 64:
                take = 64 if length - 64 >= 4 else length - 4
            else:
                take = length
            if 4 <= take <= 11 and offset < 2048:
                parts.append(
                    bytes(
                        [
                            1 | ((take - 4) << 2) | ((offset >> 8) << 5),
                            offset & 0xFF,
                        ]
                    )
                )
            else:
                parts.append(bytes([2 | ((take - 1) << 2)]))
                parts.append(offset.to_bytes(2, "little"))
            length -= take

    matches, anchor = _chain_matches(content, max_offset=0xFFFF)
    for lit_start, lit_len, offset, mlen in matches:
        if lit_len:
            emit_literal(content[lit_start : lit_start + lit_len])
        emit_copy(offset, mlen)
    if anchor < total:
        emit_literal(content[anchor:])
    return b"".join(parts)
