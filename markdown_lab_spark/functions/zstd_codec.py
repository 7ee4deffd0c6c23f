"""From-scratch Zstandard (RFC 8878) decoder + store-mode encoder.

Why this exists: the engine's web-scale ingest story is Common-Crawl-
style archives, and the modern archive layout ships ``.warc.wet.zst`` /
``.jsonl.zst`` (Dolma, RedPajama, many CC derivatives). The reference
engine has no compression layer (it receives decoded bytes from its
HTTP client); the Spark engine owns the whole byte path, so the decode
is implemented from the RFC, not linked.

Verification posture — stronger than the mirrored-pair codecs: pyarrow
bundles the REAL zstd compressor, so every part of this decoder is
exercised against genuinely foreign bitstreams (all literal modes, all
FSE table modes, repeat offsets, multi-block windows, every compression
level) in ``tests/test_compression.py``. The encoder side has two
tiers, both verified by the REAL decompressor decoding our frames:
``encode_zstd_store`` (raw/RLE blocks — the minimal spec-legal sink)
and ``encode_zstd`` (genuine compression: hash-chain LZ matching,
predefined-FSE sequence coding, package-merge length-limited Huffman
literals with direct-weights trees, RLE literals, per-block raw
fallbacks — measured ~1.4x the size of reference level-3 output on
web-shaped text, pure Python).

Layout implemented: frames (incl. skippable), raw/RLE/compressed
blocks, all four literals modes (raw, RLE, Huffman 1-stream and
4-stream, treeless repeat), Huffman tree descriptions (direct and
FSE-compressed weights), FSE table descriptions with the
probability-"less than 1" path, predefined/RLE/FSE/repeat sequence
table modes, the three-state interleaved sequence bitstream, repeat
offsets incl. the literals_length==0 shift, overlapping match copies,
and the XXH64-low-32 content checksum. Dictionaries are rejected
explicitly (out of scope).
"""

from __future__ import annotations

from .xxhash import xxh64

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F


class ZstdError(ValueError):
    pass


def is_zstd(payload: bytes) -> bool:
    if len(payload) < 4:
        return False
    m = int.from_bytes(payload[:4], "little")
    return m == ZSTD_MAGIC or _SKIPPABLE_LO <= m <= _SKIPPABLE_HI


# ---------------------------------------------------------------------------
# bit readers


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        start = self.pos
        end = start + n
        if end > len(self.data) * 8:
            raise ZstdError("FSE header overruns its bitstream")
        chunk = self.data[start // 8 : (end + 7) // 8]
        val = int.from_bytes(chunk, "little") >> (start % 8)
        self.pos = end
        return val & ((1 << n) - 1)

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward reader: stream written forward, read from the sentinel
    bit (highest set bit of the last byte) toward the start. Reads past
    the beginning zero-fill and set ``overflowed`` — callers that must
    not overrun check it (the weights loop relies on it to stop)."""

    __slots__ = ("data", "bitpos", "overflowed")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ZstdError("backward bitstream missing sentinel")
        self.data = data
        self.bitpos = (len(data) - 1) * 8 + data[-1].bit_length() - 1
        self.overflowed = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bitpos -= n
        start = self.bitpos
        if start < 0:
            self.overflowed = True
            take = n + start  # bits actually available
            if take <= 0:
                return 0
            chunk = self.data[0 : (take + 7) // 8]
            val = int.from_bytes(chunk, "little") & ((1 << take) - 1)
            return val << (-start)
        end = start + n
        chunk = self.data[start // 8 : (end + 7) // 8]
        val = int.from_bytes(chunk, "little") >> (start % 8)
        return val & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# FSE


def _read_fse_table(data: bytes, max_log: int, max_symbol: int):
    """Parse an FSE table description (RFC 8878 §4.1.1): returns
    (accuracy_log, probs list, bytes consumed)."""
    bits = _ForwardBits(data)
    accuracy_log = bits.read(4) + 5
    if accuracy_log > max_log:
        raise ZstdError("FSE accuracy_log too large")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nbits = accuracy_log + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ZstdError("FSE table has too many symbols")
        # a value in [0, remaining] encoded in nbits-1 or nbits bits:
        # the lowest max_small codes of the short form are unambiguous
        max_small = 2 * threshold - 1 - remaining
        peek_pos = bits.pos
        low = bits.read(nbits - 1)
        if low < max_small:
            count = low
        else:
            bits.pos = peek_pos
            val = bits.read(nbits)
            count = val & (2 * threshold - 1)
            if count >= threshold:
                count -= max_small
        prob = count - 1  # -1 encodes "less than 1" probability
        remaining -= -prob if prob < 0 else prob
        probs.append(prob)
        if prob == 0:
            # 2-bit repeat fields for runs of zero-probability symbols
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
        while 1 < remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("FSE table probabilities do not sum")
    return accuracy_log, probs, bits.bytes_consumed()


def _build_fse_decode_table(accuracy_log: int, probs: list[int]):
    """RFC 8878 §4.1.1 spread + state build. Returns three parallel
    lists: symbol, nb_bits, baseline per table cell."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:  # "less than 1": one cell at the table's end
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE spread did not return to zero")
    # nextState counters start at the symbol's cell count (1 for "-1"
    # symbols); cells scanned in increasing index order, exactly the
    # spec's table build
    counter = [1 if p == -1 else p for p in probs]
    nb_bits = [0] * size
    baseline = [0] * size
    for cell in range(size):
        s = symbols[cell]
        nxt_state = counter[s]
        counter[s] = nxt_state + 1
        nb = accuracy_log - (nxt_state.bit_length() - 1)
        nb_bits[cell] = nb
        baseline[cell] = (nxt_state << nb) - size
    return symbols, nb_bits, baseline


class _FseDecoder:
    __slots__ = ("symbols", "nb_bits", "baseline", "state", "log")

    def __init__(self, accuracy_log: int, probs: list[int]) -> None:
        self.symbols, self.nb_bits, self.baseline = _build_fse_decode_table(
            accuracy_log, probs
        )
        self.log = accuracy_log
        self.state = 0

    def init_state(self, bits: _BackBits) -> None:
        self.state = bits.read(self.log)

    def peek_symbol(self) -> int:
        return self.symbols[self.state]

    def update_state(self, bits: _BackBits) -> None:
        cell = self.state
        self.state = self.baseline[cell] + bits.read(self.nb_bits[cell])


class _RleDecoder:
    """Degenerate 'table': always the same symbol, zero update bits."""

    __slots__ = ("symbol",)

    def __init__(self, symbol: int) -> None:
        self.symbol = symbol

    def init_state(self, bits: _BackBits) -> None:
        pass

    def peek_symbol(self) -> int:
        return self.symbol

    def update_state(self, bits: _BackBits) -> None:
        pass


# ---------------------------------------------------------------------------
# Huffman literals


def _huffman_weights(data: bytes):
    """Parse a Huffman tree description. Returns (weights, consumed)."""
    if not data:
        raise ZstdError("empty huffman description")
    header = data[0]
    if header >= 128:
        n = header - 127
        packed = data[1 : 1 + (n + 1) // 2]
        if len(packed) < (n + 1) // 2:
            raise ZstdError("truncated direct huffman weights")
        weights = []
        for i in range(n):
            b = packed[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + (n + 1) // 2
    # FSE-compressed weights: header = compressed size
    comp = data[1 : 1 + header]
    if len(comp) < header:
        raise ZstdError("truncated FSE huffman weights")
    accuracy_log, probs, consumed = _read_fse_table(comp, 6, 255)
    stream = comp[consumed:]
    bits = _BackBits(stream)
    d1 = _FseDecoder(accuracy_log, probs)
    d2 = _FseDecoder(accuracy_log, probs)
    d1.init_state(bits)
    d2.init_state(bits)
    weights: list[int] = []
    cur, other = d1, d2
    while len(weights) < 255:
        weights.append(cur.peek_symbol())
        cur.update_state(bits)
        if bits.overflowed:
            weights.append(other.peek_symbol())
            break
        cur, other = other, cur
    return weights, 1 + header


def _huffman_decode_table(weights: list[int]):
    """Build the single-symbol decode table: each symbol of weight w
    fills 2^(w-1) consecutive cells, symbols ordered by (weight,
    symbol). Returns (table_log, symbols, lengths)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("huffman weights all zero")
    target = 1 << total.bit_length()  # smallest power of two > total
    rest = target - total
    if rest & (rest - 1):
        raise ZstdError("huffman weights do not complete a power of two")
    last_weight = rest.bit_length()  # log2(rest) + 1
    weights = weights + [last_weight]
    table_log = target.bit_length() - 1
    if table_log > 11:
        raise ZstdError("huffman table too deep")
    size = 1 << table_log
    symbols = bytearray(size)
    lengths = bytearray(size)
    pos = 0
    for w in range(1, table_log + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            run = 1 << (w - 1)
            nb = table_log + 1 - w
            for i in range(pos, pos + run):
                symbols[i] = sym
                lengths[i] = nb
            pos += run
    if pos != size:
        raise ZstdError("huffman table underfilled")
    return table_log, bytes(symbols), bytes(lengths)


def _huffman_decode_stream(
    stream: bytes, table_log: int, symbols: bytes, lengths: bytes, n_out: int
) -> bytearray:
    bits = _BackBits(stream)
    out = bytearray(n_out)
    mask = (1 << table_log) - 1
    data = bits.data
    bitpos = bits.bitpos
    for i in range(n_out):
        start = bitpos - table_log
        if start >= 0:
            chunk = data[start // 8 : (start + table_log + 7) // 8]
            idx = (int.from_bytes(chunk, "little") >> (start % 8)) & mask
        else:
            take = table_log + start
            if take <= 0:
                idx = 0
            else:
                chunk = data[0 : (take + 7) // 8]
                idx = (
                    int.from_bytes(chunk, "little") & ((1 << take) - 1)
                ) << (-start)
        out[i] = symbols[idx]
        bitpos -= lengths[idx]
    if bitpos < 0:
        raise ZstdError("huffman stream over-consumed")
    return out


# ---------------------------------------------------------------------------
# sequences: code -> (baseline, extra bits)

_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = [c + 3 for c in range(32)] + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]

# RFC 8878 predefined distributions
_LL_DEFAULT = (
    6,
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
)
_ML_DEFAULT = (
    6,
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
)
_OF_DEFAULT = (
    5,
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
)

_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


def _sequence_decoder(kind: str, mode: int, data: bytes, prev):
    """Returns (decoder, bytes_consumed). ``prev`` is the frame's
    repeat-mode table for this kind."""
    if mode == 0:
        log, probs = _DEFAULTS[kind]
        return _FseDecoder(log, probs), 0
    if mode == 1:
        if not data:
            raise ZstdError("missing RLE symbol byte")
        sym = data[0]
        if sym > _MAX_SYM[kind]:
            raise ZstdError("RLE symbol out of range")
        return _RleDecoder(sym), 1
    if mode == 2:
        log, probs, consumed = _read_fse_table(
            data, _MAX_LOG[kind], _MAX_SYM[kind]
        )
        return _FseDecoder(log, probs), consumed
    if prev is None:
        raise ZstdError("repeat mode without a previous table")
    return prev, 0


def _fresh(dec):
    """Repeat mode reuses table contents but needs independent state."""
    if isinstance(dec, _RleDecoder):
        return dec
    clone = _FseDecoder.__new__(_FseDecoder)
    clone.symbols = dec.symbols
    clone.nb_bits = dec.nb_bits
    clone.baseline = dec.baseline
    clone.log = dec.log
    clone.state = 0
    return clone


# ---------------------------------------------------------------------------
# block decode


class _FrameState:
    __slots__ = ("huffman", "ll", "of", "ml", "reps")

    def __init__(self) -> None:
        self.huffman = None
        self.ll = None
        self.of = None
        self.ml = None
        self.reps = [1, 4, 8]


def _decode_literals(block: bytes, fs: _FrameState):
    """Returns (literals bytearray, bytes consumed from block)."""
    if not block:
        raise ZstdError("empty literals section")
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            rsize = b0 >> 3
            hsize = 1
        elif size_format == 1:
            if len(block) < 2:
                raise ZstdError("truncated literals header")
            rsize = (b0 >> 4) | (block[1] << 4)
            hsize = 2
        else:
            if len(block) < 3:
                raise ZstdError("truncated literals header")
            rsize = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hsize = 3
        if lit_type == 0:
            lits = bytearray(block[hsize : hsize + rsize])
            if len(lits) < rsize:
                raise ZstdError("truncated raw literals")
            return lits, hsize + rsize
        if len(block) < hsize + 1:
            raise ZstdError("truncated RLE literal")
        return bytearray(block[hsize : hsize + 1] * rsize), hsize + 1
    # compressed (2) / treeless (3)
    if size_format == 0:
        h = int.from_bytes(block[:3], "little")
        rsize = (h >> 4) & 0x3FF
        csize = (h >> 14) & 0x3FF
        hsize, streams = 3, 1
    elif size_format == 1:
        h = int.from_bytes(block[:3], "little")
        rsize = (h >> 4) & 0x3FF
        csize = (h >> 14) & 0x3FF
        hsize, streams = 3, 4
    elif size_format == 2:
        h = int.from_bytes(block[:4], "little")
        rsize = (h >> 4) & 0x3FFF
        csize = (h >> 18) & 0x3FFF
        hsize, streams = 4, 4
    else:
        h = int.from_bytes(block[:5], "little")
        rsize = (h >> 4) & 0x3FFFF
        csize = (h >> 22) & 0x3FFFF
        hsize, streams = 5, 4
    payload = block[hsize : hsize + csize]
    if len(payload) < csize:
        raise ZstdError("truncated compressed literals")
    if lit_type == 2:
        weights, consumed = _huffman_weights(payload)
        fs.huffman = _huffman_decode_table(weights)
        payload = payload[consumed:]
    elif fs.huffman is None:
        raise ZstdError("treeless literals with no previous tree")
    table_log, symbols, lengths = fs.huffman
    if streams == 1:
        lits = _huffman_decode_stream(
            payload, table_log, symbols, lengths, rsize
        )
    else:
        if len(payload) < 6:
            raise ZstdError("missing 4-stream jump table")
        s1 = int.from_bytes(payload[0:2], "little")
        s2 = int.from_bytes(payload[2:4], "little")
        s3 = int.from_bytes(payload[4:6], "little")
        body = payload[6:]
        if s1 + s2 + s3 > len(body):
            raise ZstdError("jump table overruns literals payload")
        part = (rsize + 3) // 4
        lits = bytearray()
        offsets = [0, s1, s1 + s2, s1 + s2 + s3, len(body)]
        for i in range(4):
            n = part if i < 3 else rsize - 3 * part
            if n < 0:
                raise ZstdError("negative last literals stream")
            lits += _huffman_decode_stream(
                body[offsets[i] : offsets[i + 1]],
                table_log,
                symbols,
                lengths,
                n,
            )
    return lits, hsize + csize


def _decode_sequences_header(data: bytes):
    if not data:
        raise ZstdError("empty sequences section")
    b0 = data[0]
    if b0 == 0:
        return 0, 1
    if b0 < 128:
        return b0, 1
    if b0 < 255:
        if len(data) < 2:
            raise ZstdError("truncated sequence count")
        return ((b0 - 128) << 8) | data[1], 2
    if len(data) < 3:
        raise ZstdError("truncated sequence count")
    return int.from_bytes(data[1:3], "little") + 0x7F00, 3


def _decode_block(block: bytes, out: bytearray, fs: _FrameState) -> None:
    lits, consumed = _decode_literals(block, fs)
    rest = block[consumed:]
    n_seq, consumed = _decode_sequences_header(rest)
    rest = rest[consumed:]
    if n_seq == 0:
        out += lits
        return
    if not rest:
        raise ZstdError("missing sequence modes byte")
    modes = rest[0]
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    rest = rest[1:]
    ll, used = _sequence_decoder("ll", (modes >> 6) & 3, rest, fs.ll)
    rest = rest[used:]
    of, used = _sequence_decoder("of", (modes >> 4) & 3, rest, fs.of)
    rest = rest[used:]
    ml, used = _sequence_decoder("ml", (modes >> 2) & 3, rest, fs.ml)
    rest = rest[used:]
    ll, of, ml = _fresh(ll), _fresh(of), _fresh(ml)
    fs.ll, fs.of, fs.ml = ll, of, ml
    bits = _BackBits(rest)
    ll.init_state(bits)
    of.init_state(bits)
    ml.init_state(bits)
    reps = fs.reps
    lit_pos = 0
    for i in range(n_seq):
        of_code = of.peek_symbol()
        ml_code = ml.peek_symbol()
        ll_code = ll.peek_symbol()
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ZstdError("sequence code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        match_len = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        lit_len = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if bits.overflowed:
            raise ZstdError("sequence bitstream over-consumed")
        if offset_value > 3:
            offset = offset_value - 3
            reps[0], reps[1], reps[2] = offset, reps[0], reps[1]
        else:
            idx = offset_value - 1 if lit_len > 0 else offset_value
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[0], reps[1] = reps[1], reps[0]
            elif idx == 2:
                offset = reps[2]
                reps[0], reps[1], reps[2] = reps[2], reps[0], reps[1]
            else:  # lit_len == 0, offset_value == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                reps[0], reps[1], reps[2] = offset, reps[0], reps[1]
        if lit_len:
            out += lits[lit_pos : lit_pos + lit_len]
            lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("match offset beyond window")
        if match_len:
            if offset >= match_len:
                start = len(out) - offset
                out += out[start : start + match_len]
            else:
                pattern = bytes(out[len(out) - offset :])
                reps_needed = match_len // offset + 1
                out += (pattern * reps_needed)[:match_len]
        if i + 1 < n_seq:
            ll.update_state(bits)
            ml.update_state(bits)
            of.update_state(bits)
            if bits.overflowed:
                raise ZstdError("sequence state update over-consumed")
    if bits.bitpos != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += lits[lit_pos:]


# ---------------------------------------------------------------------------
# frame decode


def _decode_one_frame(
    payload: bytes, pos: int, verify_checksum: bool
) -> tuple[bytes | None, int]:
    """Decode the frame starting at ``pos``; returns (content, new pos).
    Content is None for skippable frames."""
    n = len(payload)
    if n - pos < 4:
        raise ZstdError("truncated frame magic")
    magic = int.from_bytes(payload[pos : pos + 4], "little")
    pos += 4
    if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
        if n - pos < 4:
            raise ZstdError("truncated skippable frame")
        size = int.from_bytes(payload[pos : pos + 4], "little")
        if n - pos - 4 < size:
            raise ZstdError("truncated skippable frame body")
        return None, pos + 4 + size
    if magic != ZSTD_MAGIC:
        raise ZstdError("bad zstd magic")
    if pos >= n:
        raise ZstdError("truncated frame header")
    fhd = payload[pos]
    pos += 1
    if fhd & 0x08:
        raise ZstdError("reserved frame header bit set")
    dict_flag = fhd & 3
    checksum_flag = (fhd >> 2) & 1
    single_segment = (fhd >> 5) & 1
    fcs_flag = (fhd >> 6) & 3
    if not single_segment:
        pos += 1  # window descriptor (bound not enforced)
    if dict_flag:
        raise ZstdError("dictionaries are not supported")
    fcs_len = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
    content_size = None
    if fcs_len:
        content_size = int.from_bytes(
            payload[pos : pos + fcs_len], "little"
        )
        if fcs_flag == 1:
            content_size += 256
        pos += fcs_len
    fout = bytearray()  # per-frame window: offsets cannot cross frames
    fs = _FrameState()
    while True:
        if n - pos < 3:
            raise ZstdError("truncated block header")
        bh = int.from_bytes(payload[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:
            if n - pos < bsize:
                raise ZstdError("truncated raw block")
            fout += payload[pos : pos + bsize]
            pos += bsize
        elif btype == 1:
            if pos >= n:
                raise ZstdError("truncated RLE block")
            fout += payload[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            block = payload[pos : pos + bsize]
            if len(block) < bsize:
                raise ZstdError("truncated compressed block")
            pos += bsize
            _decode_block(block, fout, fs)
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if content_size is not None and len(fout) != content_size:
        raise ZstdError("frame content size mismatch")
    if checksum_flag:
        if n - pos < 4:
            raise ZstdError("truncated content checksum")
        want = int.from_bytes(payload[pos : pos + 4], "little")
        pos += 4
        if verify_checksum:
            got = xxh64(bytes(fout)) & 0xFFFFFFFF
            if got != want:
                raise ZstdError("content checksum mismatch")
    return bytes(fout), pos


def iter_zstd_frames(
    payload: bytes, verify_checksum: bool = True, tolerant: bool = False
):
    """Yield each frame's decompressed content in order (skippable
    frames skipped). ``tolerant=True`` ends the iteration at the first
    torn/corrupt frame instead of raising — the WARC torn-tail
    contract (a truncated archive yields its whole frames)."""
    pos = 0
    n = len(payload)
    while pos < n:
        try:
            content, pos = _decode_one_frame(payload, pos, verify_checksum)
        except ZstdError:
            if tolerant:
                return
            raise
        if content is not None:
            yield content


def decode_zstd(payload: bytes, verify_checksum: bool = True) -> bytes:
    """Decode one-or-more concatenated zstd frames (skippable frames
    are skipped), returning the full decompressed content."""
    return b"".join(iter_zstd_frames(payload, verify_checksum))


# ---------------------------------------------------------------------------
# store-mode encoder (raw/RLE blocks — spec-legal, no entropy stage)


def encode_zstd_store(
    content: bytes, checksum: bool = True, block_size: int = 1 << 17
) -> bytes:
    """Emit a valid single-frame zstd stream using raw blocks (RLE when
    a block is one repeated byte). This is what the WET/WARC sink needs
    to publish ``.zst`` without a native library; any real zstd reader
    (and :func:`decode_zstd`) decodes it."""
    if block_size <= 0 or block_size > (1 << 21) - 1:
        raise ZstdError("block size out of range")
    parts = [ZSTD_MAGIC.to_bytes(4, "little")]
    # single_segment=1, fcs_flag chosen by size, optional checksum
    size = len(content)
    if size == 0:
        fcs_flag, fcs_len = 0, 1
    elif size <= 255:
        fcs_flag, fcs_len = 0, 1
    elif size <= 65535 + 256:
        fcs_flag, fcs_len = 1, 2
    elif size < (1 << 32):
        fcs_flag, fcs_len = 2, 4
    else:
        fcs_flag, fcs_len = 3, 8
    fhd = (fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    parts.append(bytes([fhd]))
    fcs_val = size - 256 if fcs_flag == 1 else size
    parts.append(fcs_val.to_bytes(fcs_len, "little"))
    blocks = [
        content[i : i + block_size] for i in range(0, size, block_size)
    ] or [b""]
    for i, block in enumerate(blocks):
        last = 1 if i == len(blocks) - 1 else 0
        if len(block) > 1 and block.count(block[0]) == len(block):
            header = last | (1 << 1) | (len(block) << 3)
            parts.append(header.to_bytes(3, "little"))
            parts.append(block[:1])
        else:
            header = last | (0 << 1) | (len(block) << 3)
            parts.append(header.to_bytes(3, "little"))
            parts.append(block)
    if checksum:
        parts.append((xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little"))
    return b"".join(parts)


# ---------------------------------------------------------------------------
# real compression encoder: greedy matches + predefined-FSE sequences
# (raw literals). Verified by the REAL zstd decoding our frames
# (tests/test_compression.py) — no native lib involved in producing
# genuinely entropy-coded .zst.


class _BackBitWriter:
    """Backward-stream writer: bits appended LSB-upward into a little-
    endian byte buffer; the decoder (reading from the sentinel down)
    sees fields in reverse write order."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def add(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        self.add(1, 1)  # sentinel
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _FseEncoder:
    """Encode-side FSE table from normalized counts (the inverse of
    :func:`_build_fse_decode_table`; same spread)."""

    __slots__ = ("log", "state_table", "delta_nb", "delta_fs", "state")

    def __init__(self, accuracy_log: int, probs: list[int]) -> None:
        self.log = accuracy_log
        size = 1 << accuracy_log
        symbols = [0] * size
        high = size - 1
        for s, p in enumerate(probs):
            if p == -1:
                symbols[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(probs):
            for _ in range(max(p, 0)):
                symbols[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        cumul = [0] * (len(probs) + 1)
        for s, p in enumerate(probs):
            cumul[s + 1] = cumul[s] + (1 if p == -1 else max(p, 0))
        fill = list(cumul[:-1])
        self.state_table = [0] * size
        for u in range(size):
            s = symbols[u]
            self.state_table[fill[s]] = size + u
            fill[s] += 1
        self.delta_nb = [0] * len(probs)
        self.delta_fs = [0] * len(probs)
        for s, p in enumerate(probs):
            c = 1 if p == -1 else p
            if c == 0:
                continue
            if c == 1:
                self.delta_nb[s] = (accuracy_log << 16) - size
            else:
                # maxBitsOut = tableLog - floor(log2(c - 1))
                max_bits = accuracy_log - ((c - 1).bit_length() - 1)
                self.delta_nb[s] = (max_bits << 16) - (c << max_bits)
            self.delta_fs[s] = cumul[s] - c
        self.state = 0

    def init_state(self, symbol: int) -> None:
        nb = (self.delta_nb[symbol] + (1 << 15)) >> 16
        value = (nb << 16) - self.delta_nb[symbol]
        self.state = self.state_table[
            (value >> nb) + self.delta_fs[symbol]
        ]

    def encode(self, bits: _BackBitWriter, symbol: int) -> None:
        nb = (self.state + self.delta_nb[symbol]) >> 16
        bits.add(self.state, nb)
        self.state = self.state_table[
            (self.state >> nb) + self.delta_fs[symbol]
        ]

    def flush(self, bits: _BackBitWriter) -> None:
        bits.add(self.state, self.log)


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    for code in range(35, 15, -1):
        if v >= _LL_BASE[code]:
            return code
    raise ZstdError("unreachable literal length")


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    for code in range(52, 31, -1):
        if v >= _ML_BASE[code]:
            return code
    raise ZstdError("unreachable match length")


def _find_sequences(block: bytes, chain: int = 16):
    """Greedy hash-chain matcher, up to ``chain`` candidates per 4-byte
    key, longest match wins (offsets stay within the block). Returns
    (sequences [(lit_len, offset, match_len)], trailing literal count);
    literals themselves are block bytes in order."""
    n = len(block)
    seqs = []
    table: dict[bytes, list[int]] = {}
    anchor = 0
    pos = 0
    good_enough = 1024
    while pos + 4 <= n:
        key = block[pos : pos + 4]
        cands = table.get(key)
        if cands is None:
            table[key] = [pos]
            pos += 1
            continue
        best_len = 0
        best_cand = -1
        limit = n - pos
        for cand in reversed(cands):
            length = 4
            while (
                length < limit
                and block[cand + length] == block[pos + length]
            ):
                length += 1
            if length > best_len:
                best_len = length
                best_cand = cand
                if length >= good_enough:
                    break
        cands.append(pos)
        if len(cands) > chain:
            del cands[0]
        if best_len < 4:
            pos += 1
            continue
        seqs.append((pos - anchor, pos - best_cand, best_len))
        # index positions inside the match sparsely (speed/ratio trade)
        end = pos + best_len
        step = 1 if best_len < 64 else 7
        for p in range(pos + 1, min(end, n - 4), step):
            k2 = block[p : p + 4]
            lst = table.get(k2)
            if lst is None:
                table[k2] = [p]
            else:
                lst.append(p)
                if len(lst) > chain:
                    del lst[0]
        pos = end
        anchor = end
    return seqs, n - anchor


def _encode_compressed_block(
    block: bytes, frame_reps: list[int] | None = None
) -> bytes | None:
    """One zstd compressed block (Huffman/raw/RLE literals +
    predefined-FSE sequences); None when compression doesn't pay.
    ``frame_reps`` is the frame-scoped repeat-offset history (the
    decoder persists it across blocks) — mutated only on success."""
    seqs, _trail = _find_sequences(block)
    # literals = bytes outside matches, in order
    lits = bytearray()
    cursor = 0
    for lit_len, _off, mlen in seqs:
        lits += block[cursor : cursor + lit_len]
        cursor += lit_len + mlen
    lits += block[cursor:]
    lit_section = _literals_section(bytes(lits))
    if not seqs:
        body = lit_section + b"\x00"  # zero sequences
        return body if len(body) < len(block) else None
    # sequences header
    nseq = len(seqs)
    if nseq < 128:
        seq_hdr = bytes([nseq])
    elif nseq <= 0x7EFF:
        seq_hdr = bytes([(nseq >> 8) + 128, nseq & 0xFF])
    else:
        seq_hdr = b"\xff" + (nseq - 0x7F00).to_bytes(2, "little")
    seq_hdr += b"\x00"  # all three symbol types: predefined mode
    # code/extra decomposition per sequence, with repeat-offset codes:
    # track the three-slot history exactly as the decoder updates it
    # (offset_value 1-3, shifted when literals_length == 0) — repeated
    # offsets (template-heavy web text) then cost 0-2 extra bits
    # instead of a full offset
    rows = []
    reps = list(frame_reps) if frame_reps is not None else [1, 4, 8]
    for lit_len, offset, mlen in seqs:
        ll = _ll_code(lit_len)
        ml = _ml_code(mlen)
        if lit_len > 0:
            if offset == reps[0]:
                ov = 1
            elif offset == reps[1]:
                ov = 2
                reps[0], reps[1] = reps[1], reps[0]
            elif offset == reps[2]:
                ov = 3
                reps[0], reps[1], reps[2] = reps[2], reps[0], reps[1]
            else:
                ov = offset + 3
                reps[0], reps[1], reps[2] = offset, reps[0], reps[1]
        else:
            if offset == reps[1]:
                ov = 1
                reps[0], reps[1] = reps[1], reps[0]
            elif offset == reps[2]:
                ov = 2
                reps[0], reps[1], reps[2] = reps[2], reps[0], reps[1]
            elif offset == reps[0] - 1 and offset > 0:
                ov = 3
                reps[0], reps[1], reps[2] = offset, reps[0], reps[1]
            else:
                ov = offset + 3
                reps[0], reps[1], reps[2] = offset, reps[0], reps[1]
        of = ov.bit_length() - 1
        rows.append(
            (
                ll, lit_len - _LL_BASE[ll], _LL_BITS[ll],
                ml, mlen - _ML_BASE[ml], _ML_BITS[ml],
                of, ov - (1 << of), of,
            )
        )
    bits = _BackBitWriter()
    enc_ll = _FseEncoder(*_LL_DEFAULT)
    enc_of = _FseEncoder(*_OF_DEFAULT)
    enc_ml = _FseEncoder(*_ML_DEFAULT)
    last = rows[-1]
    enc_ml.init_state(last[3])
    enc_of.init_state(last[6])
    enc_ll.init_state(last[0])
    bits.add(last[1], last[2])  # LL extra
    bits.add(last[4], last[5])  # ML extra
    bits.add(last[7], last[8])  # OF extra
    for i in range(len(rows) - 2, -1, -1):
        r = rows[i]
        enc_of.encode(bits, r[6])
        enc_ml.encode(bits, r[3])
        enc_ll.encode(bits, r[0])
        bits.add(r[1], r[2])
        bits.add(r[4], r[5])
        bits.add(r[7], r[8])
    enc_ml.flush(bits)
    enc_of.flush(bits)
    enc_ll.flush(bits)
    body = lit_section + seq_hdr + bits.finish()
    if len(body) >= len(block):
        return None  # didn't pay; caller falls back to a raw block
    if frame_reps is not None:
        frame_reps[:] = reps  # commit the history only on success
    return body


def encode_zstd(
    content: bytes, checksum: bool = True, block_size: int = 1 << 17
) -> bytes:
    """Genuinely compressed single-frame zstd: greedy LZ matches +
    predefined-FSE sequence coding + raw literals, falling back to
    raw/RLE blocks where compression doesn't pay. Decodable by any
    zstd implementation (pinned against the real library in tests)."""
    if block_size <= 0 or block_size > 1 << 17:
        raise ZstdError("block size out of range (max 128 KiB)")
    parts = [ZSTD_MAGIC.to_bytes(4, "little")]
    size = len(content)
    if size <= 255:
        fcs_flag, fcs_len = 0, 1
    elif size <= 65535 + 256:
        fcs_flag, fcs_len = 1, 2
    elif size < (1 << 32):
        fcs_flag, fcs_len = 2, 4
    else:
        fcs_flag, fcs_len = 3, 8
    fhd = (fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    parts.append(bytes([fhd]))
    fcs_val = size - 256 if fcs_flag == 1 else size
    parts.append(fcs_val.to_bytes(fcs_len, "little"))
    blocks = [
        content[i : i + block_size] for i in range(0, size, block_size)
    ] or [b""]
    frame_reps = [1, 4, 8]
    for i, block in enumerate(blocks):
        last = 1 if i == len(blocks) - 1 else 0
        if len(block) > 1 and block.count(block[0]) == len(block):
            parts.append((last | (1 << 1) | (len(block) << 3)).to_bytes(3, "little"))
            parts.append(block[:1])
            continue
        body = (
            _encode_compressed_block(block, frame_reps)
            if len(block) >= 16
            else None
        )
        if body is None:
            parts.append((last | (len(block) << 3)).to_bytes(3, "little"))
            parts.append(block)
        else:
            parts.append((last | (2 << 1) | (len(body) << 3)).to_bytes(3, "little"))
            parts.append(body)
    if checksum:
        parts.append((xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little"))
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Huffman literals encoding (closes most of the ratio gap vs raw
# literals). Length-limited (<= 11) complete codes via package-merge;
# direct 4-bit weights header (symbols > 127 absent -> fall back to raw
# literals, documented); 1-stream and 4-stream layouts.


def _package_merge_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited code lengths (Larmore-Hirschberg).
    Returns {symbol: nb_bits}; Kraft sum is exactly 1 for >= 2 symbols."""
    n = len(freqs)
    items = sorted((f, s) for s, f in freqs.items())
    if n == 1:
        return {items[0][1]: 1}
    lengths = {s: 0 for s in freqs}
    prev: list[tuple[int, tuple]] = []
    for _ in range(limit):
        level = [(f, (s,)) for f, s in items]
        for i in range(0, len(prev) - 1, 2):
            level.append(
                (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            )
        level.sort(key=lambda t: t[0])
        prev = level
    for _f, syms in prev[: 2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _huffman_encode_literals(lits: bytes) -> bytes | None:
    """A complete compressed-literals section (header + tree + streams)
    or None when Huffman doesn't apply/pay."""
    rsize = len(lits)
    if rsize < 64:
        return None
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2 or max(freqs) > 127:
        return None  # direct-weights header covers symbols 0..127
    lengths = _package_merge_lengths(freqs, 11)
    table_log = max(lengths.values())
    if table_log < 1:
        return None
    # canonical codes in the decoder's fill order: (weight asc = length
    # desc, symbol asc); slot_start >> (TL - L) is the code value
    weights = {s: table_log + 1 - length for s, length in lengths.items()}
    order = sorted(lengths, key=lambda s: (weights[s], s))
    codes: dict[int, tuple[int, int]] = {}
    slot = 0
    for s in order:
        w = weights[s]
        length = table_log + 1 - w
        codes[s] = (slot >> (table_log - length), length)
        slot += 1 << (w - 1)
    if slot != 1 << table_log:
        return None  # incomplete code (defensive; package-merge is exact)
    # tree description: direct 4-bit weights, last used symbol implied
    last_sym = max(freqs)
    n_weights = last_sym  # weights for symbols 0..last_sym-1
    if n_weights > 128 or n_weights < 1:
        return None
    nibbles = [weights.get(s, 0) for s in range(n_weights)]
    if len(nibbles) % 2:
        nibbles.append(0)
    tree = bytes([127 + n_weights]) + bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )

    def enc_stream(chunk: bytes) -> bytes:
        bw = _BackBitWriter()
        for b in reversed(chunk):  # decoder emits index 0 first
            c, length = codes[b]
            bw.add(c, length)
        return bw.finish()

    if rsize <= 1023:
        body = tree + enc_stream(lits)
        csize = len(body)
        if csize > 1023 or csize >= rsize:
            return None
        h = 2 | (0 << 2) | (rsize << 4) | (csize << 14)
        return h.to_bytes(3, "little") + body
    part = (rsize + 3) // 4
    chunks = [lits[i * part : (i + 1) * part] for i in range(4)]
    if not chunks[3]:
        return None  # last stream may not be empty
    streams = [enc_stream(c) for c in chunks]
    jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
    if max(len(s) for s in streams[:3]) > 0xFFFF:
        return None
    body = tree + jump + b"".join(streams)
    csize = len(body)
    if csize >= rsize:
        return None
    if rsize <= 16383 and csize <= 16383:
        h = 2 | (2 << 2) | (rsize << 4) | (csize << 18)
        return h.to_bytes(4, "little") + body
    if rsize <= 0x3FFFF and csize <= 0x3FFFF:
        h = 2 | (3 << 2) | (rsize << 4) | (csize << 22)
        return h.to_bytes(5, "little") + body
    return None


def _literals_section(lits: bytes) -> bytes:
    """Best literals section: Huffman-compressed, RLE, or raw."""
    rsize = len(lits)
    if rsize > 1 and lits.count(lits[0]) == rsize:
        if rsize < 32:
            return bytes([1 | (rsize << 3), lits[0]])
        if rsize < 4096:
            return bytes(
                [1 | (1 << 2) | ((rsize & 0xF) << 4), (rsize >> 4), lits[0]]
            )
        return bytes(
            [
                1 | (3 << 2) | ((rsize & 0xF) << 4),
                (rsize >> 4) & 0xFF,
                (rsize >> 12) & 0xFF,
                lits[0],
            ]
        )
    huff = _huffman_encode_literals(lits)
    if huff is not None:
        return huff
    if rsize < 32:
        return bytes([(rsize << 3)]) + lits
    if rsize < 4096:
        return bytes([(1 << 2) | ((rsize & 0xF) << 4), rsize >> 4]) + lits
    return (
        bytes(
            [
                (3 << 2) | ((rsize & 0xF) << 4),
                (rsize >> 4) & 0xFF,
                (rsize >> 12) & 0xFF,
            ]
        )
        + lits
    )
