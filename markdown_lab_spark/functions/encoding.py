"""Charset sniffing + distributed decode for fetched HTTP bodies.

The reference consumes ``requests.Response.text`` (markdown_lab/core/
client.py:181, scraper.py:170), inheriting requests' charset resolution:
Content-Type header charset, else a guess. A crawl engine ingesting raw
bytes (WARC archives, cached bodies) must reproduce that step itself —
this module implements the WHATWG encoding sniffing algorithm (the
behavior browsers and Common-Crawl's WET extraction follow), which is a
superset of what requests does:

1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — wins over everything, per spec;
2. charset parameter of the transport Content-Type header;
3. meta prescan of the first 1024 bytes (``<meta charset=..>`` and
   ``<meta http-equiv=content-type content="..charset=..">``);
4. content heuristic: bytes that validate as UTF-8 are UTF-8;
5. fallback windows-1252 (the WHATWG default for unlabeled content —
   note the spec maps the labels latin1/iso-8859-1/ascii to
   windows-1252 too, because real-web "latin1" documents use the
   0x80-0x9F range as cp1252 punctuation).

Scale shape: pure per-row byte work — an Arrow-batched pandas UDF, no
shuffle, no state; decode errors never abort a job (errors='replace' +
the decoder-boundary ValueError contract for absent codecs).
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

# WHATWG encoding-label normalization (the subset covering the labels
# that appear on the real web; right side is a Python codec name).
# https://encoding.spec.whatwg.org/#names-and-labels (public spec).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    # the spec maps ALL latin1/ascii labels to windows-1252
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "cp1251": "cp1251", "windows-1253": "cp1253",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254",  # per spec
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms932": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "ibm866": "cp866", "cp866": "cp866",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman",
    "tis-620": "cp874", "windows-874": "cp874", "iso-8859-11": "cp874",
}

_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9._\-]+)""")
_META_RE = re.compile(
    rb"""<meta\s[^>]*?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9._\-]+)"""
    rb"""|content\s*=\s*["'][^"']*?charset\s*=\s*([a-zA-Z0-9._\-]+))""",
    re.IGNORECASE | re.DOTALL,
)


def normalize_label(label: str) -> Optional[str]:
    """WHATWG label -> Python codec name, or None for unknown labels
    (unknown labels are IGNORED per spec — sniffing continues)."""
    codec = _LABELS.get(label.strip().lower())
    if codec is None:
        return None
    try:
        codecs.lookup(codec)
    except LookupError:  # pragma: no cover — stdlib ships all of these
        return None
    return codec


def sniff_encoding(
    data: bytes, content_type: Optional[str] = None
) -> Tuple[str, str]:
    """(python_codec, source) for an HTTP body. source is one of
    'bom' | 'header' | 'meta' | 'utf8-valid' | 'fallback'."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"  # BOM consumed by caller slice
    if data[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if content_type:
        m = _CHARSET_RE.search(content_type.encode("latin-1", "replace"))
        if m:
            codec = normalize_label(m.group(1).decode("latin-1"))
            if codec is not None:
                return codec, "header"
    head = data[:1024]
    m = _META_RE.search(head)
    if m:
        label = (m.group(1) or m.group(2)).decode("latin-1")
        codec = normalize_label(label)
        if codec is not None:
            # spec quirk: a meta claiming utf-16 is treated as utf-8
            # (a decodable utf-16 meta means the bytes are NOT utf-16)
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, "meta"
    try:
        data.decode("utf-8")
        return "utf-8", "utf8-valid"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def decode_bytes(
    data: Optional[bytes], content_type: Optional[str] = None
) -> Tuple[Optional[str], Optional[str], Optional[str]]:
    """(text, codec, source); decode errors replace, never raise —
    one adversarial body can't abort a job (decoder-boundary
    contract). None in -> None out."""
    if data is None:
        return None, None, None
    codec, source = sniff_encoding(data, content_type)
    if source == "bom" and codec in ("utf-16-le", "utf-16-be"):
        data = data[2:]
    return data.decode(codec, errors="replace"), codec, source


def decode_html_bytes(
    df: DataFrame,
    bytes_col: str,
    content_type_col: Optional[str] = None,
    out_col: str = "text",
) -> DataFrame:
    """Append (out_col, encoding, enc_source) decoded from a binary
    column. Arrow-batched mapInPandas; per-row byte work only — no
    shuffle, scan-local, so it fuses into the ingest stage."""
    from pyspark.sql.types import StringType, StructField, StructType

    in_cols = df.columns
    sch = StructType(
        list(df.schema.fields)
        + [
            StructField(out_col, StringType()),
            StructField("encoding", StringType()),
            StructField("enc_source", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, codecs_, sources = [], [], []
            cts = (
                pdf[content_type_col]
                if content_type_col is not None
                else [None] * len(pdf)
            )
            for raw, ct in zip(pdf[bytes_col], cts):
                t, c, s = decode_bytes(
                    bytes(raw) if raw is not None else None,
                    ct if isinstance(ct, str) else None,
                )
                texts.append(t)
                codecs_.append(c)
                sources.append(s)
            pdf = pdf.copy()
            pdf[out_col] = texts
            pdf["encoding"] = codecs_
            pdf["enc_source"] = sources
            yield pdf

    return df.mapInPandas(run, sch).select(
        *in_cols, out_col, "encoding", "enc_source"
    )
