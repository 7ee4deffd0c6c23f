"""WHATWG charset sniffing + distributed decode: BOM precedence, header
charset, meta prescan (1024-byte window), utf-8 validity heuristic,
windows-1252 fallback incl. the latin1->cp1252 label quirk, and the
Spark mapInPandas integration on WARC-shaped rows."""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions.encoding import (
    decode_bytes,
    decode_html_bytes,
    normalize_label,
    sniff_encoding,
)


def test_bom_wins_over_header_and_meta():
    body = "﻿<meta charset='shift_jis'>héllo".encode("utf-8")
    codec, src = sniff_encoding(body, "text/html; charset=euc-kr")
    assert (codec, src) == ("utf-8-sig", "bom")
    text, _, _ = decode_bytes(body, "text/html; charset=euc-kr")
    assert text == "<meta charset='shift_jis'>héllo"  # BOM stripped


def test_utf16_boms():
    for enc, codec in (("utf-16-le", "utf-16-le"), ("utf-16-be", "utf-16-be")):
        bom = b"\xff\xfe" if enc == "utf-16-le" else b"\xfe\xff"
        body = bom + "grüße".encode(codec)
        text, got, src = decode_bytes(body)
        assert (got, src) == (codec, "bom")
        assert text == "grüße"


def test_header_charset_beats_meta():
    body = "<meta charset='utf-8'>caf\xe9".encode("cp1252")
    text, codec, src = decode_bytes(body, 'text/html; charset="windows-1252"')
    assert (codec, src) == ("cp1252", "header")
    assert text.endswith("café")


def test_meta_prescan_both_forms():
    a = "<meta charset=shift_jis>日本語".encode("shift_jis")
    text, codec, src = decode_bytes(a)
    assert (codec, src) == ("shift_jis", "meta") and text.endswith("日本語")
    b = (
        '<meta http-equiv="Content-Type" content="text/html; charset=euc-jp">'
        "テスト"
    ).encode("euc-jp")
    text, codec, src = decode_bytes(b)
    assert (codec, src) == ("euc-jp", "meta") and text.endswith("テスト")


def test_meta_outside_1024_byte_window_ignored():
    body = b"<!--" + b"x" * 1100 + b"--><meta charset=shift_jis>" + b"\xe9"
    codec, src = sniff_encoding(body)
    assert src == "fallback" and codec == "cp1252"  # \xe9 alone: invalid utf-8


def test_latin1_label_maps_to_cp1252_per_spec():
    assert normalize_label("ISO-8859-1") == "cp1252"
    assert normalize_label("latin1") == "cp1252"
    assert normalize_label("us-ascii") == "cp1252"
    # cp1252-only punctuation in a "latin1"-labeled doc decodes right
    body = b"curly \x93quotes\x94"
    text, codec, _ = decode_bytes(body, "text/html; charset=latin1")
    assert codec == "cp1252" and text == "curly “quotes”"


def test_unknown_label_falls_through():
    body = "plain ascii".encode()
    codec, src = sniff_encoding(body, "text/html; charset=klingon-8")
    assert (codec, src) == ("utf-8", "utf8-valid")


def test_utf8_validity_heuristic_and_fallback():
    assert sniff_encoding("日本語テキスト".encode("utf-8")) == ("utf-8", "utf8-valid")
    codec, src = sniff_encoding(b"caf\xe9 au lait")
    assert (codec, src) == ("cp1252", "fallback")


def test_meta_claiming_utf16_treated_as_utf8():
    body = b"<meta charset=utf-16>ascii body"
    codec, src = sniff_encoding(body)
    assert (codec, src) == ("utf-8", "meta")


def test_replace_never_raises():
    text, codec, _ = decode_bytes(b"<meta charset=utf-8>ok\xff\xfe\xfa tail")
    assert "�" in text and codec == "utf-8"
    assert decode_bytes(None) == (None, None, None)


def test_spark_decode_warc_shaped_rows(spark):
    rows = [
        (1, "text/html; charset=shift_jis", "日本語ページ".encode("shift_jis")),
        (2, "text/html", "<meta charset='gb2312'>中文页面".encode("gbk")),
        (3, "text/html", "caf\xe9 brul\xe9".encode("cp1252")),
        (4, "text/html", "﻿utf8 with bom".encode("utf-8")),
        (5, "text/html", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, mime string, html binary")
    out = {
        r["doc_id"]: r
        for r in decode_html_bytes(df, "html", "mime").collect()
    }
    assert out[1]["text"] == "日本語ページ" and out[1]["enc_source"] == "header"
    assert out[2]["text"].endswith("中文页面") and out[2]["encoding"] == "gbk"
    assert out[3]["text"] == "café brulé" and out[3]["enc_source"] == "fallback"
    assert out[4]["text"] == "utf8 with bom" and out[4]["enc_source"] == "bom"
    assert out[5]["text"] is None
    # input columns preserved, no shuffle in the plan
    plan = (
        decode_html_bytes(df, "html", "mime")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_warc_to_text_pages_end_to_end(spark, tmp_path):
    from datetime import datetime, timezone

    from markdown_lab_spark.sources.warc import encode_warc, warc_text_pages

    ts = datetime(2026, 1, 2, tzinfo=timezone.utc)
    recs = [
        {
            "url": "https://a.example.com/jp",
            "html": "<html>日本語本文</html>".encode("shift_jis"),
            "warc_ts": ts,
            "mime": "text/html; charset=shift_jis",
        },
        {
            "url": "https://a.example.com/legacy",
            "html": b"r\xe9sum\xe9 \x97 dash",  # raw cp1252 bytes
            "warc_ts": ts,
        },
        {
            "url": "https://a.example.com/plain",
            "html": "plain utf-8 ページ".encode("utf-8"),
            "warc_ts": ts,
        },
    ]
    (tmp_path / "f.warc.gz").write_bytes(encode_warc(recs))
    out = {
        r["url"].rsplit("/", 1)[1]: r
        for r in warc_text_pages(spark, str(tmp_path)).collect()
    }
    assert out["jp"]["text"] == "<html>日本語本文</html>"
    assert out["jp"]["enc_source"] == "header"
    assert out["legacy"]["text"] == "résumé — dash"
    assert out["legacy"]["enc_source"] == "fallback"
    assert out["plain"]["enc_source"] == "utf8-valid"
