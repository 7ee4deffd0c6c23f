"""WARC ingest/egress (sources/warc.py): round-trip, Common-Crawl
member-per-record gzip layout, tolerant-tail contract, and the pages-table
shape feeding the crawl engine."""

import gzip
from datetime import datetime, timezone

from markdown_lab_spark.sources.warc import (
    encode_warc,
    parse_warc_stream,
    read_warc,
    warc_pages_table,
)


def _ts(i=0):
    return datetime(2026, 8, 17, 12, 0, i, tzinfo=timezone.utc)


def _records(n=3):
    return [
        {
            "url": f"https://w.test/p{i}",
            "warc_ts": _ts(i),
            "html": f"<html><body><p>page {i}</p></body></html>".encode(),
        }
        for i in range(n)
    ]


def test_warc_roundtrip_gzip_members():
    recs = _records(3)
    payload = encode_warc(recs)
    # Common-Crawl layout: one gzip member per record
    assert payload[:2] == b"\x1f\x8b"
    assert payload.count(b"\x1f\x8b\x08") >= 3
    got = list(parse_warc_stream(payload))
    assert [r["url"] for r in got] == [r["url"] for r in recs]
    assert [r["html"] for r in got] == [r["html"] for r in recs]
    assert all(r["warc_type"] == "response" for r in got)
    assert all(r["http_status"] == 200 for r in got)
    assert all(r["mime"] == "text/html" for r in got)
    assert got[1]["warc_ts"] == _ts(1)


def test_warc_roundtrip_uncompressed_and_mixed_types():
    recs = _records(2)
    payload = encode_warc(recs, compress=False)
    assert payload.startswith(b"WARC/1.0")
    got = list(parse_warc_stream(payload))
    assert len(got) == 2 and got[0]["html"] == recs[0]["html"]
    # non-response records (warcinfo shape) pass through with raw block
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    got2 = list(parse_warc_stream(info + payload))
    assert got2[0]["warc_type"] == "warcinfo"
    assert got2[0]["http_status"] is None and got2[0]["html"] == b"robots: x"
    assert len(got2) == 3


def test_warc_truncated_tail_is_tolerated():
    """A torn final record (the common failure of interrupted archive
    transfers) ends the stream instead of raising — decoder-boundary
    contract. Both torn-body and torn-gzip-member forms."""
    recs = _records(3)
    plain = encode_warc(recs, compress=False)
    torn = plain[: len(plain) - 30]  # cut into the last record's body
    got = list(parse_warc_stream(torn))
    assert [r["url"] for r in got] == [r["url"] for r in recs[:2]]
    gz = encode_warc(recs)
    torn_gz = gz[: len(gz) - 20]  # cut into the last gzip member
    got_gz = list(parse_warc_stream(torn_gz))
    assert [r["url"] for r in got_gz] == [r["url"] for r in recs[:2]]
    assert list(parse_warc_stream(b"")) == []
    assert list(parse_warc_stream(b"not a warc at all")) == []


def test_read_warc_distributed_and_pages_table(spark, tmp_path):
    """read_warc parses each file inside one task (no shuffle in the
    plan before the parse) and warc_pages_table yields exactly the
    engine's (url, warc_ts, html) input shape — filtered to successful
    HTML responses."""
    recs = _records(4)
    recs[2] = dict(recs[2], http_status=404)  # dropped by pages filter
    recs[3] = dict(recs[3], mime="application/pdf")  # dropped too
    (tmp_path / "a.warc.gz").write_bytes(encode_warc(recs[:2]))
    (tmp_path / "b.warc.gz").write_bytes(encode_warc(recs[2:]))

    rec_df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert rec_df.count() == 4
    plan = rec_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # file -> parse, embarrassingly parallel

    pages = warc_pages_table(spark, str(tmp_path / "*.warc.gz"))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://w.test/p0", "https://w.test/p1"}
    assert bytes(rows["https://w.test/p0"]["html"]) == recs[0]["html"]
    assert pages.columns == ["url", "warc_ts", "html"]


def test_warc_pages_feed_the_crawl_engine(spark, tmp_path):
    """End-to-end: a .warc.gz archive becomes the crawl corpus — the
    source tier the north star's Common-Crawl-style tables are built
    from at ingest."""
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine

    def page(title, links):
        anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{title} body</p>{anchors}</body></html>"
        ).encode()

    recs = [
        {"url": "https://wc.test/", "warc_ts": _ts(0),
         "html": page("root", ["https://wc.test/a"])},
        {"url": "https://wc.test/a", "warc_ts": _ts(1),
         "html": page("leaf", [])},
    ]
    (tmp_path / "c.warc.gz").write_bytes(encode_warc(recs))
    pages = warc_pages_table(spark, str(tmp_path / "c.warc.gz")).select(
        "url", "html"
    )
    out = CrawlEngine(
        spark, pages, CrawlConfig(rps=10.0, wave_seconds=1, max_waves=2)
    ).crawl(["https://wc.test/"])
    tr = {r["canon_url"]: r["status"] for r in out["trace"].collect()}
    assert tr == {"https://wc.test/": "ok", "https://wc.test/a": "ok"}


def test_wet_roundtrip_and_interop(spark, tmp_path):
    from datetime import datetime, timezone

    from markdown_lab_spark.sources.warc import (
        encode_wet,
        parse_warc_stream,
        read_wet,
        write_wet,
    )

    ts = datetime(2026, 3, 4, 5, 6, 7, tzinfo=timezone.utc)
    rows = [
        (f"https://h{i % 3}.example/p{i}", f"extracted text {i} — ページ {i}", ts)
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "url string, text string, warc_ts timestamp"
    ).repartition(4)

    out_dir = str(tmp_path / "wet")
    manifest = write_wet(df, out_dir).collect()
    assert sum(r["n_records"] for r in manifest) == 25
    assert all(r["path"].endswith(".warc.wet.gz") for r in manifest)

    back = read_wet(spark, out_dir)
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == {(u, t) for u, t, _ in rows}
    # timestamps survive the second-resolution WET date format
    # (Spark collects session-local naive datetimes)
    assert {
        r["warc_ts"].replace(tzinfo=timezone.utc) for r in back.collect()
    } == {ts}

    # raw interop: members parse as conversion records
    raw = open(manifest[0]["path"], "rb").read()
    recs = list(parse_warc_stream(raw))
    assert recs and all(r["warc_type"] == "conversion" for r in recs)
    # determinism: same records -> same bytes
    one = [{"url": "https://x.example/a", "text": "t", "warc_ts": ts}]
    assert encode_wet(one) == encode_wet(one)


def test_wet_skips_null_rows(spark, tmp_path):
    from datetime import datetime, timezone

    from markdown_lab_spark.sources.warc import read_wet, write_wet

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("https://a.example/1", "keep", ts), (None, "drop", ts),
         ("https://a.example/2", None, ts),
         ("https://пример.example/3", "drop-too", ts)],
        "url string, text string, warc_ts timestamp",
    ).coalesce(1)
    out_dir = str(tmp_path / "wet2")
    m = write_wet(df, out_dir).collect()
    assert sum(r["n_records"] for r in m) == 1
    assert [r["text"] for r in read_wet(spark, out_dir).collect()] == ["keep"]


def test_warc_pdf_docs_extracts_pdf_records(spark, tmp_path):
    """application/pdf response records in a mixed archive extract to
    text through the in-repo PDF parser; HTML records are ignored;
    corrupt PDFs become error rows."""
    from datetime import datetime, timezone

    from markdown_lab_spark.sources.pdf import encode_pdf
    from markdown_lab_spark.sources.warc import encode_warc, warc_pdf_docs

    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    good = encode_pdf(
        [["A pdf line one.", "And line two."], ["Second page."]],
        filt="flate",
    )
    recs = [
        {"url": "https://a.example/x.html", "warc_ts": ts,
         "html": b"<html><body>hi</body></html>"},
        {"url": "https://a.example/doc.pdf", "warc_ts": ts,
         "html": good, "mime": "application/pdf"},
        {"url": "https://a.example/bad.pdf", "warc_ts": ts,
         "html": b"%PDF-1.4 broken", "mime": "application/pdf"},
    ]
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(encode_warc(recs))
    rows = {r["url"]: r for r in warc_pdf_docs(spark, str(p)).collect()}
    assert set(rows) == {
        "https://a.example/doc.pdf", "https://a.example/bad.pdf"
    }
    ok = rows["https://a.example/doc.pdf"]
    assert ok["n_pages"] == 2
    assert ok["text"] == "A pdf line one.\nAnd line two.\fSecond page."
    assert ok["error"] is None
    bad = rows["https://a.example/bad.pdf"]
    assert bad["text"] is None and bad["error"]


def test_warc_zst_real_compressor_ingest():
    """A .warc.zst written by the REAL zstd (pyarrow) parses through the
    in-repo RFC 8878 decoder — the modern Dolma-style archive layout."""
    import pyarrow as pa

    recs = _records(4)
    plain = encode_warc(recs, compress=False)
    payload = pa.Codec("zstd", compression_level=9).compress(
        plain, asbytes=True
    )
    got = list(parse_warc_stream(payload))
    assert [r["url"] for r in got] == [r["url"] for r in recs]
    assert [r["html"] for r in got] == [r["html"] for r in recs]


def test_warc_zst_torn_tail_is_tolerated():
    import pyarrow as pa

    recs = _records(2)
    a = pa.Codec("zstd").compress(
        encode_warc(recs[:1], compress=False), asbytes=True
    )
    b = pa.Codec("zstd").compress(
        encode_warc(recs[1:], compress=False), asbytes=True
    )
    torn = (a + b)[:-4]  # tear the second frame
    got = list(parse_warc_stream(torn))
    assert [r["url"] for r in got] == [recs[0]["url"]]


def test_warc_xz_lz4_torn_tails_tolerated():
    """Round-5 ADVICE (medium): truncated .warc.xz / .warc.lz4 payloads
    must END the stream (the documented gzip/zstd contract), never
    propagate an IndexError out of the decoders and abort the task.
    Covers the named truncation points: a magic-only xz payload, an lz4
    frame cut before its header checksum, and tears at every byte
    boundary of both containers."""
    import lzma

    import pyarrow as pa

    from markdown_lab_spark.functions.lz4_codec import Lz4Error, decode_lz4_frame
    from markdown_lab_spark.functions.lzma_codec import LzmaError, decode_xz

    recs = _records(2)
    plain = encode_warc(recs, compress=False)
    xz_payload = lzma.compress(plain, format=lzma.FORMAT_XZ)
    lz4_payload = pa.compress(plain, codec="lz4", asbytes=True)

    # decoders raise the TYPED error on the ADVICE's named truncations
    import pytest

    with pytest.raises(LzmaError):
        decode_xz(xz_payload[:6])  # magic only: flags read was unguarded
    with pytest.raises(Lz4Error):
        decode_lz4_frame(lz4_payload[:6])  # cut before header checksum

    # and the stream contract holds at EVERY tear point
    for payload, full_n in ((xz_payload, 2), (lz4_payload, 2)):
        assert len(list(parse_warc_stream(payload))) == full_n
        for cut in range(len(payload)):
            got = list(parse_warc_stream(payload[:cut]))  # must not raise
            assert len(got) <= full_n


def test_warc_lz4_frame_ingest():
    import pyarrow as pa

    recs = _records(2)
    payload = pa.compress(
        encode_warc(recs, compress=False), codec="lz4", asbytes=True
    )
    got = list(parse_warc_stream(payload))
    assert [r["url"] for r in got] == [r["url"] for r in recs]


def test_wet_zstd_egress_roundtrip(spark, tmp_path):
    """write_wet(compression='zstd') publishes .warc.wet.zst via the
    in-repo store encoder; read_wet ingests it back, and the REAL zstd
    decodes the same files (interop both directions)."""
    import glob

    import pyarrow as pa

    from markdown_lab_spark.sources.warc import read_wet, write_wet

    rows = [
        (f"https://w.test/d{i}", f"text body {i}", _ts(i)) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "url string, text string, warc_ts timestamp"
    ).repartition(2)
    out_dir = str(tmp_path / "wet_zst")
    manifest = write_wet(df, out_dir, compression="zstd").collect()
    files = sorted(glob.glob(out_dir + "/*.warc.wet.zst"))
    assert files and sum(r["n_records"] for r in manifest) == 5
    # the real library decodes our frames (pyarrow needs the exact
    # decompressed size; learn it from the in-repo decoder, then make
    # the REAL zstd reproduce the same bytes)
    from markdown_lab_spark.functions.zstd_codec import decode_zstd

    raw = open(files[0], "rb").read()
    mine = decode_zstd(raw)
    plain = pa.Codec("zstd").decompress(
        raw, decompressed_size=len(mine), asbytes=True
    )
    assert plain == mine and plain.startswith(b"WARC/1.0")
    back = read_wet(spark, out_dir)
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == {(u, t) for u, t, _ in rows}
