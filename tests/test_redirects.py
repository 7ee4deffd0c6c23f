"""Meta-refresh redirect resolution: extraction forms, chain collapse,
cycle/depth flagging, effective-pages content substitution, crawl
composition."""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.frontier.redirects import (
    effective_pages,
    meta_refresh_targets,
    resolve_redirects,
)


def _redir(target):
    return f'<html><head><meta http-equiv="refresh" content="0; url={target}"></head></html>'


def _content(name):
    return f"<html><body><h1>{name}</h1><a href='/next-{name}'>n</a></body></html>"


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_targets_extraction(spark):
    rows = [
        ("https://a.example/1", _redir("/dest")),
        ("https://a.example/2", _redir("https://b.example/x")),
        ("https://a.example/3", _content("plain")),
        ("https://a.example/4", _redir("https://a.example/4")),  # self
        ("https://a.example/5", None),
    ]
    got = {
        (r["url"], r["target"])
        for r in meta_refresh_targets(_pages(spark, rows)).collect()
    }
    assert got == {
        ("https://a.example/1", "https://a.example/dest"),
        ("https://a.example/2", "https://b.example/x"),
    }


def test_chain_collapse_and_flags(spark):
    edges = spark.createDataFrame(
        [
            ("A", "B"), ("B", "C"),          # chain to content C
            ("P", "Q"), ("Q", "P"),          # 2-cycle
            ("D1", "D2"), ("D2", "D3"), ("D3", "D4"),
            ("D4", "D5"), ("D5", "D6"), ("D6", "D7"),  # longer than hops
        ],
        "url string, target string",
    )
    res = {r["url"]: r for r in resolve_redirects(edges, max_hops=4).collect()}
    assert res["A"]["final_url"] == "C" and res["A"]["resolved"]
    assert res["A"]["hops"] == 2
    assert res["B"]["final_url"] == "C" and res["B"]["resolved"]
    assert not res["P"]["resolved"] and not res["Q"]["resolved"]
    assert not res["D1"]["resolved"]  # 6 hops > max_hops=4
    assert res["D4"]["final_url"] == "D7" and res["D4"]["resolved"]


def test_effective_pages_substitution(spark):
    rows = [
        ("https://a.example/start", _redir("/mid")),
        ("https://a.example/mid", _redir("/end")),
        ("https://a.example/end", _content("end")),
        ("https://a.example/loop1", _redir("/loop2")),
        ("https://a.example/loop2", _redir("/loop1")),
        ("https://a.example/plain", _content("plain")),
        ("https://a.example/dangling", _redir("/missing")),
    ]
    out = {
        r["url"]: r["html"]
        for r in effective_pages(_pages(spark, rows)).collect()
    }
    assert out["https://a.example/start"] == _content("end")
    assert out["https://a.example/mid"] == _content("end")
    assert out["https://a.example/end"] == _content("end")
    assert out["https://a.example/plain"] == _content("plain")
    # cycles keep their shell html
    assert out["https://a.example/loop1"] == _redir("/loop2")
    # a resolved chain whose target is NOT in the corpus keeps the shell
    # (the inner content join has nothing to attach)
    assert out["https://a.example/dangling"] == _redir("/missing")
    assert len(out) == len(rows)  # pass-through preserves every row


def test_crawl_composition(spark):
    # crawling the EFFECTIVE corpus: fetching the redirect URL yields the
    # target's content, so its links (not the empty shell) expand
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine

    rows = [
        ("https://h.example/seed", _redir("/real")),
        ("https://h.example/real", _content("real")),
        ("https://h.example/next-real", _content("leaf")),
    ]
    pages = effective_pages(_pages(spark, rows)).withColumn(
        "text", F.lit("t")
    )
    out = CrawlEngine(
        spark, pages, CrawlConfig(rps=2.0, wave_seconds=5, max_waves=3)
    ).crawl(["https://h.example/seed"])
    ok = {
        r["canon_url"]
        for r in out["trace"].filter(F.col("status") == "ok").collect()
    }
    # the seed (shell) fetched real's content -> /next-real discovered
    assert "https://h.example/seed" in ok
    assert "https://h.example/next-real" in ok
