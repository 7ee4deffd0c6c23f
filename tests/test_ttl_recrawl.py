"""P3 TTL/re-crawl semantics (markdown_lab/core/cache.py:60-141: cached
entries expire after the TTL, then the URL is fetched again).

Wave-time mapping: a URL seen at wave w is blocked while
wave - w < ttl_waves and re-fetched at the first rediscovery afterwards.
The seen prefilter in this mode is the deletable cuckoo filter
(frontier/cuckoo.py): expired keys are deleted, fresh fetches re-insert.
"""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def cycle_pages(spark):
    """Two pages linking to each other — the minimal re-crawl cycle."""

    def page(title, other):
        return (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{title} content paragraph</p>"
            f'<a href="https://h1.test/{other}">{other}</a></body></html>'
        ).encode()

    rows = [
        ("https://h1.test/a", page("alpha", "b")),
        ("https://h1.test/b", page("beta", "a")),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def _trace(out):
    return sorted(
        (r["canon_url"], r["wave"], r["status"])
        for r in out["trace"].collect()
    )


def test_expired_urls_refetched_fresh_ones_not(spark, cycle_pages):
    engine = CrawlEngine(
        spark,
        cycle_pages,
        CrawlConfig(rps=1.0, wave_seconds=5, max_waves=3, ttl_waves=2),
    )
    out = engine.crawl(["https://h1.test/a"])
    # wave 0: fetch a (discovers b); wave 1: fetch b (rediscovers a, but a
    # is still fresh: 1-0 < 2); wave 2: a expired (2-0 >= 2) -> re-fetched
    assert _trace(out) == [
        ("https://h1.test/a", 0, "ok"),
        ("https://h1.test/a", 2, "ok"),
        ("https://h1.test/b", 1, "ok"),
    ]
    # the compacted seen set keeps the LATEST wave per url
    seen = {
        r["canon_url"]: r["status_wave"]
        for r in out["seen"].collect()
    }
    assert seen == {"https://h1.test/a": 2, "https://h1.test/b": 1}


def test_no_refetch_without_ttl(spark, cycle_pages):
    engine = CrawlEngine(
        spark,
        cycle_pages,
        CrawlConfig(rps=1.0, wave_seconds=5, max_waves=4),
    )
    out = engine.crawl(["https://h1.test/a"])
    assert _trace(out) == [
        ("https://h1.test/a", 0, "ok"),
        ("https://h1.test/b", 1, "ok"),
    ]


def test_ttl_chunks_carry_both_fetches(spark, cycle_pages):
    engine = CrawlEngine(
        spark,
        cycle_pages,
        CrawlConfig(rps=1.0, wave_seconds=5, max_waves=3, ttl_waves=2),
    )
    out = engine.crawl(["https://h1.test/a"])
    waves_of_a = sorted(
        r["wave"]
        for r in out["chunks"]
        .filter(F.col("canon_url") == "https://h1.test/a")
        .select("wave")
        .dropDuplicates()
        .collect()
    )
    assert waves_of_a == [0, 2]


def test_ttl_resume_reseeds_cuckoo(spark, cycle_pages, tmp_path):
    """Resume in TTL mode: the cuckoo filter is re-seeded from the
    checkpointed seen set's FRESH rows, and expiry keeps working across
    the restart (a, seen at wave 0, must be re-fetched at wave 2 by the
    resumed engine)."""
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(rps=1.0, wave_seconds=5, max_waves=2, ttl_waves=2)
    CrawlEngine(spark, cycle_pages, cfg, checkpoint_dir=ckpt).crawl(
        ["https://h1.test/a"]
    )

    cfg2 = CrawlConfig(rps=1.0, wave_seconds=5, max_waves=3, ttl_waves=2)
    out = CrawlEngine(spark, cycle_pages, cfg2, checkpoint_dir=ckpt).crawl(
        [], resume=True
    )
    assert ("https://h1.test/a", 2, "ok") in _trace(out)
