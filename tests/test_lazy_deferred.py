"""lazy_deferred mode (deep-frontier wave cost (b), ROADMAP): the
standing deferred tail lives in its own per-wave snapshot; each wave
routes only (new candidates + per-host tail heads). Output must equal
the default path exactly — per-host ``top-B(tail ∪ new) ==
top-B(top-B(tail) ∪ new)`` — including under a global wave_fetch_cap
and across checkpoint resume / mode switches."""

import pytest

from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine


def _page(title, links):
    anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<p>{title} body text</p>{anchors}</body></html>"
    ).encode()


@pytest.fixture(scope="module")
def deep_pages(spark):
    """A corpus whose frontier is much deeper than the per-wave budget:
    one mega host with a 60-page hub fanout (budget will be 2), two
    small hosts, and cross links so discovery keeps feeding the tail."""
    rows = {}
    hub_links = [f"https://mega.test/p{i}" for i in range(60)]
    rows["https://mega.test/hub"] = _page("hub", hub_links)
    for i in range(60):
        nxt = [f"https://mega.test/p{(i + 7) % 60}",
               f"https://small{i % 2}.test/s{i % 5}"]
        rows[f"https://mega.test/p{i}"] = _page(f"p{i}", nxt)
    for h in range(2):
        for s in range(5):
            rows[f"https://small{h}.test/s{s}"] = _page(
                f"s{h}-{s}", [f"https://small{h}.test/s{(s + 1) % 5}"]
            )
    return spark.createDataFrame(
        [(u, b) for u, b in rows.items()], "url string, html binary"
    )


SEEDS = ["https://mega.test/hub", "https://small0.test/s0"]


def _trace_set(out):
    return sorted(
        (r["canon_url"], r["wave"], r["depth"], r["status"])
        for r in out["trace"].collect()
    )


def _crawl(spark, pages, ckpt=None, **kw):
    cfg = CrawlConfig(rps=0.4, wave_seconds=5, max_waves=6, **kw)
    return CrawlEngine(spark, pages, cfg, checkpoint_dir=ckpt).crawl(SEEDS)


def test_lazy_deferred_trace_equals_default(spark, deep_pages, tmp_path):
    base = _crawl(spark, deep_pages)
    lazy = _crawl(
        spark, deep_pages, ckpt=str(tmp_path / "lz"), lazy_deferred=True
    )
    assert _trace_set(lazy) == _trace_set(base)
    base_seen = sorted(
        r["canon_url"] for r in base["seen"].select("canon_url").collect()
    )
    lazy_seen = sorted(
        r["canon_url"] for r in lazy["seen"].select("canon_url").collect()
    )
    assert lazy_seen == base_seen


def test_lazy_deferred_with_wave_fetch_cap(spark, deep_pages, tmp_path):
    base = _crawl(spark, deep_pages, wave_fetch_cap=3)
    lazy = _crawl(
        spark, deep_pages, ckpt=str(tmp_path / "lzc"),
        lazy_deferred=True, wave_fetch_cap=3,
    )
    assert _trace_set(lazy) == _trace_set(base)


def test_lazy_frontier_checkpoint_excludes_tail(spark, deep_pages, tmp_path):
    """The win being claimed: frontier_next holds only NEW candidates;
    the tail snapshot holds the rest, and they are disjoint."""
    ck = str(tmp_path / "lzf")
    _crawl(spark, deep_pages, ckpt=ck, lazy_deferred=True)
    fr = spark.read.parquet(f"{ck}/wave=1/frontier_next")
    tail = spark.read.parquet(f"{ck}/wave=1/deferred")
    assert tail.count() > 0, "deep corpus must produce a standing tail"
    overlap = fr.join(tail, on="canon_url", how="inner").count()
    assert overlap == 0
    # deep frontier: the routed checkpoint's frontier is much smaller
    # than the tail it no longer carries
    assert fr.count() < tail.count()


def test_lazy_deferred_resume_identical(spark, deep_pages, tmp_path):
    full = _crawl(
        spark, deep_pages, ckpt=str(tmp_path / "fl"), lazy_deferred=True
    )
    full_trace = _trace_set(full)

    part = str(tmp_path / "pt")
    cfg_short = CrawlConfig(
        rps=0.4, wave_seconds=5, max_waves=3, lazy_deferred=True
    )
    CrawlEngine(spark, deep_pages, cfg_short, checkpoint_dir=part).crawl(SEEDS)
    eng = CrawlEngine(
        spark,
        deep_pages,
        CrawlConfig(rps=0.4, wave_seconds=5, max_waves=6, lazy_deferred=True),
        checkpoint_dir=part,
    )
    resumed = eng.crawl(SEEDS, resume=True)
    early = [t for t in full_trace if t[1] < 3]
    assert sorted(early + _trace_set(resumed)) == full_trace


def test_mode_switch_resume_lazy_to_default(spark, deep_pages, tmp_path):
    """Resuming a lazy checkpoint with lazy_deferred=False must fold the
    tail back into the frontier rather than dropping it."""
    base = _crawl(spark, deep_pages)
    full_trace = _trace_set(base)

    part = str(tmp_path / "sw")
    cfg_short = CrawlConfig(
        rps=0.4, wave_seconds=5, max_waves=3, lazy_deferred=True
    )
    CrawlEngine(spark, deep_pages, cfg_short, checkpoint_dir=part).crawl(SEEDS)
    eng = CrawlEngine(
        spark,
        deep_pages,
        CrawlConfig(rps=0.4, wave_seconds=5, max_waves=6),
        checkpoint_dir=part,
    )
    resumed = eng.crawl(SEEDS, resume=True)
    early = [t for t in full_trace if t[1] < 3]
    assert sorted(early + _trace_set(resumed)) == full_trace


def test_lazy_deferred_bucketed_state(spark, deep_pages, tmp_path):
    """bucketed_state + lazy_deferred: the tail is ALSO committed to a
    canon_url-bucketed snapshot table (state/deferred) so tail scans are
    co-located; output and resume identity unchanged."""
    base = _crawl(spark, deep_pages)
    full = _crawl(
        spark, deep_pages, ckpt=str(tmp_path / "bk"),
        lazy_deferred=True, bucketed_state=True, state_buckets=4,
    )
    full_trace = _trace_set(full)
    assert full_trace == _trace_set(base)

    part = str(tmp_path / "bkp")
    cfg_short = CrawlConfig(
        rps=0.4, wave_seconds=5, max_waves=3,
        lazy_deferred=True, bucketed_state=True, state_buckets=4,
    )
    CrawlEngine(spark, deep_pages, cfg_short, checkpoint_dir=part).crawl(SEEDS)
    eng = CrawlEngine(
        spark,
        deep_pages,
        CrawlConfig(
            rps=0.4, wave_seconds=5, max_waves=6,
            lazy_deferred=True, bucketed_state=True, state_buckets=4,
        ),
        checkpoint_dir=part,
    )
    resumed = eng.crawl(SEEDS, resume=True)
    early = [t for t in full_trace if t[1] < 3]
    assert sorted(early + _trace_set(resumed)) == full_trace


def test_lazy_deferred_without_checkpoint(spark, deep_pages):
    """No checkpoint_dir: the tail lives in a localCheckpoint but still
    stays out of the per-wave route/state plans; output unchanged."""
    base = _crawl(spark, deep_pages)
    lazy = _crawl(spark, deep_pages, lazy_deferred=True)
    assert _trace_set(lazy) == _trace_set(base)
