"""Link-graph PageRank (frontier/rank.py) — the priority source for the
politeness queues' score ordering."""

from pyspark.sql import functions as F

from markdown_lab_spark.frontier.rank import host_pagerank_priorities, pagerank


def test_pagerank_two_node_cycle_closed_form(spark):
    """a<->b is fully symmetric: both ranks are exactly 1.0 at every
    iteration (closed form), mass conserved."""
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=7).collect()}
    assert abs(pr["a"] - 1.0) < 1e-12 and abs(pr["b"] - 1.0) < 1e-12


def test_pagerank_ordering_and_mass(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "e")],
        "src string, dst string",
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=30).collect()}
    assert abs(sum(pr.values()) - len(pr)) < 1e-6  # dangling mass kept
    assert max(pr, key=pr.get) == "c"  # highest in-rank
    assert min(pr, key=pr.get) == "d"  # pure source floor
    # convergence: 30 vs 31 iterations move ranks < 1e-3
    pr2 = {r["node"]: r["rank"] for r in pagerank(edges, iters=31).collect()}
    assert max(abs(pr[k] - pr2[k]) for k in pr) < 1e-3


def test_host_pagerank_priorities_scaled(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    hp = {r["host"]: r["priority"] for r in host_pagerank_priorities(edges, 10).collect()}
    assert set(hp) == {"a", "b", "c"}
    assert all(0.0 <= v <= 1.0 for v in hp.values())
    assert max(hp.values()) == 1.0 and min(hp.values()) == 0.0
    # and it plugs straight into the politeness ordering contract
    f = spark.createDataFrame(
        [("u1", "a", 1), ("u2", "b", 1)], "canon_url string, host string, depth int"
    ).join(
        spark.createDataFrame(
            [(h, p) for h, p in hp.items()], "host string, priority double"
        ),
        on="host",
    )
    ordered = f.orderBy(F.col("depth").asc(), F.col("priority").desc()).collect()
    assert ordered[0]["host"] == max(hp, key=hp.get) or ordered[0]["priority"] >= ordered[1]["priority"]


def test_crawl_consumes_host_priorities(spark, tmp_path):
    """End-to-end: priorities from host_pagerank_priorities flow into the
    frontier at link discovery, so discovered URLs of a high-rank host
    outrank the flat 0.5 default in the politeness ordering."""
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine
    from markdown_lab_spark.frontier.rank import host_edges_from_docs

    def page(title, links):
        anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{title} body text</p>{anchors}</body></html>"
        ).encode()

    rows = [
        ("https://hub.test/", page("hub", ["https://a.test/x", "https://b.test/y"])),
        ("https://a.test/x", page("ax", ["https://hub.test/"])),
        ("https://b.test/y", page("by", ["https://hub.test/"])),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    cfg = CrawlConfig(rps=1.0, wave_seconds=5, max_waves=3)

    # pass 1: unprioritized crawl; derive the host graph from its
    # checkpointed per-wave docs (links + host live there)
    ckpt = str(tmp_path / "ckpt")
    CrawlEngine(spark, pages, cfg, checkpoint_dir=ckpt).crawl(
        ["https://hub.test/"]
    )
    docs = spark.read.parquet(f"{ckpt}/wave=*/docs")
    edges = host_edges_from_docs(docs)
    got = {(r["src_host"], r["dst_host"]) for r in edges.collect()}
    assert ("hub.test", "a.test") in got and ("a.test", "hub.test") in got

    hp = host_pagerank_priorities(edges, iters=10)
    hp_rows = {r["host"]: r["priority"] for r in hp.collect()}
    assert hp_rows["hub.test"] == 1.0  # both leaves link to the hub

    # pass 2: prioritized crawl — discovered hub links carry priority 1.0
    out2 = CrawlEngine(spark, pages, cfg).crawl(
        ["https://a.test/x"], host_priorities=hp
    )
    tr = {
        (r["canon_url"], r["wave"]): r for r in out2["trace"].collect()
    }
    assert ("https://hub.test/", 1) in tr  # discovered and fetched


def test_wave_fetch_cap_prefers_high_priority_hosts(spark):
    """Under a global wave fetch cap, PageRank-style host priorities
    decide which hosts win fetch slots; the losers defer and are fetched
    in a later wave (nothing is lost)."""
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine

    def page(title):
        return (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{title} content</p></body></html>"
        ).encode()

    rows = [
        ("https://hi.test/a", page("ha")),
        ("https://hi.test/b", page("hb")),
        ("https://lo.test/a", page("la")),
        ("https://lo.test/b", page("lb")),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    hp = spark.createDataFrame(
        [("hi.test", 1.0), ("lo.test", 0.1)], "host string, priority double"
    )
    cfg = CrawlConfig(rps=10.0, wave_seconds=1, max_waves=4, wave_fetch_cap=2)
    # seeds enter with priority 1.0; links inherit host priority — seed
    # all four so the cap must choose between hosts. Seeds all get 1.0,
    # so instead seed one hub that links to all four? Simpler: seed the
    # four URLs via a frontier whose priorities come from hp by crawling
    # a hub page that links to all of them.
    hub = (
        "<html><body>"
        + "".join(f'<a href="{u}">{u}</a>' for u, _ in rows)
        + "</body></html>"
    ).encode()
    pages2 = spark.createDataFrame(
        rows + [("https://hub.test/", hub)], "url string, html binary"
    )
    out = CrawlEngine(spark, pages2, cfg).crawl(
        ["https://hub.test/"], host_priorities=hp
    )
    waves = {
        r["canon_url"]: r["wave"]
        for r in out["trace"].collect()
        if r["status"] == "ok"
    }
    # wave 0: hub. wave 1: cap=2 -> both hi.test URLs (priority 1.0 beats
    # 0.1). wave 2: the deferred lo.test URLs.
    assert waves["https://hi.test/a"] == 1 and waves["https://hi.test/b"] == 1
    assert waves["https://lo.test/a"] == 2 and waves["https://lo.test/b"] == 2


def test_url_priorities_order_within_host_queue(spark, tmp_path):
    """URL-level ranks order a single host's politeness queue: with
    budget 1/wave, the page every other page links to is fetched before
    the long tail."""
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine
    from markdown_lab_spark.frontier.rank import url_pagerank_priorities

    def page(title, links):
        anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{title} text</p>{anchors}</body></html>"
        ).encode()

    urls = [f"https://h.test/p{i}" for i in range(4)]
    hub = "https://h.test/hub"
    # every page links to the hub AND to the next page; the seed links all
    rows = [("https://h.test/", page("root", urls + [hub]))]
    rows += [(u, page(f"p{i}", [hub])) for i, u in enumerate(urls)]
    rows += [(hub, page("hub", []))]
    pages = spark.createDataFrame(rows, "url string, html binary")

    ckpt = str(tmp_path / "c1")
    cfg0 = CrawlConfig(rps=100.0, wave_seconds=1, max_waves=3)
    CrawlEngine(spark, pages, cfg0, checkpoint_dir=ckpt).crawl(
        ["https://h.test/"]
    )
    docs = spark.read.parquet(f"{ckpt}/wave=*/docs")
    up = url_pagerank_priorities(docs, iters=10)
    ranks = {r["canon_url"]: r["priority"] for r in up.collect()}
    assert ranks[hub] == max(ranks.values())  # in-link magnet tops

    # budget 1/wave: without priorities the queue orders by URL; with
    # them the hub (rank 1.0) wins the first discovered-wave slot
    cfg1 = CrawlConfig(rps=1.0, wave_seconds=1, max_waves=3)
    out = CrawlEngine(spark, pages, cfg1).crawl(
        ["https://h.test/"], url_priorities=up
    )
    fetched = {
        r["canon_url"]: r["wave"]
        for r in out["trace"].collect()
        if r["status"] == "ok"
    }
    assert fetched[hub] == 1  # beat p0..p3 despite URL sort order
