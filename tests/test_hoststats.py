"""Host reputation: per-host stats aggregation, priority scaling laws
(0.5 anchoring, all-equal collapse, min-docs evidence gate), and the
crawl-priority composition."""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions.hoststats import (
    host_quality_priorities,
    host_stats,
)

GOOD = (
    "The committee published its annual report on Tuesday. The findings "
    "describe a steady improvement in regional water quality and the "
    "measures that local authorities adopted during the previous year. "
    "Researchers noted that the program should continue with more funding."
)
SPAM = "buy now!!! $$$ click click click >>> % % % % % % % % % %"


def _docs(spark):
    rows = []
    for i in range(6):
        rows.append((f"https://good.example/p{i}", GOOD + f" Section {i}."))
    for i in range(6):
        rows.append((f"https://spam.example/p{i}", SPAM))
    # dup farm: one page content repeated
    for i in range(6):
        rows.append((f"https://dups.example/p{i}", GOOD))
    # below the evidence gate
    rows.append(("https://tiny.example/only", GOOD))
    return spark.createDataFrame(rows, "url string, text string")


def test_host_stats_shapes(spark):
    stats = {r["host"]: r for r in host_stats(_docs(spark)).collect()}
    assert stats["good.example"]["n_docs"] == 6
    assert stats["good.example"]["dup_frac"] == 0.0
    assert stats["dups.example"]["dup_frac"] == pytest.approx(5 / 6)
    assert stats["good.example"]["mean_quality"] > stats["spam.example"]["mean_quality"]
    assert stats["good.example"]["keep_rate"] >= stats["spam.example"]["keep_rate"]


def test_priorities_anchored_and_ordered(spark):
    stats = host_stats(_docs(spark))
    pr = {r["host"]: r["priority"] for r in host_quality_priorities(stats).collect()}
    # evidence gate: the 1-doc host is absent (keeps the 0.5 default)
    assert "tiny.example" not in pr
    # anchoring: every measured host >= the 0.5 default
    assert all(p >= 0.5 for p in pr.values())
    assert max(pr.values()) == pytest.approx(1.0)
    assert pr["good.example"] > pr["dups.example"] > pr["spam.example"]


def test_all_equal_collapses_to_default(spark):
    rows = [(f"https://h{i}.example/p{j}", GOOD) for i in range(3) for j in range(4)]
    df = spark.createDataFrame(rows, "url string, text string")
    pr = host_quality_priorities(host_stats(df)).collect()
    assert len(pr) == 3 and all(r["priority"] == 0.5 for r in pr)


def test_empty_stats(spark):
    df = spark.createDataFrame([], "url string, text string")
    assert host_quality_priorities(host_stats(df)).count() == 0


def test_feeds_crawl_priorities(spark, tmp_path):
    # the (host, priority) table is the crawler's host_priorities input
    from markdown_lab_spark.corpus.generator import (
        CorpusSpec,
        generate_corpus,
        write_corpus_parquet,
    )
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine

    corpus = generate_corpus(CorpusSpec(hosts=3, pages_per_host=8))
    path = str(tmp_path / "pages.parquet")
    write_corpus_parquet(corpus, path)
    pages = spark.read.parquet(path)
    stats = host_stats(
        pages.filter(F.col("text").isNotNull()), "url", "text"
    )
    prio = host_quality_priorities(stats, min_docs=1)
    out = CrawlEngine(
        spark, pages, CrawlConfig(rps=1.0, wave_seconds=5, max_waves=4)
    ).crawl(corpus.seeds, host_priorities=prio)
    assert out["trace"].count() > 0
