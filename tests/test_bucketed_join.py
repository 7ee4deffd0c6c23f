"""Co-located joins via bucketing (the 100 TB join strategy).

The wave loop's recurring equi-joins (frontier ⋈ pages, frontier ⋈ seen)
key on canon_url every wave; at warehouse scale the corpus must not be
re-shuffled per wave. Bucketing both tables by canon_url into the same
bucket count makes the sort-merge join exchange-free on BOTH sides —
this test pins that property on the physical plan.
"""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.plans.checks import formatted_plan
from markdown_lab_spark.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    n = 2000
    left = spark.range(n).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("canon_url"),
        F.col("id").alias("depth"),
    )
    right = spark.range(0, n, 3).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("canon_url"),
        F.lit(1).alias("status_wave"),
    )
    write_bucketed(left, "pages_bkt", str(tmp_path / "pages_bkt"), buckets=8)
    write_bucketed(right, "seen_bkt", str(tmp_path / "seen_bkt"), buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("pages_bkt").join(
                spark.table("seen_bkt"), on="canon_url", how="left_anti"
            )
            plan = formatted_plan(joined)
            assert "Exchange" not in plan, plan[:3000]
            assert joined.count() == n - len(range(0, n, 3))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bkt")
        spark.sql("DROP TABLE IF EXISTS seen_bkt")


def test_bucketed_fetch_join_is_exchange_free_and_equivalent(spark, tmp_path):
    """bucketed_fetch mode (round 5): the per-wave fetch join reads the
    one-time bucketed corpus table against the wave's bucketed schedule
    — an exchange-free bucket-to-bucket SMJ, no schedule broadcast (the
    1000-executor network-safe form). Results must equal the default
    broadcast-join crawl exactly."""
    from markdown_lab_spark.frontier.crawler import CrawlConfig, CrawlEngine

    def page(title, links):
        anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{title} text</p>{anchors}</body></html>"
        ).encode()

    rows = [
        (f"https://h{i % 3}.test/p{i}",
         page(f"p{i}", [f"https://h{(i + 1) % 3}.test/p{i + 1}"]))
        for i in range(30)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    seeds = [f"https://h{i % 3}.test/p{i}" for i in range(3)]

    base = CrawlEngine(
        spark, pages, CrawlConfig(rps=10.0, wave_seconds=1, max_waves=3)
    ).crawl(seeds)
    base_trace = sorted(
        (r["canon_url"], r["wave"], r["status"])
        for r in base["trace"].collect()
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng = CrawlEngine(
            spark,
            pages,
            CrawlConfig(
                rps=10.0, wave_seconds=1, max_waves=3,
                bucketed_fetch=True, state_buckets=4,
            ),
            checkpoint_dir=str(tmp_path / "bf"),
        )
        out = eng.crawl(seeds)
        got_trace = sorted(
            (r["canon_url"], r["wave"], r["status"])
            for r in out["trace"].collect()
        )
        assert got_trace == base_trace
        assert len(eng.fetch_plans) >= 1
        for plan in eng.fetch_plans:
            assert "Exchange" not in plan, plan[:3000]
            assert "Broadcast" not in plan, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
