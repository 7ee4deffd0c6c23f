"""Anchor-text link graph: extraction occurrences, per-target top-n
(deterministic ties, skew path), target features, naive-window
equivalence, PageRank-priority composition."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from markdown_lab_spark.functions.anchors import (
    anchor_target_features,
    link_anchor_table,
    top_anchors_per_target,
)


def _pages(spark):
    def page(links):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
        return f"<html><body>{body}</body></html>"

    rows = [
        ("https://a.example/1", page([
            ("https://t.example/x", "Target X"),
            ("https://t.example/x", "Target X"),
            ("/local", "Local Page"),
            ("https://t.example/y", ""),
            ("#frag", "skip"),
        ])),
        ("https://a.example/2", page([
            ("https://t.example/x", "target x"),  # case-distinct anchor
            ("https://t.example/x", "Target X"),
            ("https://t.example/y", "Why"),
        ])),
        ("https://b.example/1", None),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_occurrences_and_resolution(spark):
    rows = link_anchor_table(_pages(spark), "url", "html").collect()
    trip = {(r["src"], r["dst"], r["anchor"]) for r in rows}
    assert ("https://a.example/1", "https://a.example/local", "Local Page") in trip
    assert ("https://a.example/1", "https://t.example/y", "") in trip
    # occurrences kept: the duplicated (src, dst, anchor) appears twice
    # (page 1: 4 rows after the #frag skip; page 2: 3 rows)
    assert len(rows) == 7
    assert not any("#" in r["dst"] for r in rows)


def test_top_anchors_deterministic(spark):
    anchors = link_anchor_table(_pages(spark), "url", "html")
    top = {
        (r["dst"], r["anchor"]): r["cnt"]
        for r in top_anchors_per_target(anchors, n=2).collect()
    }
    assert top[("https://t.example/x", "Target X")] == 3
    assert top[("https://t.example/x", "target x")] == 1
    # the empty anchor never appears
    assert ("https://t.example/y", "") not in top
    assert top[("https://t.example/y", "Why")] == 1


def test_top_anchors_equal_naive_window_with_skew(spark):
    import random

    rng = random.Random(9)
    rows = []
    # mega target: 3000 occurrences over 40 distinct anchors; others small
    for i in range(3000):
        rows.append(("s", "https://mega.example/", f"anchor-{rng.randint(0, 39)}"))
    for d in range(30):
        for k in range(rng.randint(1, 6)):
            rows.append(("s", f"https://small{d}.example/", f"a{k}"))
    anchors = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {
        (r["dst"], r["anchor"], r["cnt"])
        for r in top_anchors_per_target(anchors, n=3, salt_n=4).collect()
    }
    counted = anchors.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("anchor").asc())
    naive = counted.withColumn("_rn", F.row_number().over(w)).filter("_rn <= 3")
    want = {(r["dst"], r["anchor"], r["cnt"]) for r in naive.collect()}
    assert got == want


def test_target_features(spark):
    anchors = link_anchor_table(_pages(spark), "url", "html")
    feats = {r["dst"]: r for r in anchor_target_features(anchors).collect()}
    x = feats["https://t.example/x"]
    assert x["in_degree"] == 4 and x["n_sources"] == 2
    assert x["n_anchors"] == 2 and x["top_anchor"] == "Target X"
    y = feats["https://t.example/y"]
    assert y["in_degree"] == 2 and y["top_anchor"] == "Why"


def test_composes_with_pagerank_priorities(spark):
    # the anchor table's (src, dst) projection is exactly the edge list
    # pagerank consumes — assert the composition runs and ranks targets
    from markdown_lab_spark.frontier.rank import pagerank

    anchors = link_anchor_table(_pages(spark), "url", "html")
    pr = pagerank(anchors.select("src", "dst"), iters=3)
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    assert ranks and ranks["https://t.example/x"] > ranks["https://t.example/y"]
