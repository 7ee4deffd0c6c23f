"""Anchor-text link graph: the classic web-graph ranking signal
(anchor text describes the TARGET page — Brin & Page 1998 §2.2; every
production search/quality stack aggregates it per target).

Shapes, 100 TB lens:
- `link_anchor_table`: scan-local extraction (Arrow-batched mapInPandas
  sharing the oracle parser), one output row per <a href> occurrence —
  corpus-sized but narrow (src, dst, anchor).
- `top_anchors_per_target`: groupBy(dst, anchor) count FIRST (partial
  agg collapses mega-anchors — "click here" x 10^9 shrinks map-side),
  then the skew-safe per-dst top-n via cap_per_group (under-quota
  targets bypass the window; a target with millions of DISTINCT anchors
  goes through the salted two-phase top-n, never one task).
- `anchor_target_features`: per-target scalars (in-degree, distinct
  anchors, top anchor) for joining into quality/priority tables.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import cap_per_group

ANCHOR_SCHEMA = "src string, dst string, anchor string"


def link_anchor_table(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor) per <a href> occurrence. Resolution and skip
    rules match extract_links (oracle/html_parser.py) but occurrences
    are kept (no sort+dedup): anchor frequency is the signal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..oracle.html_parser import (  # noqa: PLC0415
            extract_links_with_anchors,
        )

        for pdf in batches:
            srcs: List[str] = []
            dsts: List[str] = []
            anchors: List[str] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                if url is None or html is None:
                    continue
                h = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                try:
                    pairs = extract_links_with_anchors(h, url)
                except Exception:  # noqa: BLE001 — decoder-boundary contract
                    continue
                for dst, anchor in pairs:
                    srcs.append(url)
                    dsts.append(dst)
                    anchors.append(anchor)
            yield pd.DataFrame({"src": srcs, "dst": dsts, "anchor": anchors})

    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInPandas(run, ANCHOR_SCHEMA)


def top_anchors_per_target(
    anchors: DataFrame, n: int = 5, salt_n: int = 16
) -> DataFrame:
    """(dst, anchor, cnt) — the n most frequent anchor texts per target
    (ties broken lexicographically on anchor: deterministic). Empty
    anchors (image links, whitespace-only) are dropped — they carry no
    signal and would otherwise top every list."""
    counted = (
        anchors.filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count("*").alias("cnt"))
    )
    return cap_per_group(
        counted,
        "dst",
        n,
        [F.col("cnt").desc(), F.col("anchor").asc()],
        salt_col="anchor",
        salt_n=salt_n,
    ).select("dst", "anchor", "cnt")


def anchor_target_features(anchors: DataFrame) -> DataFrame:
    """Per-target scalars for quality/priority joins: in-degree (link
    occurrences), distinct source pages, distinct anchor strings, and
    the modal anchor (most frequent, lexicographic tie-break) — one
    partial-agg groupBy plus a min(struct) pick, no window."""
    counted = (
        anchors.filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count("*").alias("cnt"))
    )
    modal = (
        counted.groupBy("dst")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("_neg"),
                    F.col("anchor").alias("_a"),
                )
            ).alias("_m")
        )
        .select("dst", F.col("_m._a").alias("top_anchor"))
    )
    degrees = anchors.groupBy("dst").agg(
        F.count("*").alias("in_degree"),
        F.countDistinct("src").alias("n_sources"),
        F.countDistinct(
            F.when(F.col("anchor") != "", F.col("anchor"))
        ).alias("n_anchors"),
    )
    return degrees.join(modal, "dst", "left")
