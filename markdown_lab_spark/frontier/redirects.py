"""Meta-refresh redirect resolution, corpus-side.

Real crawls are full of client-side ``<meta http-equiv=refresh>``
redirects; ``requests`` (the reference's fetch layer) follows HTTP 3xx
but NOT these, so a parity crawler records shell pages. Rather than
teaching the wave loop a new row route (every mode would need it), the
corpus is resolved AT INGEST: redirect chains collapse to their final
target, and an "effective pages" view hands the crawler the final
content under the original URL — fetching A (-> B -> C) yields C's
html, exactly what a refresh-following browser renders at A. The
duplicate content this creates across A/B/C is the dedup family's job
(rel=canonical / exact dedup), as in production pipelines.

Scale shape: target extraction is scan-local (Arrow-batched pandas on
the shared oracle parser); chain collapse is ``max_hops`` rounds of an
equi-join where the LEFT side shrinks to only still-unresolved rows
(redirect rows are a tiny corpus fraction; round r joins |chains still
live at depth r| rows) with localCheckpoint truncation per round —
the bounded-iteration pattern pagerank/kmeans use. No window, no
driver-side chain walking.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIRECT_SCHEMA = "url string, target string"


def meta_refresh_targets(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, target) for every page declaring a meta refresh with a
    resolvable http(s) target. Self-redirects are dropped here (they
    would be 1-cycles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..oracle.html_parser import extract_meta_refresh  # noqa: PLC0415

        for pdf in batches:
            urls, targets = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                if url is None or html is None:
                    continue
                h = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                try:
                    t = extract_meta_refresh(h, url)
                except Exception:  # noqa: BLE001 — decoder-boundary contract
                    continue
                if t is not None and t != url:
                    urls.append(url)
                    targets.append(t)
            yield pd.DataFrame({"url": urls, "target": targets})

    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInPandas(run, REDIRECT_SCHEMA)


def resolve_redirects(edges: DataFrame, max_hops: int = 5) -> DataFrame:
    """(url, final_url, hops, resolved) — collapse redirect chains.

    ``resolved`` is False for chains still pointing at another redirect
    after ``max_hops`` (cycles and over-long chains land here — a
    refresh-following browser gives up the same way). Exact for every
    chain of length <= max_hops; a row's final_url at that point is a
    NON-redirecting URL (or the chain is flagged)."""
    cur = edges.select(
        "url",
        F.col("target").alias("final_url"),
        F.lit(1).alias("hops"),
    ).localCheckpoint(eager=True)
    nxt = edges.select(
        F.col("url").alias("_t_url"), F.col("target").alias("_t_target")
    ).localCheckpoint(eager=True)
    for _ in range(max_hops - 1):
        stepped = (
            cur.join(nxt, cur["final_url"] == nxt["_t_url"], "left")
            .withColumn("_next", F.col("_t_target"))
            .withColumn(
                "_cycle", F.col("_next").isNotNull() & (F.col("_next") == F.col("url"))
            )
        )
        cur = stepped.select(
            "url",
            F.when(
                F.col("_next").isNotNull() & ~F.col("_cycle"), F.col("_next")
            )
            .otherwise(F.col("final_url"))
            .alias("final_url"),
            F.when(
                F.col("_next").isNotNull() & ~F.col("_cycle"),
                F.col("hops") + 1,
            )
            .otherwise(F.col("hops"))
            .alias("hops"),
        ).localCheckpoint(eager=True)
    # a chain is unresolved if its final_url still redirects somewhere else
    return (
        cur.join(nxt, cur["final_url"] == nxt["_t_url"], "left")
        .select(
            "url",
            "final_url",
            "hops",
            F.col("_t_target").isNull().alias("resolved"),
        )
    )


def effective_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = 5,
) -> DataFrame:
    """``pages`` with every RESOLVED redirect row carrying its final
    target's html (the content a refresh-following client renders at
    that URL); unresolved chains (cycles, too-deep) keep their shell
    html. Non-redirect rows pass through untouched — the join's left
    side is only the redirect rows, so the corpus is never shuffled."""
    res = resolve_redirects(
        meta_refresh_targets(pages, url_col, html_col), max_hops
    )
    content = pages.select(
        F.col(url_col).alias("_c_url"), F.col(html_col).alias("_c_html")
    )
    repl = (
        res.filter(F.col("resolved"))
        .join(content, F.col("final_url") == F.col("_c_url"), "inner")
        .select(
            F.col("url").alias("_r_url"), F.col("_c_html").alias("_r_html")
        )
    )
    out = pages.join(
        repl, pages[url_col] == repl["_r_url"], "left"
    )
    return out.withColumn(
        html_col, F.coalesce(F.col("_r_html"), F.col(html_col))
    ).drop("_r_url", "_r_html")
