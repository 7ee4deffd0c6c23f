"""Host-level reputation: aggregate per-document curation signals into
per-host scalars, then feed them back into the crawler as a priority
table — the curation -> crawl loop every production pipeline closes
(hosts that historically yield keepable documents get frontier budget
first; spam/boilerplate farms sink).

Shapes, 100 TB lens: everything is ONE partial-agg groupBy(host) over
scan-local per-doc expressions (quality_score / gopher_keep /
predicted_lang are pure JVM; the dup-rate leg reuses exact_dedup's
hash-agg) — no window, no Python, host cardinality (~10^8) is the small
output, and the result joins the politeness scheduler on its existing
host key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import gopher_keep, predicted_lang, quality_score


def host_of(url):
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1)


def host_stats(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host curation scalars: n_docs, mean quality, gopher keep
    rate, english fraction, exact-duplicate fraction (1 - distinct
    content hashes / docs). One groupBy(host); the per-doc signals are
    the already-gated JVM expressions (q25/q50/q18 families)."""
    t = F.col(text_col)
    per_doc = docs.select(
        host_of(F.col(url_col)).alias("host"),
        quality_score(t).alias("_q"),
        gopher_keep(t).cast("int").alias("_keep"),
        (predicted_lang(t) == "en").cast("int").alias("_en"),
        F.md5(t).alias("_h"),
    ).where(F.col("host") != "")
    return per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.avg("_q").alias("mean_quality"),
        F.avg("_keep").alias("keep_rate"),
        F.avg("_en").alias("en_frac"),
        # exact distinct is fine to ~10^6 docs/host; at pathological
        # per-host volumes swap in approx_count_distinct (same plan shape)
        (1.0 - F.countDistinct("_h") / F.count("*")).alias("dup_frac"),
    )


def host_quality_priorities(
    stats: DataFrame, min_docs: int = 3
) -> DataFrame:
    """(host, priority in [0.5, 1]) from host_stats — the same contract
    and anchoring as host_pagerank_priorities (frontier/rank.py): the
    scale is anchored AT the 0.5 default that hosts absent from the
    table keep, so measured hosts never sink below unmeasured ones and
    an all-equal table collapses to the default. Hosts with fewer than
    ``min_docs`` observations are dropped (insufficient evidence — they
    keep the default rather than a noisy score).

    Composite = mean(keep_rate, mean_quality, 1 - dup_frac): each term
    is already in [0, 1], equally weighted; min-max scaled within the
    table. Driver cost is one 2-row-ish agg collect (lo/hi scalars)."""
    s = stats.filter(F.col("n_docs") >= min_docs).withColumn(
        "_score",
        (
            F.col("keep_rate")
            + F.col("mean_quality")
            + (1.0 - F.col("dup_frac"))
        )
        / 3.0,
    )
    lohi = s.agg(F.min("_score").alias("lo"), F.max("_score").alias("hi")).collect()[0]
    if lohi["hi"] is None:  # empty stats
        return s.select("host", F.lit(0.5).alias("priority"))
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    span = hi - lo
    if span == 0.0:  # all equal: no evidence of difference -> default
        return s.select("host", F.lit(0.5).alias("priority"))
    return s.select(
        "host",
        (0.5 + 0.5 * (F.col("_score") - F.lit(lo)) / F.lit(span)).alias(
            "priority"
        ),
    )
