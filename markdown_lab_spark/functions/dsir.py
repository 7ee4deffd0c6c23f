"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS). Select raw-corpus documents whose hashed-n-gram distribution
looks like a trusted target corpus: fit two bag-of-hashed-n-grams
multinomial models (target p, raw q), score each raw doc with the log
importance weight ``sum_b c_b * (log p_b - log q_b)``, and resample k
docs without replacement via the Gumbel-top-k trick.

Published method, public sources only: the paper (arXiv 2302.03169)
specifies unigram+bigram features hashed into B buckets (10k in the
paper), Laplace-smoothed bucket probabilities, and importance-weighted
sampling without replacement; Gumbel-top-k (Vieira 2014) realizes the
latter as one distributed top-k when the noise comes from a per-row
uniform variate.

Engine-portable by the module's standard construction: buckets are
md5-prefix integers (exact DuckDB twin — see dedup.py), the Gumbel
noise comes from :func:`sampling.hash_uniform` (deterministic across
runs, partitionings, and engines), and the whole pipeline is DataFrame
ops — no Python in the hot path.

Scale shape (100 TB raw corpus, model-sized target):
- the per-doc term table is one explode + one partial-agg groupBy
  (boilerplate n-grams collapse map-side before the exchange);
- each fitted model is EXACTLY ``buckets`` rows (densified), so the
  (log p - log q) delta table broadcasts;
- scoring is a broadcast join + one per-doc partial-agg sum;
- selection is ``ranked_topk`` (TakeOrderedAndProject — per-partition
  bounded heaps, no Window, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform
from .topk import ranked_topk


def hashed_ngram_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 10000,
    lowercase: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed unigram+bigram counts.

    Tokens are whitespace words (lowercased by default, matching the
    paper's word-level features); bucket = first-8-hex-chars-of-md5 mod
    ``buckets``. Pure JVM expressions end-to-end; ONE shuffle (the
    (id, bucket) partial-agg count)."""
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bigrams)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("_g"))
        .select(
            "id",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long"),
                F.lit(buckets),
            ).alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_hashed_ngram_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 10000,
    alpha: float = 1.0,
    lowercase: bool = True,
) -> DataFrame:
    """(bucket, logp): Laplace-smoothed log bucket probabilities of the
    corpus's hashed n-gram distribution — densified to EXACTLY
    ``buckets`` rows (absent buckets carry the smoothing floor), so
    downstream joins never need a separate default path and the model
    always broadcasts. One partial-agg groupBy over the term table; the
    normalizer rides in via a broadcast single-row crossJoin (no
    collect, stays one lazy plan)."""
    if alpha <= 0:
        raise ValueError("alpha must be positive (Laplace smoothing)")
    terms = hashed_ngram_terms(df, id_col, text_col, buckets, lowercase)
    counts = terms.groupBy("bucket").agg(F.sum("cnt").alias("n"))
    total = counts.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("_total"))
    spark = df.sparkSession
    all_buckets = spark.range(buckets).select(F.col("id").alias("bucket"))
    return (
        all_buckets.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(float(alpha)))
                / (F.col("_total") + F.lit(float(alpha) * buckets))
            ).alias("logp"),
        )
    )


def dsir_logweights(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target_model: DataFrame,
    raw_model: DataFrame,
    buckets: int = 10000,
    lowercase: bool = True,
) -> DataFrame:
    """(id, logweight): per-raw-doc log importance weight
    ``sum_b c_b * (logp_target_b - logp_raw_b)``. The two models join
    into one ``buckets``-row delta table that broadcasts; scoring is
    the broadcast join + ONE per-doc partial-agg sum. Docs with no
    n-grams at all (empty text) score 0 (weight 1 — no evidence)."""
    delta = target_model.select(
        "bucket", F.col("logp").alias("_lp_t")
    ).join(raw_model.select("bucket", F.col("logp").alias("_lp_r")), "bucket")
    delta = delta.select(
        "bucket", (F.col("_lp_t") - F.col("_lp_r")).alias("_dlp")
    )
    terms = hashed_ngram_terms(raw, id_col, text_col, buckets, lowercase)
    scores = (
        terms.join(F.broadcast(delta), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("_dlp")).alias("logweight"))
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scores, "id", "left")
        .select("id", F.coalesce("logweight", F.lit(0.0)).alias("logweight"))
    )


def dsir_resample(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    k: int,
    buckets: int = 10000,
    alpha: float = 1.0,
    salt: str = "dsir",
    lowercase: bool = True,
) -> DataFrame:
    """Select ``k`` raw docs by importance resampling WITHOUT
    replacement: Gumbel-top-k over the log weights,
    ``g = logweight - ln(-ln(u))`` with ``u`` the deterministic
    per-row hash uniform — equivalent to sequential sampling with
    probability proportional to the importance weights (Vieira 2014),
    and reproducible across runs/partitionings because the noise is
    keyed by row identity, not an RNG stream.

    Returns the raw rows + ``logweight`` + ``gumbel`` + 1-based
    ``rank`` (selection order). Ties broken by id for determinism."""
    if k <= 0:
        raise ValueError("k must be positive")
    target_model = fit_hashed_ngram_model(
        target, id_col, text_col, buckets, alpha, lowercase
    )
    raw_model = fit_hashed_ngram_model(
        raw, id_col, text_col, buckets, alpha, lowercase
    )
    w = dsir_logweights(
        raw, id_col, text_col, target_model, raw_model, buckets, lowercase
    )
    u = hash_uniform(F.col("id"), salt)
    scored_ids = w.select(
        "id",
        "logweight",
        (F.col("logweight") - F.log(-F.log(u))).alias("gumbel"),
    )
    scored = raw.join(
        scored_ids.withColumnRenamed("id", id_col), id_col
    )
    return ranked_topk(
        scored,
        k,
        [(F.col("gumbel"), True), (F.col(id_col), False)],
    )
