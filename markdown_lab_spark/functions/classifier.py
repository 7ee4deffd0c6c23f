"""Model-based quality classification — the DCLM / FineWeb-Edu stage:
score web documents with a lightweight linear classifier over
bag-of-ngram features and keep the high-scoring head.

Feature space (shared by both trainers and the scorer): lowercased
whitespace tokens (the engine convention, cf. ``text.ws_token_count``),
unigrams + space-joined bigrams, term-frequency values
``x_t = count_t / total_terms`` per document. Everything below is
whole-stage-codegen JVM expressions + joins — no Python UDF anywhere.

Two trainers over that space:

- :func:`nb_logodds_weights` — closed-form Naive-Bayes log-count-ratio
  weights (Wang & Manning 2012, "Baselines and Bigrams: Simple, Good
  Sentiment and Topic Classification" — the NBSVM feature weighting):
  ``w_t = log[(df⁺_t + α)/(N⁺ + 2α)] − log[(df⁻_t + α)/(N⁻ + 2α)]``
  over per-class binarized document frequencies, bias = log prior
  ratio. ONE groupBy over exploded per-doc-distinct terms (partial
  map-side aggregation absorbs Zipfian skew); the class totals are a
  one-row aggregate cross-joined back in. Being closed-form it is
  fully SQL-expressible, so the driver gate trains AND scores in one
  declarative query with a DuckDB oracle.

- :func:`train_logreg` — distributed full-batch logistic regression
  refined from any initial weights (NB log-odds by default, the NBSVM
  interpolation intuition) with a damped diagonal-Newton step
  ``w_j ← w_j − g_j / (h_j + damp)`` where ``g_j = Σ_d (p_d − y_d)
  x_dj + λ w_j`` and ``h_j = Σ_d p_d (1 − p_d) x_dj² + λ``. Per
  iteration: broadcast the (V+1)-row weights table, join features,
  ONE per-doc aggregation for margins, join back, ONE per-term
  aggregation for (g, h), collect V+1 bounded rows, numpy update —
  the same bounded-model-collect shape as ``kmeans_train_centroids``
  and ``pagerank`` (model size is the collect bound, never the
  corpus). The bias is a ``__bias__`` pseudo-feature with x = 1 on
  every doc, so gradient + curvature + bias all come out of the one
  term-level aggregation: ONE Spark action per iteration. Features
  are materialized once (localCheckpoint) so the per-iteration plan
  does not grow — the iterative-lineage trap pagerank guards against.

- :func:`score_docs` — explode features once, inner-join the weights
  table (Catalyst broadcasts it when it fits; at warehouse scale the
  join shuffle-hashes on the term key — the published MapReduce-LM
  serving layout, cf. ``lm.py``), ONE per-doc re-aggregation,
  ``sigmoid(bias + Σ x_t w_t)``. Docs with zero vocabulary hits score
  ``sigmoid(bias)`` via the left join back to the id spine.

Reference behavior mapped: the reference engine has no model-based
filter (its quality gates are heuristic — ``src/chunker.rs`` semantic
density); this stage is the published web-pipeline step its corpus
users need at 100 TB (GPT-3 appendix A WebText-similarity filtering,
DCLM fastText filtering, FineWeb-Edu classifier).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIAS_TERM = "__bias__"


def _tokens(text_col: Column) -> Column:
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.filter(toks, lambda t: t != "")


def doc_terms(text_col: Column) -> Column:
    """unigrams + space-joined bigrams of the lowercased whitespace
    tokens, as one array<string>. Bigrams contain a space, unigrams
    cannot (they are split on whitespace), so the two lanes never
    collide."""
    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def featurize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, x double) term-frequency features: x = cnt / total
    terms of the doc. One explode + one (id, term) groupBy; the total
    rides along as max(n) inside the same aggregation (constant per
    id), so no second shuffle and no window."""
    arr = docs.select(
        F.col(id_col).alias("_cid"),
        doc_terms(F.col(text_col)).alias("_terms"),
    )
    terms = arr.select(
        "_cid",
        F.explode(F.col("_terms")).alias("term"),
        F.size(F.col("_terms")).alias("_n"),
    )
    return (
        terms.groupBy("_cid", "term")
        .agg(F.count("*").alias("_cnt"), F.max("_n").alias("_tot"))
        .select(
            F.col("_cid").alias(id_col),
            "term",
            (F.col("_cnt").cast("double") / F.col("_tot")).alias("x"),
        )
    )


def nb_logodds_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    min_df: int = 1,
    alpha: float = 1.0,
    vocab_size: Optional[int] = None,
) -> DataFrame:
    """Closed-form NB log-count-ratio weights over binarized per-doc
    term presence. Returns (term, wt double) INCLUDING the bias row
    ``term = '__bias__', wt = log((N⁺+α)/(N⁻+α))`` so the table is the
    complete model. ``label_col`` must be boolean.

    Plan: per-doc-distinct presence via one (id, term)-distinct agg,
    per-class df via one term groupBy with count_if (partial agg
    absorbs Zipf skew), class totals via a one-row agg cross-joined
    back (Catalyst broadcasts the single row). ``vocab_size`` keeps
    the top-V terms by total df (ties: term ASC) through
    TakeOrderedAndProject — bounded, window-free."""
    y = F.col(label_col)
    lab = docs.select(F.col(id_col).alias("_cid"), y.alias("_y"))
    pres = (
        docs.select(
            F.col(id_col).alias("_cid"),
            F.explode(F.array_distinct(doc_terms(F.col(text_col)))).alias("term"),
        )
        .join(lab, "_cid")
    )
    dfc = (
        pres.groupBy("term")
        .agg(
            F.count_if(F.col("_y")).alias("dfp"),
            F.count_if(~F.col("_y")).alias("dfn"),
        )
        .filter((F.col("dfp") + F.col("dfn")) >= F.lit(int(min_df)))
    )
    if vocab_size is not None:
        dfc = dfc.orderBy(
            (F.col("dfp") + F.col("dfn")).desc(), F.col("term").asc()
        ).limit(int(vocab_size))
    cls = lab.agg(
        F.count_if(F.col("_y")).alias("npos"),
        F.count_if(~F.col("_y")).alias("nneg"),
    )
    a = F.lit(float(alpha))
    wts = dfc.crossJoin(cls).select(
        "term",
        (
            F.log((F.col("dfp") + a) / (F.col("npos") + 2 * a))
            - F.log((F.col("dfn") + a) / (F.col("nneg") + 2 * a))
        ).alias("wt"),
    )
    bias = cls.select(
        F.lit(BIAS_TERM).alias("term"),
        F.log((F.col("npos") + a) / (F.col("nneg") + a)).alias("wt"),
    )
    return wts.unionByName(bias)


def score_docs(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, margin double, score double) for every input doc.
    margin = bias + Σ x_t·w_t over vocabulary hits; score =
    sigmoid(margin). ``weights`` is the (term, wt) table from either
    trainer (bias included as the ``__bias__`` row)."""
    feats = featurize(docs, id_col, text_col)
    hits = (
        feats.join(weights.filter(F.col("term") != BIAS_TERM), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("wt")).alias("_dot"))
    )
    # one-row aggregate (never empty, even with no bias row) so the
    # crossJoin below is always a 1-row broadcast, not a zero-row wipe
    bias = weights.agg(
        F.sum(F.when(F.col("term") == BIAS_TERM, F.col("wt"))).alias("_b")
    )
    spine = docs.select(id_col).distinct()
    margin = F.coalesce(F.col("_dot"), F.lit(0.0)) + F.coalesce(
        F.col("_b"), F.lit(0.0)
    )
    return (
        spine.join(hits, id_col, "left")
        .crossJoin(bias)
        .select(
            id_col,
            margin.alias("margin"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("score"),
        )
    )


def train_logreg(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    iters: int = 8,
    l2: float = 1e-3,
    damp: float = 1.0,
    min_df: int = 1,
    vocab_size: Optional[int] = None,
    init_weights: Optional[DataFrame] = None,
) -> Tuple[DataFrame, list]:
    """Distributed full-batch logistic regression. Returns
    ``(weights, losses)`` — the (term, wt) model table (bias row
    included) and the per-iteration mean log-loss (computed from the
    same pass, so convergence is observable for free).

    NOT SQL-expressible (iterative) — pytest-gated like
    ``kmeans_train_centroids``; the closed-form :func:`nb_logodds_weights`
    carries the driver oracle gate for this family. Initialization
    defaults to the NB log-odds weights (the NBSVM interpolation
    intuition: start at the generative solution, refine
    discriminatively).
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = docs.sparkSession
    if init_weights is None:
        init_weights = nb_logodds_weights(
            docs, id_col, text_col, label_col,
            min_df=min_df, vocab_size=vocab_size,
        )
    wpdf = init_weights.toPandas()  # bounded: V+1 model rows
    terms = wpdf["term"].tolist()
    w = wpdf["wt"].to_numpy(dtype=np.float64).copy()
    tidx = {t: i for i, t in enumerate(terms)}
    if BIAS_TERM not in tidx:
        terms.append(BIAS_TERM)
        w = np.append(w, 0.0)
        tidx[BIAS_TERM] = len(terms) - 1

    lab = docs.select(
        F.col(id_col).alias("_cid"),
        F.col(label_col).cast("double").alias("_y"),
    )
    vocab = spark.createDataFrame(
        pd.DataFrame({"term": [t for t in terms if t != BIAS_TERM]})
    )
    base = featurize(docs, id_col, text_col).withColumnRenamed(id_col, "_cid")
    feats = (
        base.join(vocab, "term")
        .unionByName(
            docs.select(
                F.col(id_col).alias("_cid"),
                F.lit(BIAS_TERM).alias("term"),
                F.lit(1.0).alias("x"),
            )
        )
        .join(lab, "_cid")
        .localCheckpoint()  # materialize once; iterations re-read blocks
    )
    n_docs = lab.count()
    losses: list = []
    for _ in range(int(iters)):
        wdf = F.broadcast(
            spark.createDataFrame(pd.DataFrame({"term": terms, "wt": w}))
        )
        scored = feats.join(wdf, "term")
        margins = scored.groupBy("_cid").agg(
            F.sum(F.col("x") * F.col("wt")).alias("_m"),
            F.first("_y").alias("_y2"),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))
        per_doc = margins.select(
            "_cid",
            (p - F.col("_y2")).alias("_r"),
            (p * (F.lit(1.0) - p)).alias("_c"),
            (
                -(
                    F.col("_y2") * F.log(F.greatest(p, F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("_y2"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                )
            ).alias("_ll"),
        )
        # ONE action per iteration: term-level gradient + curvature.
        # The total log-loss rides along exactly: every doc carries the
        # __bias__ pseudo-feature with x = 1, so sum(_ll * x) grouped
        # under that term is the corpus log-loss — no second pass.
        agg = (
            feats.join(per_doc, "_cid")
            .groupBy("term")
            .agg(
                F.sum(F.col("_r") * F.col("x")).alias("g"),
                F.sum(F.col("_c") * F.col("x") * F.col("x")).alias("h"),
                F.sum(F.col("_ll") * F.col("x")).alias("llx"),
            )
            .toPandas()  # bounded: V+1 rows
        )
        gv = np.zeros_like(w)
        hv = np.zeros_like(w)
        total_ll = 0.0
        for t, g, h, llx in agg[["term", "g", "h", "llx"]].itertuples(index=False):
            i = tidx.get(t)
            if i is None:
                continue
            gv[i] = g
            hv[i] = h
            if t == BIAS_TERM:
                total_ll = llx
        reg = np.full_like(w, float(l2))
        reg[tidx[BIAS_TERM]] = 0.0  # never regularize the intercept
        losses.append(
            float(total_ll) / max(n_docs, 1)
            + 0.5 * float(l2) * float(np.sum((w * (reg > 0)) ** 2)) / max(n_docs, 1)
        )
        w = w - (gv + reg * w) / (hv + reg + float(damp))
    out = spark.createDataFrame(pd.DataFrame({"term": terms, "wt": w}))
    return out, losses
