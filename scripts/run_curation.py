#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline over a documents table.

    spark-submit --py-files dist/markdown_lab_spark.zip scripts/run_curation.py \
        --input /data/documents.parquet --output /data/curated \
        --bench /data/eval_sets.parquet --sample 0.5 --target-len 4096

Stage order (each is an already-tested operator; flags disable stages):

    1. url/lang/quality gate  (pure JVM filters; cheapest first)
    2. C4 line cleaning + page keep
    3. Gopher repetition/shape signals
    4. exact dedup            (md5 content hash, min-id keep)
    5. fuzzy dedup            (MinHash -> LSH -> Jaccard verify ->
                               connected components -> min-id keep)
    6. benchmark decontamination (13-gram membership, broadcast bench)
    7. LM perplexity cut      (CCNet-style stupid-backoff n-gram LM
                               trained on a trusted reference corpus,
                               join-based JVM scoring; --lm-ref enables)
    7b. quality classifier    (GPT-3 appendix A / DCLM shape: NB
                               log-odds or logreg-refined linear model,
                               positives = --classifier-ref corpus,
                               negatives = corpus sample; JVM join
                               scoring)
    8. deterministic sample   (identity-hash Bernoulli; reproducible)
    9. sequence packing       (bucketed FFD -> (pack_id, offset) table)

Writes ``<output>/documents.parquet`` (curated corpus) and
``<output>/packing.parquet`` (pack assignment), prints one JSON summary
line with per-stage survivor counts — the number every curation run
needs for its datasheet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--bench", help="eval-set parquet with a text column for decontamination")
    ap.add_argument("--bench-text-col", default="text")
    ap.add_argument("--fix-text", action="store_true",
                    help="ftfy-shaped repair first: mojibake (utf-8-as-"
                    "cp1252), NFC normalize, control strip")
    ap.add_argument("--lang", default="en", help="language to keep ('' disables)")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--no-c4", action="store_true")
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--no-fuzzy-dedup", action="store_true")
    ap.add_argument("--min-jaccard", type=float, default=0.8)
    ap.add_argument("--lsh-k", type=int, default=16)
    ap.add_argument("--lsh-bands", type=int, default=8)
    ap.add_argument("--lm-ref", help="trusted-corpus parquet (text column) to train the "
                    "perplexity LM on; enables the CCNet-style quality cut")
    ap.add_argument("--lm-order", type=int, default=3)
    ap.add_argument("--lm-keep-buckets", type=int, default=2,
                    help="keep the N lowest-perplexity terciles of 3 (CCNet "
                    "head+middle default)")
    ap.add_argument("--classifier-ref", help="trusted-corpus parquet (text "
                    "column) = positives for the model-based quality filter "
                    "(GPT-3 appendix A / DCLM); negatives are a deterministic "
                    "sample of the corpus itself")
    ap.add_argument("--classifier-threshold", type=float, default=0.5)
    ap.add_argument("--classifier-neg-sample", type=float, default=0.5,
                    help="corpus fraction used as negatives")
    ap.add_argument("--classifier-min-df", type=int, default=3)
    ap.add_argument("--classifier-vocab", type=int, default=200000,
                    help="top-V vocabulary cap (model rows collected per "
                    "logreg iteration are bounded by this)")
    ap.add_argument("--classifier-iters", type=int, default=0,
                    help="logistic-regression refinement iterations over the "
                    "NB init; 0 = closed-form NB weights only")
    ap.add_argument("--substr-dedup-len", type=int, default=0,
                    help="remove corpus-wide duplicated token spans of this "
                    "length or longer (ExactSubstr, Lee et al. 2021); 0 "
                    "disables; docs left with < 10 tokens are dropped")
    ap.add_argument("--wet-out",
                    help="also publish the curated corpus as WET "
                    "(.warc.wet.gz conversion records) to this directory")
    ap.add_argument("--wet-compression", default="gzip",
                    choices=["gzip", "zstd", "none"],
                    help="WET member compression (zstd = .warc.wet.zst "
                    "via the in-repo RFC 8878 store encoder)")
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature source-mix weighting p_i ~ n_i^alpha "
                    "over the 'source' column (GPT-3/LLaMA rule); flattens "
                    "the mix by down-sampling large sources")
    ap.add_argument("--mix-target-rows", type=int, default=None)
    ap.add_argument("--semdedup-threshold", type=float, default=0.0,
                    help="> 0 enables SemDedup over the input's 'embedding' "
                    "column: k-means cells, within-cell cosine pairs at this "
                    "threshold, keep the member farthest from its centroid")
    ap.add_argument("--semdedup-k", type=int, default=16)
    ap.add_argument("--dsir-ref", help="trusted-corpus parquet (text column): "
                    "select --dsir-k docs by DSIR importance resampling "
                    "(hashed-n-gram target/raw models + Gumbel-top-k)")
    ap.add_argument("--dsir-k", type=int, default=0)
    ap.add_argument("--dsir-buckets", type=int, default=10000)
    ap.add_argument("--sample", type=float, default=1.0, help="keep fraction (hash-deterministic)")
    ap.add_argument("--salt", default="curation")
    ap.add_argument("--target-len", type=int, default=4096, help="pack budget in tokens; 0 disables packing")
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="train a BPE tokenizer (on a deterministic sample of the "
                    "curated corpus) and pack by real BPE token counts instead of "
                    "the whitespace proxy; 0 keeps the proxy")
    ap.add_argument("--bpe-sample", type=float, default=0.2,
                    help="corpus fraction the BPE/Unigram trainer sees")
    ap.add_argument("--unigram-vocab", type=int, default=0,
                    help="train a Unigram-LM (SentencePiece-style) "
                    "tokenizer with this vocab size and pack by its "
                    "token counts; exclusive with --bpe-merges")
    ap.add_argument("--pack-buckets", type=int, default=64,
                    help="packing parallelism; size so a bucket's (id, len) "
                    "metadata fits one task — small corpora pack tighter "
                    "with fewer buckets")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from markdown_lab_spark.functions import text as X
    from markdown_lab_spark.functions.dedup import (
        benchmark_ngrams,
        decontaminate,
        exact_dedup,
        near_dedup_keep,
    )
    from markdown_lab_spark.functions.packing import pack_sequences, packing_stats
    from markdown_lab_spark.functions.sampling import deterministic_sample

    spark = (
        SparkSession.builder.appName("markdown_lab_spark-curation")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    docs = spark.read.parquet(args.input)
    counts = {"input": docs.count()}

    # 0. text repair (mojibake / normalize / controls) before any gate
    # reads the text — corrupt bytes would otherwise skew lang/quality
    if args.fix_text:
        from markdown_lab_spark.functions.fixtext import fix_text_udf

        docs = docs.withColumn("text", fix_text_udf()(F.col("text")))

    # 1. cheap row-local gates first: lang + quality
    if args.lang:
        docs = docs.filter(X.predicted_lang(F.col("text")) == args.lang)
    docs = docs.filter(X.quality_score(F.col("text")) >= args.min_quality)
    counts["lang_quality"] = docs.count()

    # 2. C4 cleaning rewrites text; page keep drops empty survivors
    if not args.no_c4:
        docs = docs.withColumn("text", X.c4_clean_text(F.col("text"))).filter(
            X.c4_page_keep(F.col("text"))
        )
        counts["c4"] = docs.count()

    # 3. Gopher repetition/shape gate
    if not args.no_gopher:
        docs = docs.filter(X.gopher_keep(F.col("text")))
        counts["gopher"] = docs.count()

    # 4. exact dedup (content hash, min-id representative)
    if not args.no_exact_dedup:
        keep = exact_dedup(docs, "doc_id", "text").select(
            F.col("keep_id").alias("doc_id")
        )
        docs = docs.join(keep, on="doc_id", how="left_semi")
        counts["exact_dedup"] = docs.count()

    # 5. fuzzy dedup with transitive cluster resolution
    if not args.no_fuzzy_dedup:
        docs = near_dedup_keep(
            docs,
            "doc_id",
            "text",
            k=args.lsh_k,
            bands=args.lsh_bands,
            min_jaccard=args.min_jaccard,
        )
        counts["fuzzy_dedup"] = docs.count()

    # 5b. exact substring dedup: cut duplicated spans, keep the remainder
    if args.substr_dedup_len > 0:
        from markdown_lab_spark.functions.dedup import dedup_substrings

        cleaned = dedup_substrings(
            docs, "doc_id", "text", length=args.substr_dedup_len
        ).select(
            F.col("id").alias("doc_id"),
            F.col("kept_text").alias("_new_text"),
            (F.col("total_tokens") - F.col("removed_tokens")).alias("_kept_n"),
        )
        docs = (
            docs.join(cleaned, on="doc_id", how="inner")
            .filter(F.col("_kept_n") >= 10)
            .withColumn("text", F.col("_new_text"))
            .drop("_new_text", "_kept_n")
        )
        counts["substr_dedup"] = docs.count()

    # 6. benchmark decontamination
    if args.bench:
        bench = spark.read.parquet(args.bench).select(
            F.col(args.bench_text_col).alias("text")
        )
        bn = benchmark_ngrams(bench, "text", 13)
        verdict = decontaminate(docs, "doc_id", "text", bn, 13)
        docs = docs.join(
            verdict.filter(F.col("keep")).select("doc_id"), on="doc_id", how="left_semi"
        )
        counts["decontaminated"] = docs.count()

    # 7. CCNet-style perplexity cut against a trusted-reference LM
    if args.lm_ref:
        from markdown_lab_spark.functions.lm import (
            perplexity_buckets,
            score_docs,
            train_ngram_lm,
        )

        ref = spark.read.parquet(args.lm_ref).select(F.col("text"))
        lm = train_ngram_lm(ref, "text", args.lm_order)
        buckets = perplexity_buckets(score_docs(docs, lm), n_buckets=3)
        keep = buckets.filter(F.col("bucket") < args.lm_keep_buckets).select("doc_id")
        docs = docs.join(keep, on="doc_id", how="left_semi")
        counts["perplexity"] = docs.count()

    # 7b. model-based quality filter (GPT-3 appendix A / DCLM shape):
    # positives = the trusted reference corpus, negatives = a
    # deterministic sample of the current corpus, NB log-odds weights
    # (optionally logreg-refined), keep score >= threshold
    if args.classifier_ref:
        from markdown_lab_spark.functions.classifier import (
            nb_logodds_weights,
            score_docs as clf_score,
            train_logreg,
        )

        pos = (
            spark.read.parquet(args.classifier_ref)
            .select(F.col("text"))
            .withColumn("_lid", -(F.monotonically_increasing_id() + 1))
            .withColumn("_ly", F.lit(True))
        )
        neg = (
            deterministic_sample(
                docs, "doc_id", args.classifier_neg_sample, args.salt + ":clf"
            )
            .select(F.col("doc_id").alias("_lid"), "text")
            .withColumn("_ly", F.lit(False))
        )
        labeled = pos.select("_lid", "text", "_ly").unionByName(neg)
        if args.classifier_iters > 0:
            weights, _ = train_logreg(
                labeled, "_lid", "text", "_ly",
                iters=args.classifier_iters, min_df=args.classifier_min_df,
                vocab_size=args.classifier_vocab,
            )
        else:
            weights = nb_logodds_weights(
                labeled, "_lid", "text", "_ly",
                min_df=args.classifier_min_df, vocab_size=args.classifier_vocab,
            )
        keep = (
            clf_score(docs, weights, "doc_id", "text")
            .filter(F.col("score") >= args.classifier_threshold)
            .select("doc_id")
        )
        docs = docs.join(keep, on="doc_id", how="left_semi")
        counts["classifier"] = docs.count()

    # 8. source-mix temperature weighting (p_i ∝ n_i^alpha, the
    # GPT-3/LLaMA multi-corpus rule), then reproducible subsample
    if args.mix_alpha is not None:
        from markdown_lab_spark.functions.sampling import (
            stratified_sample,
            temperature_mix_fractions,
        )

        if "source" not in docs.columns:
            raise SystemExit("--mix-alpha needs a 'source' column")
        fr = temperature_mix_fractions(
            docs, "source", alpha=args.mix_alpha,
            target_rows=args.mix_target_rows,
        )
        docs = stratified_sample(
            docs, "doc_id", "source", fr, salt=args.salt + ":mix"
        )
        counts["mixed"] = docs.count()
    # 8a. SemDedup (Abbas et al. 2023): semantic near-dup removal over
    # the embedding column — k-means cells, within-cell cosine pairs,
    # keep the group member farthest from its centroid
    if args.semdedup_threshold > 0:
        from markdown_lab_spark.functions.similarity import semdedup_keep

        if "embedding" not in docs.columns:
            raise SystemExit("--semdedup-threshold needs an 'embedding' column")
        docs = semdedup_keep(
            docs, "doc_id", "embedding",
            k=args.semdedup_k, threshold=args.semdedup_threshold,
        )
        counts["semdedup"] = docs.count()

    # 8b. DSIR importance resampling toward a trusted target corpus
    # (Xie et al. 2023): fit hashed-n-gram models over target and raw,
    # Gumbel-top-k the importance weights. An alternative final
    # selection to the plain keep-fraction subsample.
    if args.dsir_ref:
        from markdown_lab_spark.functions.dsir import dsir_resample

        if args.dsir_k <= 0:
            raise SystemExit("--dsir-ref needs --dsir-k > 0")
        tgt = spark.read.parquet(args.dsir_ref).select(
            F.monotonically_increasing_id().alias("doc_id"), "text"
        )
        docs = dsir_resample(
            docs, "doc_id", "text", tgt, args.dsir_k,
            buckets=args.dsir_buckets, salt=args.salt + ":dsir",
        ).drop("logweight", "gumbel", "rank")
        counts["dsir"] = docs.count()
    if args.sample < 1.0:
        docs = deterministic_sample(docs, "doc_id", args.sample, args.salt)
        counts["sampled"] = docs.count()

    if args.bpe_merges > 0 and args.unigram_vocab > 0:
        raise SystemExit("--bpe-merges and --unigram-vocab are exclusive")
    if args.bpe_merges > 0:
        from markdown_lab_spark.functions.bpe import bpe_token_count, train_bpe

        merges = train_bpe(
            docs, n_merges=args.bpe_merges, sample_fraction=args.bpe_sample
        )
        docs = bpe_token_count(docs, merges, out_col="n_tokens")
        counts["bpe_merges"] = len(merges)
    elif args.unigram_vocab > 0:
        from markdown_lab_spark.functions.unigram import (
            train_unigram,
            unigram_token_count,
        )

        model = train_unigram(
            docs, vocab_size=args.unigram_vocab,
            sample_fraction=args.bpe_sample,
        )
        docs = unigram_token_count(docs, model, out_col="n_tokens")
        counts["unigram_pieces"] = len(model)
    else:
        docs = docs.withColumn(
            "n_tokens", X.ws_token_count(F.col("text")).cast("long")
        )
    docs.write.mode("overwrite").parquet(os.path.join(args.output, "documents.parquet"))

    if args.wet_out:
        from markdown_lab_spark.sources.warc import write_wet

        wet_in = docs
        if "url" not in wet_in.columns:
            wet_in = wet_in.withColumn(
                "url", F.concat(F.lit("urn:mls:doc:"), F.col("doc_id"))
            )
        if "warc_ts" not in wet_in.columns:
            wet_in = wet_in.withColumn(
                "warc_ts", F.to_timestamp(F.lit("2000-01-01 00:00:00"))
            )
        manifest = write_wet(
            wet_in, args.wet_out, compression=args.wet_compression
        ).collect()
        counts["wet_files"] = len(manifest)
        counts["wet_records"] = int(sum(r["n_records"] for r in manifest))

    # 9. pack into fixed-token-budget sequences
    if args.target_len > 0:
        assign = pack_sequences(
            docs, "doc_id", "n_tokens", args.target_len, n_buckets=args.pack_buckets
        )
        assign.write.mode("overwrite").parquet(
            os.path.join(args.output, "packing.parquet")
        )
        st = packing_stats(
            spark.read.parquet(os.path.join(args.output, "packing.parquet")),
            args.target_len,
        ).collect()[0]
        counts["packs"] = st["n_packs"]
        counts["mean_fill"] = round(float(st["mean_fill"] or 0.0), 4)
        counts["overflow_docs"] = st["overflow_docs"]

    print(json.dumps({"curation": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
