"""Scale drills for the banded near-dup operators (round-2 additions).

Two properties matter at 10^10 rows:
1. exactness — banded candidate generation must not lose true pairs
   (pigeonhole guarantee for SimHash-Hamming; empirical-complete for
   hyperplane-LSH at the 0.99 cosine bar);
2. pruning — candidates must stay far below n^2/2, otherwise the
   within-bucket join is the round-1 scale-killer the verdict flagged.
"""

import os

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions import dedup as D
from markdown_lab_spark.functions.similarity import cosine_similarity_col

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _synth_neardups(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    leaders = emb.select(
        F.col("vec_id").alias("lid"), F.col("embedding").alias("lvec")
    )
    return (
        emb.withColumn("lid", F.col("vec_id") - (F.col("vec_id") % 7))
        .join(leaders, on="lid", how="left")
        .select(
            "vec_id",
            F.when((F.col("vec_id") % 7) < 2, F.col("lvec"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    )


def _brute_force_pairs(df, threshold):
    left, right = df.alias("l"), df.alias("r")
    return (
        left.join(right, F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
            F.round(
                cosine_similarity_col(F.col("l.embedding"), F.col("r.embedding")), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def test_banded_embedding_neardup_complete_vs_bruteforce(spark):
    synth = _synth_neardups(spark).cache()
    banded = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_neardup_pairs_banded(
            synth, threshold=0.99, nbits=16, bands=4, dim=64
        ).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in _brute_force_pairs(synth, 0.99).collect()
    }
    synth.unpersist()
    assert banded == brute
    assert banded, "drill corpus must contain near-dup pairs"


def test_baseline_neardup_agrees_with_banded(spark):
    """Round-4 replacement for the retired q34 driver gate: the unbanded
    correctness baseline (embedding_neardup_pairs, quadratic-within-bucket)
    and the banded scale path must return the identical pair set on the
    synthesized near-dup corpus."""
    synth = _synth_neardups(spark).cache()
    baseline = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in D.embedding_neardup_pairs(
            synth, "vec_id", "embedding", 0.99, 8
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in D.embedding_neardup_pairs_banded(
            synth, threshold=0.99, nbits=32, bands=4, dim=64
        ).collect()
    }
    synth.unpersist()
    # the 8-bit sign bucket of the baseline can only LOSE pairs vs the
    # 4x8-bit banded OR — on this corpus both are empirically complete
    assert baseline == banded
    assert baseline, "drill corpus must contain near-dup pairs"


def test_banded_candidates_prune_quadratic(spark):
    """Candidate pairs (pre-cosine) << n^2/2 — the whole point of banding."""
    synth = _synth_neardups(spark)
    n = synth.count()
    cand = D.embedding_neardup_pairs_banded(
        synth, threshold=-1.0, nbits=16, bands=4, dim=64
    ).count()  # threshold=-1 keeps every candidate pair
    all_pairs = n * (n - 1) // 2
    # 4 bands of 4 unbiased bits: expected collision rate ~4/16 = 25%
    # plus the injected duplicate groups; anything close to all_pairs
    # means the hyperplanes degenerated (round-1's axis-bucket failure)
    assert cand < 0.5 * all_pairs, (cand, all_pairs)


def test_simhash_hamming_banding_is_exhaustive(spark):
    """Pigeonhole: bands=8 must find EVERY pair at hamming <= 7."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter((F.col("doc_id") % 10) < 3)
        .limit(60)
        .withColumn(
            "content",
            F.concat(
                F.lit("shared block "),
                F.floor(F.col("doc_id") / 30).cast("string"),
                F.lit(" lorem ipsum dolor sit amet consectetur adipiscing tok"),
                (F.col("doc_id") % 3).cast("string"),
            ),
        )
    )
    fps = D.simhash64(docs, "doc_id", "content").cache()
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_hamming_pairs(fps, bands=8, max_hamming=7).collect()
    }
    left, right = fps.alias("l"), fps.alias("r")

    def _half(c, start):
        return F.conv(F.substring(c, start, 32), 2, 10).cast("long")

    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in (
            left.join(right, F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("id_a"),
                F.col("r.doc_id").alias("id_b"),
                (
                    F.bit_count(
                        _half(F.col("l.simhash"), 1).bitwiseXOR(
                            _half(F.col("r.simhash"), 1)
                        )
                    )
                    + F.bit_count(
                        _half(F.col("l.simhash"), 33).bitwiseXOR(
                            _half(F.col("r.simhash"), 33)
                        )
                    )
                ).cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= 7)
        ).collect()
    }
    fps.unpersist()
    assert banded == brute
    assert banded, "drill corpus must contain close fingerprints"


def _planted_neardup_docs(spark, n):
    """n docs, every doc_id%5==0 has a near-dup at doc_id+1 (one word
    swapped out of ~40 — Jaccard ~0.9 at 3-shingles); deterministic."""
    from pyspark.sql import functions as F

    def stream(owner):
        # per-doc disjoint vocabulary: cross-doc shingle overlap is exactly
        # zero except for the planted near-dups
        return F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.concat(
                F.lit("w"), owner.cast("string"), F.lit("_"), i.cast("string")
            ),
        )

    base = spark.range(n).select(F.col("id").cast("int").alias("doc_id"))
    text = F.concat_ws(" ", stream(F.col("doc_id")))
    # near-dups: doc_id%5==1 copies doc_id-1's word stream (doc_id-1 is
    # %5==0), then swaps one word
    prev_words = stream(F.col("doc_id") - 1)
    near = F.concat_ws(
        " ", F.slice(prev_words, 1, 20), F.lit("SWAPPED"), F.slice(prev_words, 22, 19)
    )
    return base.select(
        "doc_id",
        F.when((F.col("doc_id") % 5) == 1, near).otherwise(text).alias("text"),
    )


def test_minhash_production_width_drill(spark):
    """k=128 / bands=32 (the width real pipelines run): every planted
    near-dup pair is found, and the CANDIDATE count (pre-threshold) grows
    ~linearly with corpus size — the banding economics that make the
    self-join O(true dups), not O(n^2)."""
    from markdown_lab_spark.functions.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    counts = {}
    for n in (200, 400):
        docs = _planted_neardup_docs(spark, n)
        sigs = minhash_signatures(docs, "doc_id", "text", k=128)
        # min_est_jaccard=0 -> ALL banding candidates, none filtered
        cands = minhash_lsh_pairs(
            sigs, "doc_id", k=128, bands=32, min_est_jaccard=0.0
        )
        rows = cands.collect()
        counts[n] = len(rows)
        planted = {
            (i, i + 1) for i in range(0, n - 1, 5)
        }
        found = {(r["id_a"], r["id_b"]) for r in rows}
        missing = planted - found
        assert not missing, f"n={n}: planted pairs missed: {sorted(missing)[:5]}"
        # planted pairs estimate high jaccard (1 word of 40 swapped)
        est = {
            (r["id_a"], r["id_b"]): r["est_jaccard"] for r in rows
        }
        assert all(est[p] >= 0.5 for p in planted)

    # linear-ish candidate growth: 2x corpus -> ~2x candidates. A
    # quadratic self-join would be ~4x. Allow generous noise margin.
    assert counts[400] <= 3 * counts[200], counts
    # and candidates stay O(true dups): planted pairs dominate
    assert counts[400] <= 4 * (400 // 5), counts


def test_minhash_arrow_expr_agree(spark):
    """The Arrow-batched minhash_signatures (round-6: shingles never
    leave their doc's row) must equal the expression twin the DuckDB
    oracle mirrors — including the null-text row (which the expr form
    KEEPS with the empty-string pseudo-gram), short texts below the
    shingle width, and whitespace-class edges."""
    rows = [
        (1, "hello world foo bar baz"),
        (2, ""),
        (3, "a b"),
        (4, "one"),
        (5, None),
        (6, "unicode café über tökens x"),
        (7, "t " * 300),
        (8, "tab\tsep\nnl\x0bvt\ffd\rcr end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    for frame in (df, corpus):
        a = sorted(
            map(
                tuple,
                D.minhash_signatures(frame, "doc_id", "text", k=8).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                D.minhash_signatures(
                    frame, "doc_id", "text", k=8, impl="expr"
                ).collect(),
            )
        )
        assert a == b


def test_simhash64_arrow_expr_agree(spark):
    """The Arrow-batched simhash64 (round-6: no explode, no shuffle) must
    be bit-identical to the expression twin the DuckDB oracle mirrors —
    including the whitespace-class edge cases: Spark trim strips 0x20
    only, Java \\s+ is the ASCII class, and leading/trailing separators
    emit '' pseudo-tokens that vote like any other token."""
    rows = [
        (1, "hello world hello"),
        (2, ""),
        (3, "  \t leading"),
        (4, "trailing \n "),
        (5, None),
        (6, "unicode café über tökens"),
        (7, "a" * 5000 + " b c"),
        (8, "tab\tsep\nnewline\x0bvtab\ffeed\rcr"),
        (9, " "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    for frame in (df, corpus):
        a = sorted(
            map(tuple, D.simhash64(frame, "doc_id", "text").collect())
        )
        b = sorted(
            map(
                tuple,
                D.simhash64(frame, "doc_id", "text", impl="expr").collect(),
            )
        )
        assert a == b


def test_rademacher_signature_pandas_jvm_agree(spark):
    """The Arrow-batched numpy signature must be bit-identical to the
    pure-expression fold (which the DuckDB oracle unrolls): the numpy
    path adds the ±x_j terms in the same left-to-right order, so every
    sign bit agrees even for dot products within one ulp of zero."""
    planes = D.rademacher_hyperplanes(32, 64)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    mismatches = emb.select(
        D.rademacher_signature_col(F.col("embedding"), planes, jvm=False).alias("a"),
        D.rademacher_signature_col(F.col("embedding"), planes, jvm=True).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert mismatches.count() == 0


def test_rademacher_signature_agreement_adversarial(spark):
    """Vectors engineered so many hyperplane dots land within a few ulp of
    zero — the only place the numpy path could diverge from the JVM fold
    if its summation order differed. Mixed magnitudes force catastrophic
    cancellation; sign agreement must still be bit-exact."""
    import math
    import random

    rng = random.Random(20260816)
    rows = []
    for i in range(200):
        if i % 4 == 0:
            # cancellation pairs: +v, -v interleaved, tiny residue
            v = [rng.uniform(-1, 1) for _ in range(32)]
            vec = [x for pair in zip(v, [-x for x in v]) for x in pair]
            vec[-1] += rng.choice([0.0, 1e-17, -1e-17])
        elif i % 4 == 1:
            # mixed magnitudes across 12 decades
            vec = [
                rng.uniform(-1, 1) * (10.0 ** rng.randint(-6, 6))
                for _ in range(64)
            ]
        elif i % 4 == 2:
            # subnormal-scale values
            vec = [rng.uniform(-1, 1) * 1e-310 for _ in range(64)]
        else:
            vec = [rng.uniform(-1e3, 1e3) for _ in range(64)]
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = D.rademacher_hyperplanes(64, 64)
    bad = df.select(
        D.rademacher_signature_col(F.col("embedding"), planes, jvm=False).alias("a"),
        D.rademacher_signature_col(F.col("embedding"), planes, jvm=True).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0
    assert all(math.isfinite(x) for r in rows for x in r[1])


def test_int8_quantization_roundtrip_and_cosine(spark):
    """Symmetric per-vector int8 quantization: error bound, zero-vector
    edge, tinyint schema, and cosine-on-quantized within tolerance of
    exact cosine (scales cancel)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from markdown_lab_spark.functions.similarity import (
        cosine_similarity_col,
        cosine_similarity_int8,
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(0, 3, 16)]) for i in range(40)]
    rows.append((100, [0.0] * 16))  # all-zero edge
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = quantize_embeddings_int8(df)
    field = dict(q.dtypes)["q_embedding"]
    assert field == "array<tinyint>"  # the 4x storage claim is the type
    d = dequantize_embeddings_int8(q)
    for r in d.collect():
        e, dq, s = np.array(r["embedding"]), np.array(r["embedding_deq"]), r["embedding_scale"]
        if r["vec_id"] == 100:
            assert s == 0.0 and (dq == 0).all()
        else:
            assert np.abs(e - dq).max() <= 0.5 * s + 1e-6
            assert np.abs(np.array(r["q_embedding"])).max() <= 127
    pairs = (
        q.alias("a")
        .crossJoin(q.alias("b"))
        .where((F.col("a.vec_id") < F.col("b.vec_id")) & (F.col("b.vec_id") != 100))
        .where(F.col("a.vec_id") != 100)
        .select(
            cosine_similarity_col(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
            cosine_similarity_int8(F.col("a.q_embedding"), F.col("b.q_embedding")).alias("cq"),
        )
        .collect()
    )
    assert pairs and max(abs(r["c"] - r["cq"]) for r in pairs) < 0.02
    # zero vector: int8 cosine defined as 0
    z = (
        q.alias("a").crossJoin(q.alias("b"))
        .where((F.col("a.vec_id") == 100) & (F.col("b.vec_id") == 0))
        .select(cosine_similarity_int8(F.col("a.q_embedding"), F.col("b.q_embedding")).alias("cq"))
        .collect()[0]["cq"]
    )
    assert z == 0.0
