"""Sequence packing: bin documents into fixed-token-budget training rows.

The last pre-tokenization step of a training-data pipeline: after
curation/dedup, documents are concatenated into fixed-length sequences
(e.g. 4096 tokens) so the trainer sees full batches instead of padding.
Packing is bin packing — NP-hard globally, but first-fit-decreasing
(FFD, Johnson 1973: <= 11/9 OPT + 1 bins) inside bounded buckets is the
standard large-scale compromise: pack quality is near-optimal within
each bucket and the work is embarrassingly parallel across buckets.

Determinism is the design constraint (same reason as sampling.py): the
bucket a document packs into is ``xxhash64(salt, id) % n_buckets`` — a
function of row identity — and FFD inside a bucket sorts by
(len DESC, id), so the full (doc -> pack, offset) assignment is
IDENTICAL across runs, partitionings, and task retries. No RNG, no
dependence on Spark's physical split.

Scale shape: one shuffle (groupBy bucket), then a pure-pandas FFD per
bucket via applyInPandas. Size ``n_buckets`` so a bucket's metadata
(ids + lengths, NOT text) fits comfortably in a task — at 10^10 docs,
n_buckets=10^5 leaves ~10^5 rows of (id, len) per task. The output is
an assignment table (id, pack_id, pack_offset, n_tokens) to join back
against the corpus; the heavy text column never enters the shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "id string, pack_id string, pack_offset long, n_tokens long, overflow boolean"
)


def _ffd_pack(pdf: pd.DataFrame, target_len: int) -> pd.DataFrame:
    """First-fit-decreasing within one bucket. Oversize docs (len >
    target) get a pack of their own, flagged ``overflow`` — callers
    truncate or split downstream; silently dropping them would skew the
    corpus, silently packing them would overrun the trainer."""
    bucket = str(pdf["_bucket"].iloc[0])
    pdf = pdf.sort_values(
        ["_len", "id"], ascending=[False, True], kind="mergesort"
    )
    pack_ids, offsets, overflows = [], [], []
    space: list[int] = []  # remaining space per open pack, index = pack no
    for n in pdf["_len"]:
        n = int(n)
        if n > target_len:
            space.append(-1)  # closed: own pack, flagged
            pack_ids.append(len(space) - 1)
            offsets.append(0)
            overflows.append(True)
            continue
        for pi, rem in enumerate(space):
            if rem >= n:
                offsets.append(target_len - rem)
                space[pi] = rem - n
                pack_ids.append(pi)
                break
        else:
            space.append(target_len - n)
            pack_ids.append(len(space) - 1)
            offsets.append(0)
        overflows.append(False)
    return pd.DataFrame(
        {
            "id": pdf["id"].astype(str),
            "pack_id": [f"{bucket}-{p}" for p in pack_ids],
            "pack_offset": offsets,
            "n_tokens": pdf["_len"].astype("int64"),
            "overflow": overflows,
        }
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    target_len: int,
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """(id, pack_id, pack_offset, n_tokens, overflow) assignment packing
    each bucket's documents into sequences of at most ``target_len``
    tokens by first-fit-decreasing. Join the result back on ``id_col``
    to materialize packed sequences; ``pack_offset`` is the token
    position the document starts at inside its pack."""
    if target_len <= 0:
        raise ValueError("target_len must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    slim = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(len_col).cast("long").alias("_len"),
        F.pmod(
            F.xxhash64(F.lit(salt), F.col(id_col).cast("string")),
            F.lit(n_buckets),
        ).alias("_bucket"),
    ).filter(F.col("_len").isNotNull() & (F.col("_len") > 0))
    return slim.groupBy("_bucket").applyInPandas(
        lambda pdf: _ffd_pack(pdf, target_len), PACK_SCHEMA
    )


def packing_stats(assign: DataFrame, target_len: int) -> DataFrame:
    """One-row utilization summary of a pack assignment: pack count,
    mean fill fraction of non-overflow packs, overflow doc count."""
    per_pack = assign.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("overflow").cast("int")).alias("of"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.avg(
            F.when(F.col("of") == 0, F.col("fill") / F.lit(float(target_len)))
        ).alias("mean_fill"),
        F.sum("of").cast("long").alias("overflow_docs"),
    )
