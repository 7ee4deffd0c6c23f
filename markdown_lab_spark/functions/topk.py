"""Window-free distributed top-k with rank.

A partition-less ``Window.orderBy`` funnels the ENTIRE input through one
task (Spark warns 'No Partition Defined for Window operation') — a
single-node sort at 100 TB. The scale-safe shape is:

1. ``orderBy(keys).limit(k)`` — compiles to TakeOrderedAndProject, a
   distributed partial top-k (per-partition bounded heaps, one tiny
   final merge of ``num_partitions * k`` rows);
2. rank the k survivors via one global aggregate of k rows
   (``collect_list`` -> ``array_sort`` -> ``posexplode``), which is O(k)
   no matter how large the input was and contains no Window node at all.

Catalyst constant-folds a ``Window.partitionBy(lit(...))`` workaround back
to an empty partition spec, so the aggregate route is the only one that
keeps ``plans.checks.assert_no_partitionless_window`` true.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    k: int,
    keys: Sequence[Tuple[Column, bool]],
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows of ``df`` by ``keys`` with a 1-based ``rank_col``.

    ``keys``: (column, descending) pairs; descending keys must be numeric
    (rank order inside the k-row aggregate is realized by sorting structs
    of negated keys). Ties must be broken by later keys for determinism.
    """
    sort_cols = [c.desc() if d else c.asc() for c, d in keys]
    top = df.orderBy(*sort_cols).limit(k)

    skey = [((-c) if d else c).alias(f"_k{i}") for i, (c, d) in enumerate(keys)]
    payload = F.struct(*[F.col(name) for name in df.columns]).alias("_row")
    arr = top.agg(F.array_sort(F.collect_list(F.struct(*skey, payload))).alias("_a"))
    return arr.select(F.posexplode("_a").alias("_pos", "_r")).select(
        *[F.col(f"_r._row.{name}").alias(name) for name in df.columns],
        (F.col("_pos") + 1).cast("long").alias(rank_col),
    )
