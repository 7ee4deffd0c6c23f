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


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order: Sequence[Column],
    salt_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """Keep at most ``n`` rows per group in deterministic ``order`` —
    the FineWeb-style per-domain quota, skew-safe.

    A plain ``Window.partitionBy(group)`` sends every row of a mega
    group (one domain hosting 10^8 docs) through one task; instead this
    reuses the politeness scheduler's shape: groups already within quota
    pass through WHOLE with no window at all (the common case), and only
    over-quota groups go through the salted two-phase top-N — rank
    within (group, salt-of-``salt_col``) shards, keep each shard's head,
    then the exact window over <= salt_n*n survivors. The cap is exact;
    the heavy sort spreads over ``salt_n`` tasks.

    ``order`` must be a deterministic total order (break ties with
    ``salt_col``); ``salt_col`` should be a high-cardinality column
    (doc id, url).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    counts = df.groupBy(group_col).agg(F.count("*").alias("_grp_n"))
    tagged = df.join(counts, on=group_col, how="left")
    under = tagged.filter(F.col("_grp_n") <= n).drop("_grp_n")
    over = tagged.filter(F.col("_grp_n") > n).drop("_grp_n")

    salted = over.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_n))
    )
    w_salt = Window.partitionBy(group_col, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_srn", F.row_number().over(w_salt))
        .filter(F.col("_srn") <= n)
        .drop("_srn")
    )
    w_grp = Window.partitionBy(group_col).orderBy(*order)
    kept_over = (
        survivors.withColumn("_rn", F.row_number().over(w_grp))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_salt")
    )
    return under.unionByName(kept_over)
