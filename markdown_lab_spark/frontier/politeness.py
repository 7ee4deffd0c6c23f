"""Per-host politeness scheduler as salted host-partitioned priority queues.

The reference throttles one token per client at ``1/max(0.1, rps)`` seconds
(markdown_lab/core/throttle.py:8-33); wave-synchronously that becomes a
per-host budget of ``floor(rps * wave_seconds)`` fetches per wave, ordered
by (depth ASC, priority DESC, canon_url ASC) — the deterministic analogue
of the reference's discovery-order processing.

Scale note: a plain ``Window.partitionBy(host)`` sends EVERY candidate of a
hot host through one task. ``schedule_wave`` therefore pre-prunes with a
salted two-phase top-K: rank within (host, salt) shards, keep the per-shard
head (budget rows), then run the exact window on the ~salt_n*budget
survivors — the per-host cap stays exact while the heavy sort is spread
over ``salt_n`` tasks. AQE skew handling does NOT cover this (it's a
windowed cap, not a join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols():
    """Deterministic per-host queue order: depth ASC, priority DESC, url ASC."""
    return [F.col("depth").asc(), F.col("priority").desc(), F.col("canon_url").asc()]


def schedule_wave(
    frontier: DataFrame, budget: int, salt_n: int = 16
) -> tuple[DataFrame, DataFrame]:
    """Split a wave's candidates into (scheduled, deferred).

    scheduled: per-host head of at most ``budget`` rows in deterministic
    order; deferred: the remainder (carries to the next wave unchanged).

    Skew design: a host whose candidate count is <= budget is scheduled
    WHOLE with no window at all (the common case — most hosts are small),
    so the expensive per-host sort never sees them and no single task
    carries a mega-host that fits its budget. Only over-budget hosts go
    through the salted two-phase top-K: rank within (host, salt) shards
    first, keep each shard's head, then run the exact window on the
    <= salt_n*budget survivors. The per-host cap stays exact; the heavy
    sort is spread over salt_n tasks.
    """
    # no broadcast hint: at 10^8 hosts the counts side is too big to ship;
    # AQE broadcasts it automatically when it is small
    counts = frontier.groupBy("host").agg(F.count("*").alias("_host_n"))
    tagged = frontier.join(counts, on="host", how="left")

    under = tagged.filter(F.col("_host_n") <= budget).drop("_host_n")
    over = tagged.filter(F.col("_host_n") > budget).drop("_host_n")

    salted = over.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("canon_url")), F.lit(salt_n))
    )
    w_salt = Window.partitionBy("host", "_salt").orderBy(*order_cols())
    pruned = salted.withColumn("_srn", F.row_number().over(w_salt))

    # survivors: at most salt_n * budget rows per host
    survivors = pruned.filter(F.col("_srn") <= budget)
    w_host = Window.partitionBy("host").orderBy(*order_cols())
    ranked = survivors.withColumn("_rn", F.row_number().over(w_host))

    scheduled_over = ranked.filter(F.col("_rn") <= budget).drop("_salt", "_srn", "_rn")
    deferred_a = ranked.filter(F.col("_rn") > budget).drop("_salt", "_srn", "_rn")
    deferred_b = pruned.filter(F.col("_srn") > budget).drop("_salt", "_srn")
    return under.unionByName(scheduled_over), deferred_a.unionByName(deferred_b)


def politeness_budget(rps: float, wave_seconds: int) -> int:
    """floor(rps * wave_seconds), min 1 (throttle.py clamps rps at 0.1)."""
    return max(1, int(max(0.1, rps) * wave_seconds))
