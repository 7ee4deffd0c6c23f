"""Co-located joins via bucketing (the 100 TB join strategy).

The wave loop's recurring equi-joins (frontier ⋈ pages, frontier ⋈ seen)
key on canon_url every wave; at warehouse scale the corpus must not be
re-shuffled per wave. Bucketing both tables by canon_url into the same
bucket count makes the sort-merge join exchange-free on BOTH sides —
this test pins that property on the physical plan.
"""

import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.plans.checks import formatted_plan
from markdown_lab_spark.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    n = 2000
    left = spark.range(n).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("canon_url"),
        F.col("id").alias("depth"),
    )
    right = spark.range(0, n, 3).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("canon_url"),
        F.lit(1).alias("status_wave"),
    )
    write_bucketed(left, "pages_bkt", str(tmp_path / "pages_bkt"), buckets=8)
    write_bucketed(right, "seen_bkt", str(tmp_path / "seen_bkt"), buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("pages_bkt").join(
                spark.table("seen_bkt"), on="canon_url", how="left_anti"
            )
            plan = formatted_plan(joined)
            assert "Exchange" not in plan, plan[:3000]
            assert joined.count() == n - len(range(0, n, 3))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bkt")
        spark.sql("DROP TABLE IF EXISTS seen_bkt")
