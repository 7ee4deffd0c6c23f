"""Skew drill for the politeness scheduler (SURVEY.md Phase 4 item 11).

One host holds 50% of the frontier; the per-host cap must stay EXACT and
deterministic under the salted two-phase top-K, under-budget hosts must
bypass the window whole, and the scheduled head must be the true
(depth, -priority, url) minimum."""

from pyspark.sql import functions as F

from markdown_lab_spark.frontier.politeness import politeness_budget, schedule_wave


def _frontier(spark, hot_n=5000, cold_hosts=8, cold_n=80):
    rows = []
    for i in range(hot_n):
        rows.append((f"https://hot.example/p{i:05d}", "hot.example", i % 4, 0.5, 0))
    for h in range(cold_hosts):
        for i in range(cold_n):
            rows.append(
                (f"https://cold{h}.example/p{i:04d}", f"cold{h}.example", i % 3, 0.5, 0)
            )
    # cold_n must stay under the test budget so cold hosts bypass the window
    return spark.createDataFrame(
        rows, "canon_url string, host string, depth int, priority double, attempt int"
    )


def test_exact_budget_under_skew(spark):
    frontier = _frontier(spark)
    budget = 100
    scheduled, deferred = schedule_wave(frontier, budget, salt_n=16)
    per_host = {r["host"]: r["n"] for r in scheduled.groupBy("host").agg(F.count("*").alias("n")).collect()}
    # hot host capped EXACTLY at budget; cold hosts under budget pass whole
    assert per_host["hot.example"] == budget
    for h in range(8):
        assert per_host[f"cold{h}.example"] == 80
    # nothing lost: scheduled + deferred == frontier
    assert scheduled.count() + deferred.count() == frontier.count()
    # deferred is only ever from the over-budget host
    d_hosts = {r["host"] for r in deferred.select("host").distinct().collect()}
    assert d_hosts == {"hot.example"}


def test_scheduled_head_is_true_minimum(spark):
    frontier = _frontier(spark, hot_n=2000, cold_hosts=0)
    budget = 50
    scheduled, _ = schedule_wave(frontier, budget, salt_n=8)
    got = sorted(
        (r["depth"], -r["priority"], r["canon_url"])
        for r in scheduled.collect()
    )
    rows = frontier.collect()
    want = sorted((r["depth"], -r["priority"], r["canon_url"]) for r in rows)[:budget]
    assert got == want  # salting does not change WHICH rows are scheduled


def test_budget_formula():
    assert politeness_budget(1.0, 10) == 10
    assert politeness_budget(0.0, 10) == 1  # rps clamped at 0.1 (throttle.py:21)
    assert politeness_budget(2.5, 4) == 10
