#!/usr/bin/env python
"""Extra per-query benchmarks (guide §1.4) — bench.py itself is frozen.

Per query: min-of-2 warm .count() (bench.py's exact methodology) PLUS the
number of Spark jobs the first run launched (job-cadence diagnostic for
the iterative queries) and an optional noop-sink timing that computes
every column (--noop).

Usage: python bench_extra.py [--noop] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line: {"queries": {name: {"count_sec":..,"jobs":..}}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def main() -> None:
    noop = "--noop" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    import bench
    import __spark_entry__ as entrymod

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    # session warmup (python workers, codegen, parquet footers) so the
    # first measured query doesn't absorb the one-time session costs
    from pyspark.sql import functions as _F
    spark.range(100000).select(_F.pandas_udf("long")(lambda s: s)("id")).count()
    qs["q31_convert_markdown"](spark, SF_DIR).count()
    out: dict = {}
    names = only or [n for n in bench.BENCH_QUERIES if n in qs]
    for name in names:
        sc.setJobGroup(name, name)
        sc.setJobDescription(name)
        best = None
        jobs_first = None
        for attempt in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            dt = time.time() - t0
            if attempt == 0:
                jobs_first = len(sc.statusTracker().getJobIdsForGroup(name))
            best = dt if best is None or dt < best else best
        rec = {"count_sec": round(best, 3), "jobs": jobs_first}
        if noop:
            df = qs[name](spark, SF_DIR)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_sec"] = round(time.time() - t0, 3)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        sc.setJobGroup("", "")
    spark.stop()
    print(json.dumps({"sf": os.path.basename(SF_DIR.rstrip("/")), "queries": out}))


if __name__ == "__main__":
    main()
