#!/usr/bin/env python
"""Dump .explain("formatted") for every bench query into plans/r06/.

Usage: python scripts/dump_plans_r06.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt (suffix = before | after).

Optimization-round deliverable: the judge checks plan claims against
these files. sf0.1 plans, same session configs as bench.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.argv_suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

import bench
import __spark_entry__ as entrymod
from markdown_lab_spark.plans.checks import formatted_plan

spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")

outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "plans", "r06")
os.makedirs(outdir, exist_ok=True)

qs = entrymod.queries()
for name in bench.BENCH_QUERIES:
    if name not in qs or (only and name not in only):
        continue
    try:
        df = qs[name](spark, SF_DIR)
        plan = formatted_plan(df)
    except Exception as e:  # noqa: BLE001
        plan = f"PLAN ERROR: {e!r}"
    path = os.path.join(outdir, f"{name}_{sys.argv_suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)", flush=True)
spark.stop()
