#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 next to its
``oracle_sql()`` DuckDB twin and compares row count, column names/types,
and an order-insensitive value hash (columns sorted by name, rows
canonicalized + sorted, md5).

Usage: python scripts/check_oracle_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.6f}".rstrip("0").rstrip(".")
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canonical(v) for v in value) + "]"
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def df_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canonical(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-parity")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check)")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue

        problems = []
        # The driver canonicalizes via pandas sort_values, which cannot
        # hash list/dict cells — an array-typed result column passes this
        # mirror (canonical() stringifies lists) but errors the driver row
        # (round-3 q41 lesson). Flag it here so the gap can't recur.
        if srows:
            for i, c in enumerate(scols):
                v = srows[0][i]
                if isinstance(v, (list, tuple, dict)):
                    problems.append(
                        f"column {c!r} is array/map-typed — unhashable in the "
                        "driver's pandas canonicalization; project to scalar"
                    )
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sh, dh = df_hash(srows, scols), df_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                sset = {
                    "\x1f".join(
                        canonical(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                dset = {
                    "\x1f".join(
                        canonical(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    problems.append(f"  spark-only: {x[:160]}")
                for x in list(dset - sset)[:3]:
                    problems.append(f"  duck-only : {x[:160]}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"OK    {name} ({dt:.1f}s): {len(srows)} rows match")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
