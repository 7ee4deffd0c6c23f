"""Physical-plan assertions — scale-proofing tools.

A plan that silently loses predicate pushdown or flips a broadcast join to
a shuffle join is a 100x regression at 100 TB; these helpers make the
intended plan an executable assertion (used in tests and available for
production preflight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}\n--- plan ---\n{plan[:4000]}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan contains {present}\n--- plan ---\n{plan[:4000]}")


def assert_pushed_filters(df: DataFrame) -> None:
    """Parquet scan carries PushedFilters (predicate reached the reader)."""
    plan = formatted_plan(df)
    if "PushedFilters: [" not in plan or "PushedFilters: []" in plan:
        raise AssertionError(f"no pushed filters\n--- plan ---\n{plan[:4000]}")


def assert_broadcast_join(df: DataFrame) -> None:
    assert_in_plan(df, "BroadcastHashJoin")


def _iter_logical(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_logical(node.children().apply(i))


def assert_no_partitionless_window(df: DataFrame) -> None:
    """No Window node with an empty partition spec.

    A partition-less window moves EVERY row to one task (Spark's
    'WindowExec: No Partition Defined' warning) — a full single-node sort
    at 100 TB. Top-k must be orderBy().limit() (TakeOrderedAndProject);
    ranking may window only over an already-bounded input with a
    partition spec.
    """
    plan = df._jdf.queryExecution().optimizedPlan()  # type: ignore[attr-defined]
    for node in _iter_logical(plan):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            raise AssertionError(
                "partition-less Window in plan (single-partition sort):\n"
                + node.toString()
            )


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema of the first scan (column-pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            return line.strip()
    return ""
