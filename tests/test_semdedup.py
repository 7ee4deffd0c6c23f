"""SemDedup (Abbas et al. 2023) — closed-form Python reference for the
keep rule, a DuckDB cross-oracle for the within-cluster pair stage,
cluster-chaining semantics, and plan guards."""

import math

import duckdb
import pytest

from markdown_lab_spark.functions.similarity import (
    kmeans_train_centroids,
    semdedup_keep,
    semdedup_pairs,
)
from markdown_lab_spark.plans.checks import (
    assert_no_partitionless_window,
    formatted_plan,
)


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


# three well-separated directions; within each, a duplicate family of
# slightly-perturbed copies plus one genuinely distinct member.
#   group A (dir x): ids 1,2,3 near-identical; id 4 rotated away
#   group B (dir y): ids 10,11 near-identical chain via 12
#     (cos(10,12) and cos(11,12) above threshold is NOT required —
#      chain: 10~11, 11~12 forces {10,11,12} into one component)
#   group C (dir z): singleton id 20
VECS = {
    1: _unit([1.0, 0.0, 0.0, 0.02]),
    2: _unit([1.0, 0.01, 0.0, 0.0]),
    3: _unit([1.0, 0.0, 0.015, 0.0]),
    4: _unit([1.0, 0.6, 0.0, 0.0]),  # same cell, below dup threshold
    10: _unit([0.0, 1.0, 0.0, 0.0]),
    11: _unit([0.0, 1.0, 0.09, 0.0]),
    12: _unit([0.0, 1.0, 0.18, 0.0]),
    20: _unit([0.0, 0.0, 0.0, 1.0]),
}
CENTROIDS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 0.0, 1.0]),
]
THRESH = 0.995


def _cos(a, b):
    return sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def _py_pairs():
    cell = {
        i: max(CENTROIDS, key=lambda c: (_cos(v, c[1]), -c[0]))[0]
        for i, v in VECS.items()
    }
    out = {}
    for a in VECS:
        for b in VECS:
            if a < b and cell[a] == cell[b]:
                c = _cos(VECS[a], VECS[b])
                if c >= THRESH:
                    out[(a, b)] = (c, cell[a])
    return out, cell


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(VECS.items())],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def cents(spark):
    return spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in CENTROIDS],
        "cid long, cvec array<float>",
    )


def test_pairs_match_python_reference(spark, emb, cents):
    got = {
        (r["id_a"], r["id_b"]): (r["cos"], r["cell"])
        for r in semdedup_pairs(emb, cents, threshold=THRESH).collect()
    }
    expect, _ = _py_pairs()
    assert set(got) == set(expect)
    for key, (c, cell) in expect.items():
        assert got[key][0] == pytest.approx(c, rel=1e-6)
        assert got[key][1] == cell
    # the chain structure is as designed: 10-11 and 11-12 pair, 10-12 may not
    assert (10, 11) in got and (11, 12) in got
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert all(4 not in key for key in got)


def test_pairs_match_duckdb_oracle(spark, emb, cents):
    got = {
        (r["id_a"], r["id_b"]) for r in semdedup_pairs(emb, cents, threshold=THRESH).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, v DOUBLE[])")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)", [(i, v) for i, v in sorted(VECS.items())]
    )
    con.execute("CREATE TABLE c(cid BIGINT, cv DOUBLE[])")
    con.executemany("INSERT INTO c VALUES (?, ?)", CENTROIDS)

    def cos(a, b):
        return (
            f"(list_aggregate(list_transform(generate_series(1, len({a})), "
            f"i -> {a}[i] * {b}[i]), 'sum') / "
            f"(sqrt(list_aggregate(list_transform(generate_series(1, len({a})), "
            f"i -> {a}[i] * {a}[i]), 'sum')) * "
            f"sqrt(list_aggregate(list_transform(generate_series(1, len({b})), "
            f"i -> {b}[i] * {b}[i]), 'sum'))))"
        )

    oracle = {
        (r[0], r[1])
        for r in con.execute(
            f"""
            WITH assigned AS (
              SELECT vec_id, v,
                     (SELECT cid FROM c
                      ORDER BY {cos('e.v', 'c.cv')} DESC, cid LIMIT 1) AS cell
              FROM e
            )
            SELECT a.vec_id, b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE {cos('a.v', 'b.v')} >= {THRESH}
            """
        ).fetchall()
    }
    assert got == oracle


def test_keep_rule_and_chaining(spark, emb, cents):
    kept = {
        r["vec_id"]
        for r in semdedup_keep(
            emb, threshold=THRESH, centroids=cents
        ).collect()
    }
    # components: {1,2,3} (clique), {10,11,12} (chain), singletons 4, 20
    # keep rule: LOWEST cosine to own centroid wins (the outlier)
    cell1 = [i for i in (1, 2, 3)]
    keep_a = min(cell1, key=lambda i: (_cos(VECS[i], CENTROIDS[0][1]), i))
    keep_b = min((10, 11, 12), key=lambda i: (_cos(VECS[i], CENTROIDS[1][1]), i))
    assert kept == {keep_a, keep_b, 4, 20}
    # the chain member 12 (farthest from centroid) is the group-B keeper
    assert keep_b == 12


def test_trained_centroids_end_to_end(spark, emb):
    cents = kmeans_train_centroids(emb, k=3, iters=4)
    kept = semdedup_keep(emb, threshold=THRESH, centroids=cents).collect()
    # duplicate families collapse to one member each regardless of the
    # trained centroid positions; singletons survive
    ids = {r["vec_id"] for r in kept}
    assert len(ids & {1, 2, 3}) == 1
    assert len(ids & {10, 11, 12}) == 1
    assert {4, 20} <= ids


def test_plan_shape(spark, emb, cents):
    pairs = semdedup_pairs(emb, cents, threshold=THRESH)
    # the centroid argmax side broadcasts (crossJoin of a k-row table
    # compiles to a broadcast nested-loop, never an exchange of the corpus)
    assert "BroadcastNestedLoopJoin" in formatted_plan(pairs)
    kept = semdedup_keep(emb, threshold=THRESH, centroids=cents)
    assert_no_partitionless_window(kept)


def test_threshold_validation(spark, emb, cents):
    with pytest.raises(ValueError):
        semdedup_pairs(emb, cents, threshold=1.5)
