"""Duplicate-cluster resolution: connected_components + dedup_near_duplicates.

Reference oracle is a sequential union-find (path compression + union by
root id keeps the canonical min-id label), cross-checked on hand-built
topologies, seeded random graphs, and a DuckDB recursive-CTE twin (the
same formulation the q60 driver gate uses).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from markdown_lab_spark.functions.dedup import (
    connected_components,
    dedup_near_duplicates,
)


def uf_components(pairs):
    """Sequential union-find reference: {node: min-id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by id so the root IS the min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def spark_components(spark, pairs):
    if not pairs:
        df = spark.createDataFrame([], "id_a long, id_b long")
    else:
        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = connected_components(df, "id_a", "id_b")
    rows = out.collect()
    labels = {r["node"]: r["component"] for r in rows}
    assert len(labels) == len(rows), "a node was labeled twice"
    return labels


def test_empty_pairs(spark):
    assert spark_components(spark, []) == {}


def test_single_pair_and_self_loop(spark):
    assert spark_components(spark, [(2, 1), (3, 3)]) == {1: 1, 2: 1}


def test_long_path_converges(spark):
    # a 120-node path is the adversarial case for naive min-propagation
    # (it needs O(diameter) rounds); star-contraction needs O(log)
    pairs = [(i, i + 1) for i in range(120)]
    labels = spark_components(spark, pairs)
    assert set(labels.values()) == {0}
    assert len(labels) == 121


def test_cliques_bridges_and_isolated_edge(spark):
    pairs = (
        [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]  # clique
        + [(20, 21), (21, 22)]  # path
        + [(13, 20)]  # bridge joins them
        + [(40, 41)]  # separate component
    )
    labels = spark_components(spark, pairs)
    assert uf_components(pairs) == labels
    assert labels[40] == 40 and labels[22] == 10


def test_string_ids(spark):
    pairs = [("b", "a"), ("c", "b"), ("zz", "y")]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    labels = {
        r["node"]: r["component"]
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    assert labels == {"a": "a", "b": "a", "c": "a", "y": "y", "zz": "y"}


@pytest.mark.parametrize("seed,n,m", [(7, 60, 30), (11, 200, 150), (13, 500, 520)])
def test_random_graphs_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert spark_components(spark, pairs) == uf_components(pairs)


def test_matches_duckdb_recursive_cte(spark):
    # the q60 gate's oracle formulation, on an independent random graph
    rng = random.Random(23)
    pairs = sorted({(a, b) for a, b in ((rng.randrange(80), rng.randrange(80)) for _ in range(70)) if a != b})
    con = duckdb.connect()
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    oracle = dict(
        con.execute(
            """
            WITH RECURSIVE edges AS (
              SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p
            ),
            reach(node, lab) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
            )
            SELECT node, min(lab) FROM reach GROUP BY node
            """
        ).fetchall()
    )
    assert spark_components(spark, pairs) == oracle


def test_dedup_keeps_min_id_per_cluster_and_passes_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(12)], ["doc_id", "text"]
    )
    # clusters {1,2,3} (chain) and {7,9}; 0,4,5,6,8,10,11 untouched
    pairs = spark.createDataFrame(
        [(2, 1), (3, 2), (9, 7)], ["id_a", "id_b"]
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_near_duplicates(docs, "doc_id", pairs).collect()
    )
    assert kept == [0, 1, 4, 5, 6, 7, 8, 10, 11]


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, "id_a", "id_b", max_rounds=1)


def test_near_dedup_keep_collapses_transitive_chain(spark):
    """End-to-end fuzzy dedup (minhash -> LSH candidates -> exact-Jaccard
    verify -> connected components -> keep min-id): a sliding-window
    chain where only ADJACENT docs clear the Jaccard threshold must
    still collapse to ONE representative — the transitivity only the
    component step provides ("keep one per pair" would keep every other
    doc)."""
    from markdown_lab_spark.functions.dedup import near_dedup_keep

    words = [f"w{i}" for i in range(200)]
    rows = [
        (i, " ".join(words[i * 4 : i * 4 + 40]))  # stride 4, window 40
        for i in range(6)
    ]
    rows.append((50, " ".join(f"z{i}" for i in range(40))))  # unrelated
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # bands=8 (2 rows/band): ~0.9997 candidate recall at J=0.8 — at 4-row
    # bands one adjacent pair deterministically misses banding (md5 lanes
    # are fixed), which is the LSH recall/precision dial, not a bug
    kept = sorted(
        r["doc_id"]
        for r in near_dedup_keep(
            df, "doc_id", "text", k=16, bands=8, min_jaccard=0.8
        ).collect()
    )
    assert kept == [0, 50]
    # sanity on the premise: adjacent pairs verify, skip-pairs don't
    from markdown_lab_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.8).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_hub_skew_and_long_path_drill(spark):
    """Scale-shape drill: a 10k-leaf hub (in-neighborhood skew absorbed
    by the partial-agg min) bridged to a 500-node path (log-round star
    contraction). One component, labels match union-find, and the
    default round budget is not exhausted."""
    hub = [(0, i) for i in range(1, 10_001)]
    path = [(10_000 + i, 10_001 + i) for i in range(500)]
    bridge = [(10_000, 0)]
    pairs = hub + path + bridge
    labels = spark_components(spark, pairs)
    assert set(labels.values()) == {0}
    assert len(labels) == 10_501  # nodes 0..10500
    assert uf_components(pairs) == labels
