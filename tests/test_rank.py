"""Link-graph PageRank (frontier/rank.py) — the priority source for the
politeness queues' score ordering."""

from pyspark.sql import functions as F

from markdown_lab_spark.frontier.rank import host_pagerank_priorities, pagerank


def test_pagerank_two_node_cycle_closed_form(spark):
    """a<->b is fully symmetric: both ranks are exactly 1.0 at every
    iteration (closed form), mass conserved."""
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=7).collect()}
    assert abs(pr["a"] - 1.0) < 1e-12 and abs(pr["b"] - 1.0) < 1e-12


def test_pagerank_ordering_and_mass(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "e")],
        "src string, dst string",
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=30).collect()}
    assert abs(sum(pr.values()) - len(pr)) < 1e-6  # dangling mass kept
    assert max(pr, key=pr.get) == "c"  # highest in-rank
    assert min(pr, key=pr.get) == "d"  # pure source floor
    # convergence: 30 vs 31 iterations move ranks < 1e-3
    pr2 = {r["node"]: r["rank"] for r in pagerank(edges, iters=31).collect()}
    assert max(abs(pr[k] - pr2[k]) for k in pr) < 1e-3


def test_host_pagerank_priorities_scaled(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    hp = {r["host"]: r["priority"] for r in host_pagerank_priorities(edges, 10).collect()}
    assert set(hp) == {"a", "b", "c"}
    assert all(0.0 <= v <= 1.0 for v in hp.values())
    assert max(hp.values()) == 1.0 and min(hp.values()) == 0.0
    # and it plugs straight into the politeness ordering contract
    f = spark.createDataFrame(
        [("u1", "a", 1), ("u2", "b", 1)], "canon_url string, host string, depth int"
    ).join(
        spark.createDataFrame(
            [(h, p) for h, p in hp.items()], "host string, priority double"
        ),
        on="host",
    )
    ordered = f.orderBy(F.col("depth").asc(), F.col("priority").desc()).collect()
    assert ordered[0]["host"] == max(hp, key=hp.get) or ordered[0]["priority"] >= ordered[1]["priority"]
