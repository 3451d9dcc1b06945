"""Graph-analytics tests: PageRank pinned against a NumPy power
iteration on the same graph, plus structural invariants and the
bounded-lineage discipline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators import graph


def _numpy_pagerank(edges, iterations=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.ones(n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for u, v in edges:
            inflow[idx[v]] += r[idx[u]] / deg[idx[u]]
        r = (1 - d) + d * inflow
    return {n_: r[idx[n_]] for n_ in nodes}


EDGES = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (3, 4), (4, 3)]


def test_pagerank_matches_numpy_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(df, iterations=10).collect()}
    want = _numpy_pagerank(EDGES, iterations=10)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    # well-connected triangle nodes outrank the pendant node
    assert got[4] < min(got[1], got[2], got[3])


def test_pagerank_sum_is_node_count(spark, sf_dir):
    import os
    edges = graph.purchase_edges(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet")))
    ranks = graph.pagerank(edges, iterations=6)
    n = ranks.count()
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(n, rel=1e-9)  # no dangling mass lost


def test_purchase_edges_are_symmetric_bipartite(spark, sf_dir):
    import os
    edges = graph.purchase_edges(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet")))
    # every edge crosses the bipartition (even customer <-> odd supplier)
    bad = edges.filter((F.col("src") % 2) == (F.col("dst") % 2)).count()
    assert bad == 0
    # symmetric: reversed set equals the set
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert fwd.exceptAll(rev).count() == 0


def test_degree_distribution_query_runs(spark, sf_dir):
    from social_media_ai_engineering_etl_spark.queries.graph_analytics import (
        qx_degree_distribution)
    rows = qx_degree_distribution(spark, sf_dir).collect()
    assert rows and all(r["n_nodes"] >= r["n_suppliers"] >= 0 for r in rows)


# ---------------------------------------------------------------------------
# market-basket analytics
# ---------------------------------------------------------------------------

def test_fpgrowth_pairs_equal_exact_copurchase(spark, sf_dir):
    """FPGrowth's size-2 frequent itemsets must match the exact
    self-join pair counts — same support threshold, same data."""
    from social_media_ai_engineering_etl_spark.queries.graph_analytics import (
        qm_fpgrowth_itemsets, qx_copurchase_pairs)
    fp = {tuple(int(x) for x in r["items"].split(",")): r["n_orders"]
          for r in qm_fpgrowth_itemsets(spark, sf_dir).collect()
          if r["n_items"] == 2}
    exact = {(r["p1"], r["p2"]): r["n_orders"]
             for r in qx_copurchase_pairs(spark, sf_dir).collect()}
    assert fp == exact


def test_fpgrowth_singletons_are_part_frequencies(spark, sf_dir):
    import os
    from social_media_ai_engineering_etl_spark.queries.graph_analytics import (
        qm_fpgrowth_itemsets)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    want = {(r["l_partkey"],): r["n"] for r in
            li.groupBy("l_partkey")
              .agg(F.count_distinct("l_orderkey").alias("n"))
              .filter(F.col("n") >= 3).collect()}
    got = {(int(r["items"]),): r["n_orders"]
           for r in qm_fpgrowth_itemsets(spark, sf_dir).collect()
           if r["n_items"] == 1}
    assert got == want


def test_fixed_point_pagerank_tracks_float(spark, sf_dir):
    """The integer micro-unit iteration must stay within 1% relative
    of the float power iteration per node (the DIV truncation loses
    < deg units/edge/round), and the supplier top-20 must agree with
    the float ranking on its membership."""
    import os

    from pyspark.sql import functions as F

    from social_media_ai_engineering_etl_spark.operators import graph

    t = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
    edges = graph.purchase_edges(t("lineitem"), t("orders")).persist()
    fl = {r.node: r.rank
          for r in graph.pagerank(edges, iterations=10).collect()}
    fx = {r.node: r.r / 1e6
          for r in graph.pagerank_fixed(edges, iterations=10).collect()}
    edges.unpersist()
    assert set(fl) == set(fx)
    for node, v in fl.items():
        assert abs(fx[node] - v) <= max(0.01 * v, 1e-3), (node, v, fx[node])
    # supplier ranks are densely tied, so top-20 MEMBERSHIP is not
    # comparable across the two arithmetics; instead every fixed-top-20
    # member must sit at or above the float ranking's 20th-best value
    # (within the same 1% envelope)
    fl_supp = sorted((v for n, v in fl.items() if n % 2 == 1),
                     reverse=True)
    cutoff = fl_supp[min(19, len(fl_supp) - 1)]
    top_fx = sorted(((v, n) for n, v in fx.items() if n % 2 == 1),
                    reverse=True)[:20]
    for v, n in top_fx:
        assert fl[n] >= cutoff - max(0.01 * cutoff, 1e-3), (n, fl[n],
                                                            cutoff)


def test_label_propagation_separates_planted_communities(spark):
    """Two dense cliques joined by one bridge edge resolve to two
    communities (each labeled by its minimum node id), and the result
    is partitioning-invariant — the determinism classic random-tie
    LPA lacks."""
    from social_media_ai_engineering_etl_spark.operators.graph import (
        label_propagation,
    )
    a = [(i, j) for i in range(1, 6) for j in range(1, 6) if i != j]
    b = [(i, j) for i in range(10, 15) for j in range(10, 15) if i != j]
    bridge = [(5, 10), (10, 5)]
    edges = spark.createDataFrame(a + b + bridge, "src long, dst long")
    got = {r["node"]: r["community"]
           for r in label_propagation(edges, iterations=6).collect()}
    comm_a = {got[i] for i in range(1, 6)}
    comm_b = {got[i] for i in range(10, 15)}
    assert comm_a == {1}
    assert comm_b == {10}
    reparted = {r["node"]: r["community"]
                for r in label_propagation(
                    edges.repartition(13), iterations=6).collect()}
    assert reparted == got
