"""Graph analytics over DataFrames (north-star extension, joining the
connected-components resolver in operators/dedup.py): PageRank via
iterative join/aggregate rounds.

Why not GraphX/GraphFrames: GraphX is RDD/Scala-only and GraphFrames
is an external package — the DataFrame join-agg formulation below is
the standard Spark-native equivalent (each round is one equi-join on
the edge source + one hash aggregate on the destination, both
map-side combinable), and AQE handles hub-vertex skew the same way it
handles any skewed join key.

Iterative plans grow lineage exponentially if left alone; every
``checkpoint_interval`` rounds the rank frame is localCheckpoint'ed
(eager) to cut the DAG — the same discipline as the pointer-jumping
loop in dedup.connected_components (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Undirected customer-supplier edge list from the purchase fact:
    distinct (customer, supplier) pairs via the orderkey join, emitted
    in both directions (node ids are disjoint: customers are even
    2*custkey, suppliers odd 2*suppkey+1)."""
    pairs = (lineitem.select("l_orderkey", "l_suppkey")
             .join(orders.select("o_orderkey", "o_custkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select((2 * F.col("o_custkey")).alias("cust"),
                     (2 * F.col("l_suppkey") + 1).alias("supp"))
             .distinct())
    return (pairs.select(F.col("cust").alias("src"),
                         F.col("supp").alias("dst"))
            .unionByName(pairs.select(F.col("supp").alias("src"),
                                      F.col("cust").alias("dst"))))


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85,
             checkpoint_interval: int = 4) -> DataFrame:
    """PageRank over an edge list (src, dst) with no dangling nodes
    (callers emit undirected edges, so every node has out-degree).

    Per round: contributions = ranks ⋈ edges on src (one shuffle,
    partitioning reused across rounds because the join key never
    changes), then sum per dst (map-side partial agg). Rank scale is
    the "sum = N" convention: rank = (1-d) + d * inflow. Returns
    (node, rank)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges annotated with the source degree once, persisted: the loop
    # re-reads this table every round
    ed = (edges.join(deg, "src")
          .select("src", "dst", "deg").persist())
    nodes = ed.select(F.col("src").alias("node")).distinct().persist()
    cached = [ed, nodes]
    try:
        ranks = nodes.select("node", F.lit(1.0).alias("rank"))
        for i in range(iterations):
            contrib = (ed.join(ranks.withColumnRenamed("node", "src"),
                               "src")
                       .groupBy("dst")
                       .agg(F.sum(F.col("rank") / F.col("deg"))
                            .alias("inflow")))
            ranks = (nodes.join(contrib.withColumnRenamed("dst", "node"),
                                "node", "left")
                     .select("node",
                             (F.lit(1.0 - damping)
                              + F.lit(damping)
                              * F.coalesce("inflow", F.lit(0.0)))
                             .alias("rank")))
            if (i + 1) % checkpoint_interval == 0 and i + 1 < iterations:
                # materialized persist, NOT localCheckpoint: checkpoint
                # RDD blocks bypass the catalog cache manager, so they
                # leak past clearCache until a JVM GC (r2 ADVICE);
                # catalog-managed persists are released right below.
                ranks = ranks.persist()
                ranks.count()
                cached.append(ranks)
        final = ranks.persist()
        final.count()  # materialize before the intermediates unpersist
        return final
    finally:
        for c in cached:
            c.unpersist(blocking=False)


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree from an undirected edge list — the cheap graph
    profile (one hash agg)."""
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree")))


def pagerank_fixed(edges: DataFrame, iterations: int = 10) -> DataFrame:
    """FIXED-POINT PageRank: the float power iteration in micro-units
    (rank0 = 1_000_000 per node; update = ``150000 + (850 * inflow)
    DIV 1000`` with ``inflow = sum(rank_src DIV deg_src)``) — every
    operation is BIGINT, so the result is bit-identical regardless of
    partial-sum order and therefore ORACLE-CHECKABLE cross-engine
    (integer addition is associative; float pagerank can never
    hash-match across engines).  The DIV truncation loses < deg units
    per edge per round — a deterministic, engine-identical rounding
    policy, not noise.  Same join/agg shape and persist discipline as
    :func:`pagerank`."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(deg, "src").select("src", "dst", "d").persist()
    nodes = ed.select(F.col("src").alias("node")).distinct().persist()
    cached = [ed, nodes]
    try:
        ranks = nodes.select("node",
                             F.lit(1_000_000).cast("long").alias("r"))
        for i in range(iterations):
            contrib = (ed.join(ranks.withColumnRenamed("node", "src"),
                               "src")
                       .groupBy("dst")
                       .agg(F.sum(F.expr("r DIV d")).alias("inflow")))
            ranks = (nodes.join(contrib.withColumnRenamed("dst", "node"),
                                "node", "left")
                     .select("node",
                             F.expr("CAST(150000 + (850 * coalesce(inflow,"
                                    " 0)) DIV 1000 AS BIGINT)").alias("r")))
            if (i + 1) % 4 == 0 and i + 1 < iterations:
                ranks = ranks.persist()
                ranks.count()
                cached.append(ranks)
        final = ranks.persist()
        final.count()
        return final
    finally:
        for c in cached:
            c.unpersist(blocking=False)


def label_propagation(edges: DataFrame, iterations: int = 8,
                      checkpoint_interval: int = 4) -> DataFrame:
    """Community detection via synchronous label propagation (LPA,
    Raghavan et al. 2007 — public algorithm), made DETERMINISTIC:
    every node starts with its own id as label, and each round adopts
    the label held by the most of its neighbors, ties broken by the
    SMALLEST label (classic LPA breaks ties randomly; the min-label
    rule makes rounds reproducible across runs, engines and
    partitionings — same policy as the connected-components resolver
    it complements: CC finds reachability islands, LPA splits dense
    regions within them).

    Per round: one equi-join of labels onto edge sources (the join
    key never changes, so the shuffle partitioning is reused), one
    (dst, label) count aggregate, one per-dst argmax via max(struct
    (cnt, -label)) — all map-side combinable; no windows.  Lineage is
    cut with catalog-managed persists every ``checkpoint_interval``
    rounds (the pagerank discipline — localCheckpoint blocks bypass
    clearCache).  Returns (node, community).
    """
    nodes = (edges.select(F.col("src").alias("node")).distinct()
             .persist())
    ed = edges.persist()
    cached = [nodes, ed]
    try:
        labels = nodes.select("node", F.col("node").alias("community"))
        for i in range(iterations):
            neigh = (ed.join(labels.withColumnRenamed("node", "src"),
                             "src")
                     .groupBy(F.col("dst").alias("node"), "community")
                     .agg(F.count(F.lit(1)).alias("cnt")))
            best = (neigh.groupBy("node")
                    .agg(F.max(F.struct(
                        F.col("cnt"),
                        (-F.col("community")).alias("neg")))
                        .alias("b"))
                    .select("node",
                            (-F.col("b.neg")).alias("community")))
            labels = (nodes.join(best, "node", "left")
                      .select("node",
                              F.coalesce("community", "node")
                              .alias("community")))
            if (i + 1) % checkpoint_interval == 0 and i + 1 < iterations:
                labels = labels.persist()
                labels.count()
                cached.append(labels)
        final = labels.persist()
        final.count()
        return final
    finally:
        for c in cached:
            c.unpersist(blocking=False)
