"""Market-basket analytics (north-star extension): exact co-purchase
pair counting (native self-join, oracle-checkable) and MLlib FPGrowth
frequent itemsets / association rules over the same baskets.

Scale shape: the pair self-join is per-basket — TPC-H baskets are
bounded (<= ~13 items), so the fan-out per order is O(basket^2) with
a small constant and the join key (orderkey) is the natural shuffle
key with no skew. FPGrowth is MLlib's distributed PFP
(parallel FP-growth, Li et al. 2008): baskets group by a hashed
prefix, each partition mines a conditional FP-tree — the standard
scale path when itemsets beyond pairs are wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baskets(lineitem: DataFrame) -> DataFrame:
    """(orderkey, items): the distinct part set per order."""
    return (lineitem.groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")))


def copurchase_pairs(lineitem: DataFrame, min_orders: int = 3) -> DataFrame:
    """Exact part-pair co-occurrence counts across orders: self-join
    on the orderkey (p1 < p2 dedupes the unordered pair), count
    distinct orders, keep pairs seen in >= min_orders baskets."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"),
                        F.col("l_partkey").alias("p1"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"),
                        F.col("l_partkey").alias("p2"))
    return (a.join(b, "ok")
            .filter(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2")
            .agg(F.count_distinct("ok").alias("n_orders"))
            .filter(F.col("n_orders") >= min_orders))


def fpgrowth_itemsets(basket_df: DataFrame, min_support: float,
                      min_confidence: float = 0.5):
    """MLlib FPGrowth over (orderkey, items) baskets. Returns the
    fitted model (freqItemsets / associationRules DataFrames)."""
    from pyspark.ml.fpm import FPGrowth
    fp = FPGrowth(itemsCol="items", minSupport=min_support,
                  minConfidence=min_confidence)
    return fp.fit(basket_df)
