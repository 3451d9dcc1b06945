"""Star-schema rollup queries exercising the full dimension chain
(customer -> nation -> region; part / supplier -> nation): the
reference has no relational joins at all (SURVEY §2.4), so these are
the engine-native demonstrations of Catalyst's multi-dim broadcast
join chain over the engagement semantics of stage 01.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..plans.tiering import order_engagement
from ..registry import register


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


@register("qg_engagement_by_geo", bench=True, oracle="""
WITH per_order AS (
    SELECT l_orderkey, sum(l_quantity) AS qty, count(*) AS items
    FROM lineitem GROUP BY l_orderkey
), scored AS (
    SELECT o.o_orderkey, c.c_nationkey,
           CASE WHEN c.c_acctbal <= 0 THEN 0.0
                ELSE least(0.05, (greatest(p.qty, 0) + greatest(p.items, 0))
                                 / c.c_acctbal) END AS engagement_ratio
    FROM orders o
    JOIN per_order p ON o.o_orderkey = p.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT r.r_name, n.n_name, count(*) AS n_posts,
       round(avg(s.engagement_ratio), 6) AS avg_ratio
FROM scored s
JOIN nation n ON s.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""")
def qg_engagement_by_geo(spark, sf_dir):
    """Engagement by customer geography: the P1 post-grain ratio
    rolled up through the customer -> nation -> region snowflake.
    Every dimension is broadcast (both under the 64 MB threshold and
    by AQE) — the fact side shuffles exactly once, for its orderkey
    aggregate; the dim chain adds zero exchanges."""
    scored = order_engagement(_t(spark, sf_dir, "lineitem"),
                              _t(spark, sf_dir, "orders"),
                              _t(spark, sf_dir, "customer"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (scored
            .join(F.broadcast(nation),
                  scored.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_posts"),
                 F.round(F.avg("engagement_ratio"), 6).alias("avg_ratio"))
            .orderBy("r_name", "n_name"))


@register("qg_top_parts_by_nation", oracle="""
SELECT n.n_name, p.p_brand,
       sum(l.l_quantity) AS total_qty,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY n.n_name, p.p_brand
HAVING sum(l.l_quantity) > 0
ORDER BY n.n_name, p.p_brand
""")
def qg_top_parts_by_nation(spark, sf_dir):
    """Supply-side rollup: discounted revenue and quantity per
    (supplier nation, part brand). The two dims and their snowflake
    hop broadcast; lineitem shuffles only for the final aggregate —
    Catalyst prunes lineitem's 11-column schema to the 4 join/agg
    columns (asserted in tests/test_plans.py).

    Revenue is emitted in integer cents (``floor(price*(1-disc)*100)``
    summed as BIGINT): the per-row double product is bit-identical on
    both engines, so the floor is deterministic and the integer sum is
    exact and order-independent — unlike ``round(sum(double), 4)``,
    whose accumulated ulp error is a hash dice-roll on big groups."""
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    return (li
            .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
            .join(F.broadcast(nation),
                  supplier.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("n_name", "p_brand")
            .agg(F.sum("l_quantity").alias("total_qty"),
                 F.sum(F.floor(F.col("l_extendedprice")
                               * (1 - F.col("l_discount")) * 100))
                  .alias("revenue_cents"))
            .filter(F.col("total_qty") > 0)
            .orderBy("n_name", "p_brand"))


@register("qg_monthly_revenue_trend", oracle="""
WITH rev AS (
    SELECT r.r_name AS region_name,
           strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
)
SELECT region_name, month, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY region_name ORDER BY month)
            AS BIGINT) AS running_cents,
       lag(rev_cents) OVER (PARTITION BY region_name ORDER BY month)
           AS prev_cents
FROM rev ORDER BY region_name, month
""")
def qg_monthly_revenue_trend(spark, sf_dir):
    """Monthly revenue per region with running total and previous
    month — the windowed-time-series rollup shape. Revenue is summed
    as PER-ROW floor(price*(1-disc)*100) BIGINT cents, so the
    aggregate is order-independent and bit-stable across engines
    (a float sum of ~1e7-magnitude doubles is NOT — last-ulp summation
    order differs). Fact shuffles once on (region, month) after the
    broadcast dim chain; the trend window partitions by region over
    the tiny aggregated frame."""
    from pyspark.sql import Window
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # nation/region are always-tiny (hinted); customer is a LARGE dim
    # at real scale — its join stays planner-chosen (broadcast under
    # the threshold locally, shuffle hash at 100 TB)
    rev = (l.join(o, l.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region_name"),
                    F.date_format(F.date_trunc("month", "o_orderdate"),
                                  "yyyy-MM").alias("month"))
           .agg(F.sum(F.floor(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100))
                .cast("long").alias("rev_cents")))
    w = Window.partitionBy("region_name").orderBy("month")
    return (rev.select(
        "region_name", "month", "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("running_cents"),
        F.lag("rev_cents").over(w).alias("prev_cents"))
        .orderBy("region_name", "month"))


@register("qg_revenue_moving_sum", oracle="""
WITH rev AS (
    SELECT r.r_name AS region_name,
           strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
)
SELECT region_name, month,
       CAST(sum(rev_cents) OVER (PARTITION BY region_name ORDER BY month
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov3_cents,
       CAST(count(*) OVER (PARTITION BY region_name ORDER BY month
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov3_n
FROM rev ORDER BY region_name, month
""")
def qg_revenue_moving_sum(spark, sf_dir):
    """3-month moving revenue per region with an explicit ROWS frame
    (2 PRECEDING..CURRENT). Sum + count emitted instead of the
    average so the output stays pure BIGINT — hash-stable — and the
    consumer divides. Same per-row-cents integer encoding as
    qg_monthly_revenue_trend."""
    from pyspark.sql import Window
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (l.join(o, l.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region_name"),
                    F.date_format(F.date_trunc("month", "o_orderdate"),
                                  "yyyy-MM").alias("month"))
           .agg(F.sum(F.floor(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100))
                .cast("long").alias("rev_cents")))
    w = (Window.partitionBy("region_name").orderBy("month")
         .rowsBetween(-2, 0))
    return (rev.select(
        "region_name", "month",
        F.sum("rev_cents").over(w).cast("long").alias("mov3_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("mov3_n"))
        .orderBy("region_name", "month"))


@register("qg_discount_quantity_corr", oracle="""
WITH m AS (
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(l_quantity AS BIGINT) AS q
    FROM lineitem
), s AS (
    SELECT count(*) AS n,
           CAST(sum(d) AS BIGINT) AS sd, CAST(sum(q) AS BIGINT) AS sq,
           CAST(sum(d * q) AS BIGINT) AS sdq,
           CAST(sum(d * d) AS BIGINT) AS sdd,
           CAST(sum(q * q) AS BIGINT) AS sqq
    FROM m
)
SELECT n, sd, sq, sdq, sdd, sqq,
       round((n * sdq - sd * sq) /
             (sqrt(CAST(n * sdd - sd * sd AS DOUBLE))
              * sqrt(CAST(n * sqq - sq * sq AS DOUBLE))), 6) AS corr
FROM s
""")
def qg_discount_quantity_corr(spark, sf_dir):
    """Discount vs quantity Pearson correlation via EXACT integer
    moments (discount in cents, quantity integral): the five sums are
    bit-equal bigints on both engines, and the final coefficient is
    one identical IEEE expression over them — the same
    integer-moments defense the r3 sweep applied to corr()'s
    float-merge divergence (ba5b7bb), packaged as the reusable
    pattern.  One map-side-combined aggregate over a 2-column pruned
    scan."""
    import os as _os
    li = spark.read.parquet(
        _os.path.join(sf_dir, "lineitem.parquet")).select(
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"))
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"), F.sum("q").alias("sq"),
        F.sum(F.col("d") * F.col("q")).alias("sdq"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"))
    corr = ((F.col("n") * F.col("sdq") - F.col("sd") * F.col("sq"))
            / (F.sqrt((F.col("n") * F.col("sdd")
                       - F.col("sd") * F.col("sd")).cast("double"))
               * F.sqrt((F.col("n") * F.col("sqq")
                         - F.col("sq") * F.col("sq")).cast("double"))))
    return s.select("n", "sd", "sq", "sdq", "sdd", "sqq",
                    F.round(corr, 6).alias("corr"))


@register("qg_pricing_summary", bench=True, oracle="""
WITH m AS (
    SELECT l_returnflag, l_linestatus,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(round(l_tax * 100) AS BIGINT) AS t
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(price_c) AS BIGINT) AS sum_base_cents,
       CAST(sum(price_c * (100 - d)) AS BIGINT) AS sum_disc_x10k,
       CAST(sum(price_c * (100 - d) * (100 + t)) AS BIGINT)
           AS sum_charge_x1m,
       CAST(sum(qty) * 100 // count(*) AS BIGINT) AS avg_qty_x100,
       CAST(sum(price_c) // count(*) AS BIGINT) AS avg_price_cents,
       CAST(sum(d) * 100 // count(*) AS BIGINT) AS avg_disc_bp,
       count(*) AS n_rows
FROM m GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def qg_pricing_summary(spark, sf_dir):
    """The canonical OLAP pricing summary (TPC-H Q1 semantics:
    returnflag x linestatus grain, shipped-by cutoff) in EXACT fixed
    point: discounted price as cents x (100-d), charge as cents x
    (100-d) x (100+t), averages by integer division — every measure a
    bigint, so the flagship scan-heavy aggregate is bit-stable at any
    scale.  One map-side-combined groupBy over a pruned 7-column
    scan."""
    import os as _os
    li = spark.read.parquet(
        _os.path.join(sf_dir, "lineitem.parquet")).filter(
        F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("qty").alias("sum_qty"),
                 F.sum("price_c").alias("sum_base_cents"),
                 F.sum(F.col("price_c") * (100 - F.col("d")))
                 .alias("sum_disc_x10k"),
                 F.sum(F.col("price_c") * (100 - F.col("d"))
                       * (100 + F.col("t"))).alias("sum_charge_x1m"),
                 F.expr("sum(qty) * 100 DIV count(1)")
                 .alias("avg_qty_x100"),
                 F.expr("sum(price_c) DIV count(1)")
                 .alias("avg_price_cents"),
                 F.expr("sum(d) * 100 DIV count(1)").alias("avg_disc_bp"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy("l_returnflag", "l_linestatus"))


@register("qg_ship_latency_by_priority", oracle="""
WITH l AS (
    SELECT o.o_orderpriority AS priority,
           CAST(date_diff('day', o.o_orderdate, li.l_shipdate)
                AS BIGINT) AS lag_days
    FROM orders o JOIN lineitem li ON li.l_orderkey = o.o_orderkey
)
SELECT priority, count(*) AS n_lines,
       CAST(round(quantile_cont(lag_days, 0.50) * 10) AS BIGINT)
           AS p50_days_x10,
       CAST(round(quantile_cont(lag_days, 0.90) * 10) AS BIGINT)
           AS p90_days_x10,
       CAST(max(lag_days) AS BIGINT) AS max_days
FROM l GROUP BY priority ORDER BY priority
""")
def qg_ship_latency_by_priority(spark, sf_dir):
    """Fulfillment SLA: order-to-ship latency percentiles per order
    priority (does 1-URGENT actually ship faster?) — integer lag
    days through the formula-identity percentile pattern; the orders
    side of the join broadcasts against the lineitem fact."""
    import os as _os
    o = spark.read.parquet(
        _os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderdate",
        F.col("o_orderpriority").alias("priority"))
    li = spark.read.parquet(
        _os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_shipdate")
    l = (li.join(F.broadcast(o),
                 li.l_orderkey == o.o_orderkey)
         .select("priority",
                 F.datediff("l_shipdate", "o_orderdate").cast("long")
                 .alias("lag_days")))
    return (l.groupBy("priority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 *[F.expr(f"CAST(round(percentile(lag_days, {q}) * 10)"
                          f" AS BIGINT)").alias(f"p{int(q*100)}_days_x10")
                   for q in (0.50, 0.90)],
                 F.max("lag_days").cast("long").alias("max_days"))
            .orderBy("priority"))
