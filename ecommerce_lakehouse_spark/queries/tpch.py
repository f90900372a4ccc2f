"""TPC-H-style headline queries (bench anchors).

The reference has 4 gold marts + 3 smoke queries; these classics exercise
the same operator families (multi-way joins, filtered hash aggregation,
top-k) at bench scale and are the headline entries in bench.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.money import (
    charge,
    dec2,
    dec4,
    disc_price,
    dsum,
    money_avg,
    money_sum,
)
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load


@query(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4)) * CAST(1 + l_tax AS DECIMAL(9,4))), 2) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(l_quantity) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: single-pass filtered hash agg; the filter pushes to
    the parquet scan, the agg is map-side partial — the canonical
    scan-bound query at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price()).alias("sum_disc_price"),
            dsum(charge()).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            money_avg("l_extendedprice", 4).alias("avg_price"),
            (F.sum(dec4("l_discount")).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
LIMIT 10
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: selective dim filter → join → agg → top-k.
    customer filter applied before the join (Catalyst pushes it anyway);
    top-k via TakeOrderedAndProject, fully deterministic tiebreaks."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "2000-03-15 00:00:00")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15 00:00:00")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(disc_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("order_date"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY 1
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join. supplier/nation/region are true
    dims → broadcast; fact-fact (orders⋈lineitem) shuffles on the order
    key once."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "2000-01-01 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(disc_price()).alias("revenue"))
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 adapted: the testdata lineitem has
    no commit/receipt dates, so the EXISTS predicate is "some line shipped
    >60 days after order date"). EXISTS = left-semi join with an equi key
    plus a residual non-equi condition — the date filter on orders prunes
    the probe side before the shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-07-01 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: the pure scan-predicate-aggregate query.
    All three predicates push down to the parquet reader (min/max row-group
    skipping at scale); the agg is a single scalar — network cost is one
    row per partition."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec2("l_extendedprice") * dec4("l_discount")).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: fact-fact join on the order key (one
    shuffle), nation broadcast, top-20 via TakeOrderedAndProject with a
    deterministic tiebreak on the group key."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dsum(disc_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect revenue share (Q14 adapted to the testdata's flat
    p_type values): broadcast part join + conditional decimal sums; the
    ratio divides two exact decimal sums as doubles (deterministic, no
    rounding — see money.py policy)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01 00:00:00")
        & (F.col("l_shipdate") < "1996-10-01 00:00:00")
    )
    p = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 240
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: self-referencing HAVING subquery as a
    pre-aggregated left-semi join. The big-order filter aggregates lineitem
    BEFORE any join (map-side partials on the narrow key/qty projection),
    so the expensive 3-way join only sees qualifying orders."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 240)
        .select("l_orderkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), o.o_orderkey == F.col("bk"), "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue over a disjunction of brand/size/quantity
    conjuncts (Q19 shape): equi-join on partkey with the OR-of-ANDs as a
    residual predicate. Catalyst extracts the common p_brand IN (...) and
    size/qty bounds as pushable prefilters on each side of the broadcast
    join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(5, 20)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 40)
        )
    )
    return j.filter(cond).agg(dsum(disc_price()).alias("revenue"))
