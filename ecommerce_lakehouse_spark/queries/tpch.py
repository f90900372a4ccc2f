"""TPC-H-style headline queries (bench anchors).

The reference has 4 gold marts + 3 smoke queries; these classics exercise
the same operator families (multi-way joins, filtered hash aggregation,
top-k) at bench scale and are the headline entries in bench.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.money import charge, dec4, disc_price, dsum, money_avg, money_sum
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
