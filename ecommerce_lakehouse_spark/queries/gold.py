"""Gold-layer analytics marts, re-expressed on the driver's star schema.

Reference parity (docs/etl_processes.md:388-683): daily_sales (E:420-450),
product_performance (E:454-516), department_analytics (E:520-583),
customer_insights (E:618-683 incl. window favorite + segmentation ladder).
Mapping onto testdata: orders/lineitem are the fact tables, part plays
products (p_brand as "department"), customer plays users.

Scale notes (100 TB): every aggregation is a hash agg with map-side partial
aggregation; the dim side (part, customer at dim-like cardinality) is
broadcast; the fanout bug in the reference's daily_sales
(docs/etl_processes.md:426-437 sums order totals after an order×items join)
is fixed with a two-branch aggregation joined on the group key (SURVEY §7.5).
All monetary aggregates are rounded (2dp sums / 4dp averages) in BOTH the
Spark plan and the oracle so double-summation order cannot flip the hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ecommerce_lakehouse_spark.money import disc_price, dsum, money_avg, money_sum
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

AS_OF_DATE = "2002-01-01"  # deterministic stand-in for current_date() (E:638)


@query(
    "daily_sales",
    oracle="""
WITH og AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         count(DISTINCT o_orderkey) AS order_count,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_order_value,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_order_value,
         count(DISTINCT o_custkey) AS unique_customers
  FROM orders GROUP BY 1
), ig AS (
  SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS total_sales,
         round(sum(l.l_quantity), 2) AS total_items,
         sum(l.l_quantity) / count(DISTINCT l.l_orderkey) AS avg_items_per_order
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1
)
SELECT og.order_date, og.order_count, og.total_order_value, og.avg_order_value,
       og.unique_customers, ig.total_sales, ig.total_items, ig.avg_items_per_order
FROM og LEFT JOIN ig ON og.order_date = ig.order_date
""",
)
def daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sales mart (reference docs/etl_processes.md:420-450).

    Two-branch aggregation: order-grain metrics straight from orders,
    item-grain metrics from lineitem⋈orders, joined on the date key —
    avoids the reference's join-fanout on sum(total_amount) and keeps both
    branches as partial-aggregating hash aggs (no row explosion at 100 TB).
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    og = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        money_sum("o_totalprice").alias("total_order_value"),
        money_avg("o_totalprice", 4).alias("avg_order_value"),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )
    ig = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            dsum(disc_price()).alias("total_sales"),
            F.round(F.sum("l_quantity"), 2).alias("total_items"),
            (F.sum("l_quantity") / F.countDistinct("l_orderkey")).alias("avg_items_per_order"),
        )
    )
    return og.join(ig, "order_date", "left").select(
        "order_date",
        "order_count",
        "total_order_value",
        "avg_order_value",
        "unique_customers",
        "total_sales",
        "total_items",
        "avg_items_per_order",
    )


@query(
    "product_performance",
    oracle="""
SELECT p.p_partkey AS product_id,
       p.p_name AS product_name,
       p.p_brand AS department,
       round(sum(l.l_quantity), 2) AS total_quantity,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS total_sales,
       count(DISTINCT l.l_orderkey) AS order_count,
       count(DISTINCT o.o_custkey) AS customer_count,
       (count(DISTINCT l.l_orderkey) - count(DISTINCT o.o_custkey))
             / CAST(count(DISTINCT l.l_orderkey) AS DOUBLE) AS repeat_order_rate,
       datediff('day', CAST(min(l.l_shipdate) AS DATE), CAST(max(l.l_shipdate) AS DATE))
             / CAST(nullif(count(DISTINCT l.l_orderkey) - 1, 0) AS DOUBLE)
         AS avg_days_between_orders
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
""",
)
def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product performance mart (reference docs/etl_processes.md:454-516).

    part is a dim table → broadcast join; reorder_rate/avg_days_between
    (E:496-498) re-expressed on available columns: repeat_order_rate =
    (orders - customers)/orders, avg_days_between_orders = shipdate span /
    (orders-1).
    """
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")

    oc = F.countDistinct("l_orderkey")
    cc = F.countDistinct("o_custkey")
    # Aggregate by the surrogate key FIRST, then broadcast-join the part
    # dim onto the (small) aggregate: the two countDistinct aggregates
    # expand each input row ~3× (Expand operator), so keeping p_name /
    # p_brand strings out of that shuffle cuts shuffle bytes to the
    # integer key — at 100 TB the strings would dominate the exchange.
    # p_partkey is the part PK, so grouping by it alone is equivalent to
    # the oracle's GROUP BY (key, name, brand).
    agg = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"), lineitem.l_orderkey == F.col("o_orderkey")
        )
        .groupBy(F.col("l_partkey").alias("product_id"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_quantity"),
            dsum(disc_price()).alias("total_sales"),
            oc.alias("order_count"),
            cc.alias("customer_count"),
            ((oc - cc) / oc.cast("double")).alias("repeat_order_rate"),
            (
                F.datediff(F.to_date(F.max("l_shipdate")), F.to_date(F.min("l_shipdate")))
                / F.nullif(oc - F.lit(1), F.lit(0)).cast("double")
            ).alias("avg_days_between_orders"),
        )
    )
    return agg.join(F.broadcast(part), agg.product_id == part.p_partkey).select(
        "product_id",
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("department"),
        "total_quantity",
        "total_sales",
        "order_count",
        "customer_count",
        "repeat_order_rate",
        "avg_days_between_orders",
    )


@query(
    "department_analytics",
    oracle="""
SELECT p.p_brand AS department,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS total_sales,
       count(DISTINCT p.p_partkey) AS product_count,
       count(DISTINCT l.l_orderkey) AS order_count,
       count(DISTINCT o.o_custkey) AS customer_count,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(DISTINCT l.l_orderkey) AS avg_order_value
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def department_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Department analytics mart (reference docs/etl_processes.md:520-583):
    3-way join + multi-countDistinct rollup grouped by department (p_brand).
    """
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")

    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders.select("o_orderkey", "o_custkey"), lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("p_brand").alias("department"))
        .agg(
            dsum(disc_price()).alias("total_sales"),
            F.countDistinct("p_partkey").alias("product_count"),
            F.countDistinct("l_orderkey").alias("order_count"),
            F.countDistinct("o_custkey").alias("customer_count"),
            (F.sum(disc_price()).cast("double") / F.countDistinct("l_orderkey")).alias(
                "avg_order_value"
            ),
        )
    )


@query(
    "customer_insights",
    oracle=f"""
WITH base AS (
  SELECT o.o_custkey AS customer_id,
         count(DISTINCT o.o_orderkey) AS total_orders,
         CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o.o_totalprice) AS avg_order_value,
         CAST(min(o.o_orderdate) AS DATE) AS first_order_date,
         CAST(max(o.o_orderdate) AS DATE) AS last_order_date,
         datediff('day', CAST(max(o.o_orderdate) AS DATE), DATE '{AS_OF_DATE}')
           AS days_since_last_order
  FROM orders o GROUP BY 1
), fav AS (
  SELECT customer_id, department AS favorite_department FROM (
    SELECT o.o_custkey AS customer_id, p.p_brand AS department, count(*) AS cnt,
           row_number() OVER (PARTITION BY o.o_custkey
                              ORDER BY count(*) DESC, p.p_brand ASC) AS rn
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
  ) WHERE rn = 1
)
SELECT b.customer_id, c.c_name AS customer_name, b.total_orders, b.total_spend,
       b.avg_order_value, b.first_order_date, b.last_order_date,
       b.days_since_last_order,
       coalesce(f.favorite_department, 'none') AS favorite_department,
       CASE
         WHEN b.total_orders >= 15 AND b.days_since_last_order <= 365 THEN 'loyal'
         WHEN b.total_orders >= 8 THEN 'active'
         WHEN b.total_orders >= 4 THEN 'regular'
         WHEN b.days_since_last_order > 1095 THEN 'lapsed'
         ELSE 'new'
       END AS customer_segment
FROM base b
JOIN customer c ON b.customer_id = c.c_custkey
LEFT JOIN fav f ON b.customer_id = f.customer_id
""",
)
def customer_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer insights mart (reference docs/etl_processes.md:618-683).

    Two aggregation branches re-joined (A5 customer metrics; A6+W1+P12
    favorite department via row_number — deterministic tiebreak fixes the
    reference's rank()==1 tie hazard, SURVEY §7.5), then the rule-based
    segmentation ladder (F14, E:662-668) with a fixed as-of date replacing
    current_date() for determinism.
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    customer = load(spark, sf_dir, "customer")

    base = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("total_orders"),
        money_sum("o_totalprice").alias("total_spend"),
        money_avg("o_totalprice", 4).alias("avg_order_value"),
        F.to_date(F.min("o_orderdate")).alias("first_order_date"),
        F.to_date(F.max("o_orderdate")).alias("last_order_date"),
        F.datediff(F.lit(AS_OF_DATE).cast("date"), F.to_date(F.max("o_orderdate"))).alias(
            "days_since_last_order"
        ),
    )

    w = Window.partitionBy("customer_id").orderBy(F.desc("cnt"), F.asc("department"))
    fav = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), lineitem.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("o_custkey").alias("customer_id"), F.col("p_brand").alias("department"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("customer_id", F.col("department").alias("favorite_department"))
    )

    segment = (
        F.when((F.col("total_orders") >= 15) & (F.col("days_since_last_order") <= 365), "loyal")
        .when(F.col("total_orders") >= 8, "active")
        .when(F.col("total_orders") >= 4, "regular")
        .when(F.col("days_since_last_order") > 1095, "lapsed")
        .otherwise("new")
    )
    return (
        # customer is NOT broadcast: at 100 TB it's fact-sized; base is already
        # hash-partitioned by customer_id so this is a co-partitioned join.
        base.join(customer, base.customer_id == customer.c_custkey)
        .join(fav, "customer_id", "left")
        .select(
            "customer_id",
            F.col("c_name").alias("customer_name"),
            "total_orders",
            "total_spend",
            "avg_order_value",
            "first_order_date",
            "last_order_date",
            "days_since_last_order",
            F.coalesce("favorite_department", F.lit("none")).alias("favorite_department"),
            segment.alias("customer_segment"),
        )
    )
