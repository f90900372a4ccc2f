"""Relational operator inventory as named queries (SURVEY.md §2.3-2.8, 2.11).

One query per operator family of the reference, each with a DuckDB oracle.
Citations are to the reference implementation the operator re-expresses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ecommerce_lakehouse_spark.money import dec2, money_avg, money_sum
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# --------------------------------------------------------------------------


@query(
    "group_count_histogram",
    oracle="""
SELECT event_type, count(*) AS cnt
FROM events GROUP BY event_type
""",
)
def group_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 error-histogram pattern (reference src/glue_etl.py:369-373):
    groupBy().count() — order-insensitive hash makes the sort cosmetic, the
    operator under test is the map-side-combining hash agg."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "distinct_projection",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 distinct projection (reference src/glue_etl.py:156,
    src/etl_utils.py:169)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "dedup_by_key",
    oracle="""
SELECT event_id, user_id, event_type, ts, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 dedup-by-pk (reference src/glue_etl.py:404, src/etl_utils.py:404)
    made deterministic: dropDuplicates keeps an arbitrary survivor, so the
    engine's canonical form is row_number over a full tiebreak (SURVEY
    §7.5) — earliest event wins, event_id breaks exact ts ties.

    Scale note: single shuffle on the dedup key; at 100 TB this is the
    same plan as dropDuplicates but with a defined survivor."""
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@query(
    "column_stats",
    oracle="""
WITH s AS (
  SELECT count(*) AS n,
         min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS DOUBLE) AS smc,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT))
           AS smsq_i
  FROM lineitem
),
s2 AS (
  -- exact 2^53-safe double render: both engines split the exact integer
  -- into <2^53 parts and recombine in the SAME order (a raw
  -- int128->double cast is engine-dependent beyond 2^53)
  SELECT n, min_price, max_price, smc,
         CAST(smsq_i // 100000000 AS DOUBLE) * 100000000.0
           + CAST(smsq_i % 100000000 AS DOUBLE) AS smsqc
  FROM s
)
SELECT min_price, max_price,
       (smc / n) / 100.0 AS avg_price,
       sqrt((smsqc - smc * smc / n) / (n - 1)) / 100.0 AS stddev_price,
       n AS n_rows
FROM s2
""",
)
def column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 column profiling (reference docs/data_quality.md:249-255):
    min/max/avg/stddev in one agg pass.

    Moments accumulate as exact integer CENTS (BIGINT / DECIMAL(38,0))
    and only scale-0 values are ever cast to double: casting a
    scale>0 decimal is NOT cross-engine safe at large magnitude —
    DuckDB converts int128->double then divides by 10^scale (two
    roundings) while Spark's BigDecimal cast rounds once, and the sf0.1
    sum of squares (~6.6e15 at scale 4) was the first value big enough
    to diverge in the last ulp. The /100 rescale happens in double,
    identically ordered in both engines."""
    li = load(spark, sf_dir, "lineitem")
    cents = (dec2("l_extendedprice") * 100).cast("long")
    agg = li.agg(
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(cents).cast("double").alias("smc"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("smsq_i"),
    ).withColumn(
        "smsqc",
        F.expr(
            "CAST(smsq_i DIV 100000000 AS DOUBLE) * 100000000.0"
            " + CAST(smsq_i % 100000000 AS DOUBLE)"
        ),
    )
    return agg.select(
        "min_price",
        "max_price",
        ((F.col("smc") / F.col("n")) / F.lit(100.0)).alias("avg_price"),
        (
            F.sqrt(
                (F.col("smsqc") - F.col("smc") * F.col("smc") / F.col("n"))
                / (F.col("n") - 1)
            )
            / F.lit(100.0)
        ).alias("stddev_price"),
        F.col("n").alias("n_rows"),
    )


@query(
    "dup_rate_metric",
    oracle="""
SELECT count(*) AS total_rows,
       count(DISTINCT (user_id, event_type)) AS distinct_keys,
       count(*) - count(DISTINCT (user_id, event_type)) AS duplicate_rows
FROM events
""",
)
def dup_rate_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 duplicate-rate metric (reference docs/data_quality.md:153-161)."""
    return load(spark, sf_dir, "events").agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("user_id", "event_type").alias("distinct_keys"),
        (F.count("*") - F.countDistinct("user_id", "event_type")).alias("duplicate_rows"),
    )


@query(
    "null_rate_profile",
    oracle="""
SELECT count(*) AS total_rows,
       CAST(sum(CASE WHEN o_orderpriority IS NULL OR CAST(o_orderpriority AS VARCHAR) = ''
                THEN 1 ELSE 0 END) AS BIGINT) AS null_priority,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(sum(CASE WHEN try_cast(o_orderpriority AS DOUBLE) IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS uncastable_priority
FROM orders
""",
)
def null_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 null/empty-rate per column (reference docs/data_quality.md:164-170)
    + P11 tolerant cast (src/etl_utils.py:334-349: failed cast → null),
    expressed as conditional aggregation — one scan, no per-column jobs."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_rows"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isNull() | (F.col("o_orderpriority").cast("string") == ""),
                1,
            ).otherwise(0)
        ).alias("null_priority"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(
            F.when(F.expr("try_cast(o_orderpriority AS double)").isNull(), 1).otherwise(0)
        ).alias("uncastable_priority"),
    )


@query(
    "rollup_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (absent in the reference, noted free in Spark —
    SURVEY §2.5 closing note)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("cnt"))
    )


@query(
    "cube_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY §2.5 closing note)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(money_sum("l_extendedprice").alias("sum_price"))
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# --------------------------------------------------------------------------


@query(
    "anti_join_orphans",
    oracle="""
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left-anti join for referential integrity (reference
    src/etl_utils.py:170-179, 211-221): orders with no lineitems.

    Scale note: stays fully on executors (the reference's legacy J4
    collect()+isin pattern is banned, SURVEY §7.5)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem.select("l_orderkey"), orders.o_orderkey == F.col("l_orderkey"), "left_anti"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "semi_join_present",
    oracle="""
SELECT o.o_orderkey
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def semi_join_present(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 modernized: the reference's driver-side isin semi-join
    (src/glue_etl.py:153-189) as a distributed left-semi join."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem.select("l_orderkey"), orders.o_orderkey == F.col("l_orderkey"), "left_semi"
    ).select("o_orderkey")


@query(
    "outer_join_flagback",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       coalesce(o.n_orders, 0) AS n_orders,
       CASE WHEN o.n_orders IS NULL THEN 'no_orders' ELSE 'has_orders' END AS order_flag
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
  ON c.c_custkey = o.o_custkey
""",
)
def outer_join_flagback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-outer flag-back enrichment (reference src/etl_utils.py:183-202,
    226-245): join an aggregate back and derive a status flag from nullness."""
    customer = load(spark, sf_dir, "customer")
    ocount = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return customer.join(ocount, customer.c_custkey == ocount.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "no_orders").otherwise("has_orders").alias("order_flag"),
    )


# --------------------------------------------------------------------------
# Window / top-k (SURVEY §2.6, 2.7)
# --------------------------------------------------------------------------


@query(
    "window_top1_per_group",
    oracle="""
SELECT customer_id, favorite_product, purchase_count FROM (
  SELECT o.o_custkey AS customer_id, l.l_partkey AS favorite_product,
         count(*) AS purchase_count,
         row_number() OVER (PARTITION BY o.o_custkey
                            ORDER BY count(*) DESC, l.l_partkey ASC) AS rn
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
) WHERE rn = 1
""",
)
def window_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+P12 favorite-product-per-customer (reference
    docs/etl_processes.md:642-652) with row_number + deterministic tiebreak
    instead of the reference's tie-prone rank() (SURVEY §7.5)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("customer_id").orderBy(F.desc("purchase_count"), F.asc("favorite_product"))
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("customer_id"), F.col("l_partkey").alias("favorite_product"))
        .agg(F.count("*").alias("purchase_count"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "top_k_global",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O3 global sort + limit (reference src/glue_etl.py:372-377,
    stepfunctions LIMIT queries). Spark executes as TakeOrderedAndProject —
    no full global sort materialization at scale."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@query(
    "running_totals",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq,
       datediff('day',
                CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
""",
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames + lag (beyond the reference's single rank() — SURVEY
    §2.6 notes their absence; the engine exposes the full window surface):
    per-customer running spend, order sequence number, inter-order gap."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.sum(dec2("o_totalprice")).over(wf).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))).alias(
            "days_since_prev"
        ),
    )


# --------------------------------------------------------------------------
# Filters / scalar pipelines (SURVEY §2.3, 2.8)
# --------------------------------------------------------------------------


@query(
    "between_dates_filter",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
""",
)
def between_dates_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 between-dates filter (reference docs/data_quality.md:315-323).
    The predicate reaches the parquet scan as PushedFilters."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1997-01-01 00:00:00", "1997-12-31 23:59:59")
    ).agg(F.count("*").alias("n_rows"), money_sum("l_extendedprice").alias("sum_price"))


@query(
    "compound_predicate_filter",
    oracle="""
SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE (l_discount > 0.05 AND l_quantity < 10.0 AND l_returnflag IS NOT NULL)
   OR l_returnflag = 'R'
""",
)
def compound_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P8 compound boolean predicates (reference src/glue_etl.py:214,
    docs/etl_processes.md:307)."""
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 10.0)
        & F.col("l_returnflag").isNotNull()
    ) | (F.col("l_returnflag") == "R")
    return li.filter(cond).agg(
        F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "membership_filter",
    oracle="""
SELECT o_orderpriority, count(*) AS cnt
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY o_orderpriority
""",
)
def membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 membership predicate with a literal list (the legitimate isin use;
    the driver-collected variant is banned — SURVEY §7.5)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "scalar_pipeline",
    oracle="""
SELECT event_id,
       upper(trim(event_type)) AS event_type_norm,
       dayofweek(ts) + 1 AS day_of_week,
       hour(ts) AS hour_of_day,
       datediff('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_to_cutoff,
       concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS event_key
FROM events
""",
)
def scalar_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F10 scalar function pipeline (reference docs/etl_processes.md:253,
    308-309, 638; src/etl_utils.py:264-270): upper/trim, dayofweek (Spark:
    Sunday=1; oracle shifts DuckDB's Sunday=0), hour, datediff, concat_ws."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.upper(F.trim("event_type")).alias("event_type_norm"),
        F.dayofweek("ts").alias("day_of_week"),
        F.hour("ts").alias("hour_of_day"),
        F.datediff(F.lit("2024-06-01").cast("date"), F.to_date("ts")).alias("days_to_cutoff"),
        F.concat_ws("|", "event_type", F.col("user_id").cast("string")).alias("event_key"),
    )


@query(
    "conditional_segmentation",
    oracle="""
SELECT CASE
         WHEN c_acctbal >= 7500 THEN 'platinum'
         WHEN c_acctbal >= 5000 THEN 'gold'
         WHEN c_acctbal >= 2500 THEN 'silver'
         WHEN c_acctbal >= 0 THEN 'bronze'
         ELSE 'delinquent'
       END AS balance_tier,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_balance
FROM customer
GROUP BY 1
""",
)
def conditional_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/F14 chained when().otherwise() segmentation ladder (reference
    docs/etl_processes.md:662-668)."""
    tier = (
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .when(F.col("c_acctbal") >= 0, "bronze")
        .otherwise("delinquent")
    )
    return (
        load(spark, sf_dir, "customer")
        .groupBy(tier.alias("balance_tier"))
        .agg(F.count("*").alias("n_customers"), money_avg("c_acctbal", 4).alias("avg_balance"))
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.11)
# --------------------------------------------------------------------------


@query(
    "set_operations",
    oracle="""
WITH hi AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000),
     recent AS (SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
SELECT 'union_all' AS op, count(*) AS cnt FROM (SELECT * FROM hi UNION ALL SELECT * FROM recent)
UNION ALL
SELECT 'intersect' AS op, count(*) AS cnt FROM (SELECT * FROM hi INTERSECT SELECT * FROM recent)
UNION ALL
SELECT 'except_all' AS op, count(*) AS cnt FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM recent)
""",
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11: union/intersect/exceptAll (absent in the reference; exposed by
    the engine — needed to reassemble multi-day increments at scale)."""
    o = load(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_orderkey")
    rows = [
        hi.unionByName(recent).agg(F.count("*").alias("cnt")).select(F.lit("union_all").alias("op"), "cnt"),
        hi.intersect(recent).agg(F.count("*").alias("cnt")).select(F.lit("intersect").alias("op"), "cnt"),
        hi.exceptAll(recent).agg(F.count("*").alias("cnt")).select(F.lit("except_all").alias("op"), "cnt"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "pivot_returnflag_revenue",
    oracle="""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       CAST(round(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS rf_A,
       CAST(round(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS rf_N,
       CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS rf_R
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
""",
)
def pivot_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape): monthly revenue with return flags as
    columns. The pivot values are DECLARED (['A','N','R']) — without the
    list Spark runs an extra distinct-collect job to discover them, a
    hidden scan at 100 TB. A declared pivot compiles to one hash agg with
    conditional sums (same plan as the oracle's CASE form)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    )
    out = (
        li.groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum(dec2("l_extendedprice")), 2).cast("double"))
    )
    return out.select(
        "ship_month",
        F.coalesce(F.col("A"), F.lit(0.0)).alias("rf_A"),
        F.coalesce(F.col("N"), F.lit(0.0)).alias("rf_N"),
        F.coalesce(F.col("R"), F.lit(0.0)).alias("rf_R"),
    )


_PRICE_BANDS = [
    ("budget", 0.0, 930.0),
    ("mid", 930.0, 960.0),
    ("premium", 960.0, 985.0),
    ("luxury", 985.0, 10000.0),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _PRICE_BANDS)


@query(
    "range_band_join",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
SELECT b.band,
       count(*) AS n_parts,
       CAST(round(sum(CAST(p.p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
       min(p.p_size) AS min_size,
       max(p.p_size) AS max_size
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY 1
""",
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — the non-equi join family the reference
    lacks (SURVEY §2.4 'not present'): each row lands in the band whose
    [lo, hi) interval contains it.

    Scale: the interval side is small by nature (bands/tiers/SLAs) →
    broadcast nested-loop with a range predicate, O(n·k) with tiny k and
    zero shuffle of the fact side. For big-big interval joins, bin both
    sides to overlapping buckets first (same bucketing discipline as the
    LSH operators) so the join becomes equi-on-bucket + residual range."""
    part = load(spark, sf_dir, "part")
    # inline VALUES, not createDataFrame: the literal table materializes
    # JVM-side with zero py4j serialization (measured ~1.5s saved per call)
    bands = spark.sql(
        f"SELECT * FROM VALUES {_BANDS_SQL} AS bands(band, lo, hi)"
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= F.col("lo")) & (part.p_retailprice < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            money_sum("p_retailprice").alias("total_price"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "window_navigation",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(lead(o_orderdate) OVER w AS DATE) AS next_order_date,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate ASC, o_orderkey ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS last_price,
       percent_rank() OVER w AS spend_pct_rank,
       cume_dist() OVER w AS spend_cume_dist,
       ntile(4) OVER w AS spend_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation surface beyond the reference's single rank()
    (SURVEY §2.6): lead, first/last_value, percent_rank, cume_dist, ntile —
    one per-customer sort serves every function (a single Window exchange;
    all eight columns compute in one pass over each partition). last_value
    pins an explicit unbounded-following frame — the default
    current-row-bounded frame is a classic silent-wrong-answer in both
    engines."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date(F.lead("o_orderdate").over(w)).alias("next_order_date"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.percent_rank().over(w).alias("spend_pct_rank"),
        F.cume_dist().over(w).alias("spend_cume_dist"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


@query(
    "unpivot_priority_metrics",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS order_count,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
  FROM orders GROUP BY 1)
SELECT o_orderpriority, metric, value
FROM wide UNPIVOT (value FOR metric IN (order_count, total_value))
""",
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long reshape, the inverse of pivot_returnflag_revenue):
    per-priority metrics melted to (key, metric, value) rows. Spark's
    unpivot/melt compiles to an Expand over the already-aggregated frame —
    the fan-out happens AFTER reduction (5 rows × 2 metrics), never on the
    fact table."""
    wide = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("double").alias("order_count"),
            money_sum("o_totalprice").alias("total_value"),
        )
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["order_count", "total_value"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "grouping_sets_sales",
    oracle="""
SELECT n.n_name AS nation, o.o_orderpriority AS priority,
       grouping(n.n_name) AS g_nation, grouping(o.o_orderpriority) AS g_priority,
       count(*) AS cnt,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
""",
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond the cube/rollup queries): three
    chosen aggregation grains in ONE pass — per-nation, per-priority, and
    grand total — with grouping() indicators disambiguating the NULLs.
    Scale: one Expand×3 + single hash agg, vs three scans if the grains
    ran separately; cheaper than cube (which would pay ×4 for an unwanted
    grain)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("o_orderpriority").alias("priority"), "o_totalprice")
    )
    return (
        j.groupingSets([["nation"], ["priority"], []], "nation", "priority")
        .agg(
            F.grouping("nation").cast("long").alias("g_nation"),
            F.grouping("priority").cast("long").alias("g_priority"),
            F.count("*").alias("cnt"),
            money_sum("o_totalprice").alias("total_value"),
        )
        .select("nation", "priority", "g_nation", "g_priority", "cnt", "total_value")
    )


@query(
    "null_safe_join_sizes",
    oracle="""
WITH a AS (
  SELECT nullif(p_size % 5, 0) AS size_mod, count(*) AS n_all
  FROM part GROUP BY 1),
b AS (
  SELECT nullif(p_size % 5, 0) AS size_mod, count(*) AS n_premium
  FROM part WHERE p_retailprice > 950 GROUP BY 1)
SELECT a.size_mod, a.n_all, b.n_premium
FROM a JOIN b ON a.size_mod IS NOT DISTINCT FROM b.size_mod
""",
)
def null_safe_join_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL group —
    which a plain equi-join silently drops — joins like any other key.
    The null-safe operator stays a hash join (NULL hashes as a normal
    value), NOT a fallback to nested-loop; same plan shape as a standard
    equi-join."""
    p = load(spark, sf_dir, "part")
    key = F.nullif(F.col("p_size") % 5, F.lit(0))
    a = p.groupBy(key.alias("size_mod")).agg(F.count("*").alias("n_all"))
    b = (
        p.filter(F.col("p_retailprice") > 950)
        .groupBy(key.alias("size_mod"))
        .agg(F.count("*").alias("n_premium"))
    )
    bb = b.withColumnRenamed("size_mod", "size_mod_b")
    return (
        a.join(bb, a.size_mod.eqNullSafe(F.col("size_mod_b")))
        .select("size_mod", "n_all", "n_premium")
    )


# ---------------------------------------------------------------------------
# sweep-line interval concurrency
# ---------------------------------------------------------------------------


@query(
    "order_open_interval_concurrency",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS od,
         greatest(CAST(max(l.l_shipdate) AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS cd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
deltas AS (
  SELECT d, CAST(sum(x) AS BIGINT) AS delta
  FROM (SELECT od AS d, 1 AS x FROM iv
        UNION ALL
        SELECT cd + 1 AS d, -1 AS x FROM iv)
  GROUP BY d),
curve AS (
  SELECT d, CAST(sum(delta) OVER (ORDER BY d) AS BIGINT) AS open_orders
  FROM deltas),
mp AS (
  SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         max(open_orders) AS peak_open
  FROM curve GROUP BY 1),
pd AS (
  SELECT mp.month, mp.peak_open, min(c.d) AS peak_date
  FROM curve c JOIN mp ON CAST(date_trunc('month', c.d) AS DATE) = mp.month
                      AND c.open_orders = mp.peak_open
  GROUP BY 1, 2),
om AS (SELECT CAST(date_trunc('month', od) AS DATE) AS month,
              CAST(count(*) AS BIGINT) AS n_opened
       FROM iv GROUP BY 1),
cm AS (SELECT CAST(date_trunc('month', cd) AS DATE) AS month,
              CAST(count(*) AS BIGINT) AS n_closed
       FROM iv GROUP BY 1)
SELECT pd.month, pd.peak_open, pd.peak_date,
       COALESCE(om.n_opened, 0) AS n_opened,
       COALESCE(cm.n_closed, 0) AS n_closed
FROM pd LEFT JOIN om ON pd.month = om.month
        LEFT JOIN cm ON pd.month = cm.month
""",
)
def order_open_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval-concurrency analytics: every order is an
    interval [orderdate, last shipment]; the query reports, per month,
    the PEAK number of simultaneously-open orders (with the first date
    attaining it) plus open/close counts — the WIP/backlog curve ops
    teams watch, and the classic interval-overlap operator class
    (room-booking overlap, session concurrency, connection counts) done
    WITHOUT a self-join: a self-join on overlap is O(n·k) output and
    quadratic in hot windows; the sweep-line is two boundary events per
    interval, a domain-bounded delta table, and one running sum.

    Scale: intervals collapse per order (map-side combine over
    lineitem); boundary deltas collapse to the DATE DOMAIN (~2.5k rows
    for seven years — bounded however many orders exist, the
    value_quantiles_exact argument); the running sum is a window over
    that aggregated bounded frame (the plan-guard-allowed class).
    Months with zero boundary events would be absent from the output —
    impossible at these SFs and irrelevant to parity since both engines
    share the construction.

    Exactness: all counts are integers; dates only (no timestamps), so
    the session timezone never enters."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("od"))
        .agg(F.max(F.to_date("l_shipdate")).alias("mx"))
        .select("od", F.greatest("mx", "od").alias("cd"))
    )
    deltas = (
        iv.select(F.col("od").alias("d"), F.lit(1).alias("x"))
        .unionAll(
            iv.select(F.date_add("cd", 1).alias("d"), F.lit(-1).alias("x"))
        )
        .groupBy("d")
        .agg(F.sum("x").cast("long").alias("delta"))
    )
    # running sum over the COLLAPSED per-date frame: bounded by the date
    # domain, the window class the plan guard allows (aggregated input)
    curve = deltas.select(
        "d",
        F.sum("delta")
        .over(Window.orderBy("d"))
        .cast("long")
        .alias("open_orders"),
    )
    month = F.to_date(F.date_trunc("month", "d"))
    mp = curve.groupBy(month.alias("month")).agg(
        F.max("open_orders").alias("peak_open")
    )
    pd_ = (
        curve.join(
            mp,
            (month == mp["month"]) & (curve["open_orders"] == mp["peak_open"]),
        )
        .groupBy("month", "peak_open")
        .agg(F.min("d").alias("peak_date"))
    )
    om = iv.groupBy(F.to_date(F.date_trunc("month", "od")).alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_opened")
    )
    cm = iv.groupBy(F.to_date(F.date_trunc("month", "cd")).alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_closed")
    )
    return (
        pd_.join(om, on="month", how="left")
        .join(cm, on="month", how="left")
        .select(
            "month",
            "peak_open",
            "peak_date",
            F.coalesce("n_opened", F.lit(0)).cast("long").alias("n_opened"),
            F.coalesce("n_closed", F.lit(0)).cast("long").alias("n_closed"),
        )
    )
