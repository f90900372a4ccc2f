"""Lakehouse write-path semantics exposed as queries (SURVEY §2.2).

The storage side (versioned copy-on-write parquet) lives in lake/table.py
and is exercised by tests; the MERGE's *logical* semantics are exposed here
as a pure-DataFrame query so the oracle can verify them."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.lake.merge import merge_upsert
from ecommerce_lakehouse_spark.money import dec2
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load


@query(
    "merge_upsert_snapshot",
    oracle="""
WITH target AS (
  SELECT o_orderkey, o_totalprice,
         o_orderstatus, CAST(o_orderdate AS DATE) AS order_date
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
), updates AS (
  SELECT o_orderkey,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(4,2)), 2) AS DOUBLE)
           AS o_totalprice,
         'U' AS o_orderstatus, CAST(o_orderdate AS DATE) AS order_date
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
)
SELECT * FROM updates
UNION ALL
SELECT * FROM target t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
""",
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 Delta-MERGE semantics (reference src/glue_etl.py:442-458) as
    DataFrame algebra: a 1998-99 "update batch" (repriced, restatused)
    merged into a pre-1999 snapshot — matched keys take the update row,
    unmatched target rows pass through, new keys insert."""
    o = load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < "1999-01-01 00:00:00").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("order_date"),
    )
    updates = o.filter(
        (F.col("o_orderdate") >= "1998-01-01 00:00:00")
        & (F.col("o_orderdate") < "2000-01-01 00:00:00")
    ).select(
        "o_orderkey",
        F.round(dec2("o_totalprice") * F.lit(1.05).cast("decimal(4,2)"), 2)
        .cast("double")
        .alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
        F.to_date("o_orderdate").alias("order_date"),
    )
    return merge_upsert(target, updates, ["o_orderkey"])
