"""Validation-engine semantics exposed as oracle-checked queries
(SURVEY §2.3 P5/P10, §2.8 F4-F7; reference src/etl_utils.py:110-297)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.quality import Custom, NotNull, Range, RefIntegrity
from ecommerce_lakehouse_spark.quality.rules import split_valid_rejected, validate
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

# Rule set under test: range rejection fires on high-value orders, the
# custom rule on late orders; null/RI rules pass on this data but exercise
# the flag-back join path.
_ERRS_SQL = """
    CASE WHEN o_custkey IS NULL THEN ['Null o_custkey'] ELSE []::VARCHAR[] END ||
    CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0 OR o_totalprice > 300000)
         THEN ['Out-of-range o_totalprice'] ELSE []::VARCHAR[] END ||
    CASE WHEN o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey)
         THEN ['Invalid o_custkey reference'] ELSE []::VARCHAR[] END ||
    CASE WHEN o_orderdate > TIMESTAMP '2001-06-01 00:00:00'
         THEN ['Late order_date'] ELSE []::VARCHAR[] END
"""


def _validated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rules = [
        NotNull("o_custkey"),
        Range("o_totalprice", min=0, max=300000),
        RefIntegrity("o_custkey", customer, "c_custkey"),
        Custom(F.col("o_orderdate") > "2001-06-01 00:00:00", "Late order_date"),
    ]
    return validate(orders, rules)


@query(
    "validation_split_rejected",
    oracle=f"""
WITH v AS (SELECT o_orderkey, {_ERRS_SQL} AS errs FROM orders)
SELECT o_orderkey, array_to_string(errs, '; ') AS validation_errors
FROM v WHERE len(errs) > 0
""",
)
def validation_split_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejected branch of the dual-output validation split (P5, U:275-281)
    with deterministic rule-ordered error strings (F4-F7 array pipeline).
    Audit metadata columns (rejection_time etc.) excluded here: they are
    run-dependent (SURVEY §7.5 determinism policy)."""
    _, rejected = split_valid_rejected(_validated_orders(spark, sf_dir), with_metadata=False)
    return rejected.select("o_orderkey", "validation_errors")


@query(
    "validation_error_histogram",
    oracle=f"""
WITH v AS (SELECT {_ERRS_SQL} AS errs FROM orders)
SELECT array_to_string(errs, '; ') AS validation_errors, count(*) AS cnt
FROM v WHERE len(errs) > 0 GROUP BY 1
""",
)
def validation_error_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's rejected-records error histogram
    (src/glue_etl.py:369-373) over the same rule set."""
    _, rejected = split_valid_rejected(_validated_orders(spark, sf_dir), with_metadata=False)
    return rejected.groupBy("validation_errors").agg(F.count("*").alias("cnt"))


@query(
    "validation_valid_count",
    oracle=f"""
WITH v AS (SELECT {_ERRS_SQL} AS errs FROM orders)
SELECT count(*) FILTER (len(errs) = 0) AS valid_rows,
       count(*) FILTER (len(errs) > 0) AS rejected_rows,
       count(*) AS total_rows
FROM v
""",
)
def validation_valid_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-level quality metric (Q:139-186): valid/rejected/total in one
    conditional aggregation pass — no separate count() jobs (A10 note)."""
    v = _validated_orders(spark, sf_dir)
    is_valid = F.size(F.col("validation_errors_list")) == 0
    return v.agg(
        F.sum(F.when(is_valid, 1).otherwise(0)).alias("valid_rows"),
        F.sum(F.when(~is_valid, 1).otherwise(0)).alias("rejected_rows"),
        F.count("*").alias("total_rows"),
    )
