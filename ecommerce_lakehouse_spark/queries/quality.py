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


@query(
    "profile_constraint_suggestions",
    oracle="""
WITH p AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_orderkey) AS BIGINT) AS nn_key,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
         min(o_orderkey) AS mn_key, max(o_orderkey) AS mx_key,
         CAST(count(o_orderstatus) AS BIGINT) AS nn_status,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
         array_to_string(list_sort(list(DISTINCT o_orderstatus)), ', ')
           AS vals_status,
         CAST(count(o_orderpriority) AS BIGINT) AS nn_pri,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_pri,
         array_to_string(list_sort(list(DISTINCT o_orderpriority)), ', ')
           AS vals_pri,
         CAST(count(o_totalprice) AS BIGINT) AS nn_price,
         CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
         CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
         CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
         CAST(count(o_orderdate) AS BIGINT) AS nn_date,
         CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_date,
         CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS mn_date,
         CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS mx_date
  FROM orders),
sugg AS (
  SELECT 'o_orderkey' AS column_name, 'not_null' AS rule,
         'NOT NULL' AS expression, nd_key AS n_distinct,
         CAST(n - nn_key AS DOUBLE) / n AS null_frac
  FROM p WHERE nn_key = n
  UNION ALL
  SELECT 'o_orderkey', 'unique', 'UNIQUE', nd_key,
         CAST(n - nn_key AS DOUBLE) / n
  FROM p WHERE nd_key = nn_key
  UNION ALL
  SELECT 'o_orderkey', 'range',
         'BETWEEN ' || CAST(mn_key AS VARCHAR) || ' AND '
                    || CAST(mx_key AS VARCHAR),
         nd_key, CAST(n - nn_key AS DOUBLE) / n
  FROM p
  UNION ALL
  SELECT 'o_orderstatus', 'not_null', 'NOT NULL', nd_status,
         CAST(n - nn_status AS DOUBLE) / n
  FROM p WHERE nn_status = n
  UNION ALL
  SELECT 'o_orderstatus', 'allowed_values', 'IN (' || vals_status || ')',
         nd_status, CAST(n - nn_status AS DOUBLE) / n
  FROM p WHERE nd_status BETWEEN 2 AND 8
  UNION ALL
  SELECT 'o_orderpriority', 'not_null', 'NOT NULL', nd_pri,
         CAST(n - nn_pri AS DOUBLE) / n
  FROM p WHERE nn_pri = n
  UNION ALL
  SELECT 'o_orderpriority', 'allowed_values', 'IN (' || vals_pri || ')',
         nd_pri, CAST(n - nn_pri AS DOUBLE) / n
  FROM p WHERE nd_pri BETWEEN 2 AND 8
  UNION ALL
  SELECT 'o_totalprice', 'not_null', 'NOT NULL', nd_price,
         CAST(n - nn_price AS DOUBLE) / n
  FROM p WHERE nn_price = n
  UNION ALL
  SELECT 'o_totalprice', 'range',
         'BETWEEN ' || mn_price || ' AND ' || mx_price,
         nd_price, CAST(n - nn_price AS DOUBLE) / n
  FROM p
  UNION ALL
  SELECT 'o_orderdate', 'not_null', 'NOT NULL', nd_date,
         CAST(n - nn_date AS DOUBLE) / n
  FROM p WHERE nn_date = n
  UNION ALL
  SELECT 'o_orderdate', 'range',
         'BETWEEN ' || mn_date || ' AND ' || mx_date,
         nd_date, CAST(n - nn_date AS DOUBLE) / n
  FROM p)
SELECT * FROM sugg ORDER BY column_name, rule
""",
)
def profile_constraint_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suggestion (the `analyze -> suggest ->
    enforce` loop of AWS Deequ / DLT expectations): profile the orders
    table once and emit the CHECK constraints the data currently
    satisfies — NOT NULL where no null was seen, UNIQUE where distinct
    equals row count, IN (...) for low-cardinality categoricals (2-8
    values, sorted), BETWEEN min AND max for numerics and dates — each
    with its support metrics (distinct count, null fraction). The
    output rows are exactly what `LakeTable.add_constraint` accepts,
    closing the loop with the enforcement engine (quality/rules.py).

    Determinism: every suggestion string is built from exact values
    rendered through cross-engine-stable types — integers and dates
    render identically everywhere, and the price range goes through
    DECIMAL(18,2) (double->string formatting differs between engines
    and is never used); null fractions are exact-input divisions.

    Scale: two aggregate passes over the table — a plain hash-aggregate
    pass (counts/min/max/collect_set, no Expand) and a distinct-only
    pass (Expand 5x into pure HashAggregate with map-side partial
    dedup) — recombined via a broadcast-scalar crossJoin into a single
    profile row (see the inline comment below for why the mixed
    single-pass form was slower); suggestion assembly is row-free
    conditional projection from that 1-row profile."""
    o = load(spark, sf_dir, "orders")
    # Two aggregation passes instead of one mixed aggregate (guide §2.3,
    # "aggregate before you shuffle"): mixing 5 countDistincts with
    # collect_set forced RewriteDistinctAggregates to Expand every row
    # 6x AND fall off hash aggregation (ObjectHashAggregate partials
    # into a final SortAggregate keyed on all five expanded columns —
    # a full sort of 6x the table). Splitting them keeps each pass in
    # its fast shape: the distinct pass is Expand 5x into pure
    # HashAggregate (map-side partial dedup, fixed-width rows), the
    # plain pass scans once with map-side combine and carries the two
    # low-cardinality collect_sets without an Expand under it. The two
    # 1-row results recombine with the broadcast-scalar crossJoin idiom.
    base_aggs = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_orderkey").cast("long").alias("nn_key"),
        F.min("o_orderkey").alias("mn_key"),
        F.max("o_orderkey").alias("mx_key"),
        F.count("o_orderstatus").cast("long").alias("nn_status"),
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ", ").alias(
            "vals_status"
        ),
        F.count("o_orderpriority").cast("long").alias("nn_pri"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ", ").alias(
            "vals_pri"
        ),
        F.count("o_totalprice").cast("long").alias("nn_price"),
        F.min("o_totalprice").cast("decimal(18,2)").cast("string").alias("mn_price"),
        F.max("o_totalprice").cast("decimal(18,2)").cast("string").alias("mx_price"),
        F.count("o_orderdate").cast("long").alias("nn_date"),
        F.min("o_orderdate").cast("date").cast("string").alias("mn_date"),
        F.max("o_orderdate").cast("date").cast("string").alias("mx_date"),
    )
    nd_aggs = o.agg(
        F.countDistinct("o_orderkey").cast("long").alias("nd_key"),
        F.countDistinct("o_orderstatus").cast("long").alias("nd_status"),
        F.countDistinct("o_orderpriority").cast("long").alias("nd_pri"),
        F.countDistinct("o_totalprice").cast("long").alias("nd_price"),
        F.countDistinct("o_orderdate").cast("long").alias("nd_date"),
    )
    p = base_aggs.crossJoin(F.broadcast(nd_aggs))

    def nf(nn):
        return (F.col("n") - F.col(nn)).cast("double") / F.col("n")

    rows = [
        # (column, rule, expression, n_distinct, null_frac, valid)
        (
            "o_orderkey", "not_null", F.lit("NOT NULL"),
            F.col("nd_key"), nf("nn_key"), F.col("nn_key") == F.col("n"),
        ),
        (
            "o_orderkey", "unique", F.lit("UNIQUE"),
            F.col("nd_key"), nf("nn_key"), F.col("nd_key") == F.col("nn_key"),
        ),
        (
            "o_orderkey", "range",
            F.concat(
                F.lit("BETWEEN "), F.col("mn_key").cast("string"),
                F.lit(" AND "), F.col("mx_key").cast("string"),
            ),
            F.col("nd_key"), nf("nn_key"), F.lit(True),
        ),
        (
            "o_orderstatus", "not_null", F.lit("NOT NULL"),
            F.col("nd_status"), nf("nn_status"), F.col("nn_status") == F.col("n"),
        ),
        (
            "o_orderstatus", "allowed_values",
            F.concat(F.lit("IN ("), F.col("vals_status"), F.lit(")")),
            F.col("nd_status"), nf("nn_status"),
            F.col("nd_status").between(2, 8),
        ),
        (
            "o_orderpriority", "not_null", F.lit("NOT NULL"),
            F.col("nd_pri"), nf("nn_pri"), F.col("nn_pri") == F.col("n"),
        ),
        (
            "o_orderpriority", "allowed_values",
            F.concat(F.lit("IN ("), F.col("vals_pri"), F.lit(")")),
            F.col("nd_pri"), nf("nn_pri"), F.col("nd_pri").between(2, 8),
        ),
        (
            "o_totalprice", "not_null", F.lit("NOT NULL"),
            F.col("nd_price"), nf("nn_price"), F.col("nn_price") == F.col("n"),
        ),
        (
            "o_totalprice", "range",
            F.concat(
                F.lit("BETWEEN "), F.col("mn_price"),
                F.lit(" AND "), F.col("mx_price"),
            ),
            F.col("nd_price"), nf("nn_price"), F.lit(True),
        ),
        (
            "o_orderdate", "not_null", F.lit("NOT NULL"),
            F.col("nd_date"), nf("nn_date"), F.col("nn_date") == F.col("n"),
        ),
        (
            "o_orderdate", "range",
            F.concat(
                F.lit("BETWEEN "), F.col("mn_date"),
                F.lit(" AND "), F.col("mx_date"),
            ),
            F.col("nd_date"), nf("nn_date"), F.lit(True),
        ),
    ]
    sugg = p.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.lit(r).alias("rule"),
                        e.alias("expression"),
                        nd.alias("n_distinct"),
                        frac.alias("null_frac"),
                        valid.alias("valid"),
                    )
                    for (c, r, e, nd, frac, valid) in rows
                ]
            )
        ).alias("s")
    )
    return (
        sugg.filter(F.col("s.valid"))
        .select(
            F.col("s.column_name").alias("column_name"),
            F.col("s.rule").alias("rule"),
            F.col("s.expression").alias("expression"),
            F.col("s.n_distinct").alias("n_distinct"),
            F.col("s.null_frac").alias("null_frac"),
        )
        .orderBy("column_name", "rule")
    )
