"""Custom relational operators Spark lacks as single calls, built as
compositions of DataFrame ops (SURVEY.md §2.4 closing note: as-of joins for
the events table are additive scope — built from union + last() over, not a
theta join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_KEY, _T, _SIDE, _PAY = "__asof_key", "__asof_t", "__asof_side", "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the right
    row with the greatest ``right_time <= left_time`` within the same key
    (inclusive match, like DuckDB/pandas ASOF). Left rows with no earlier
    right row keep null payloads.

    Scale design: a naive as-of is a range theta-join (quadratic). This is
    the merge-based form — union both sides, one shuffle on the key, one
    ordered window pass with last(ignorenulls) — O(n log n) per key group
    and AQE-skew-friendly. Right rows must be unique per (key, time);
    pre-dedup with a deterministic survivor if not.
    """
    pay_struct = F.struct(*[F.col(c) for c in payload_cols]).alias(_PAY)
    r = right.select(
        F.col(right_on).alias(_KEY), F.col(right_time).alias(_T), F.lit(0).alias(_SIDE), pay_struct
    )
    pay_type = r.schema[_PAY].dataType

    left_fields = left.schema.fields
    l2 = left.select(
        *[F.col(f.name) for f in left_fields],
        F.col(left_on).alias(_KEY),
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    r2 = r.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_fields], _KEY, _T, _SIDE, _PAY
    )
    # right rows sort before left rows at equal timestamps → inclusive match
    w = (
        Window.partitionBy(_KEY)
        .orderBy(F.col(_T).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2).withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    return u.filter(F.col(_SIDE) == 1).select(
        *[F.col(f.name) for f in left_fields],
        *[F.col(f"{_PAY}.{c}").alias(c) for c in payload_cols],
    )


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """A8 dedup with a defined survivor (reference src/glue_etl.py:404 uses
    dropDuplicates → arbitrary survivor; SURVEY §7.5 mandates determinism).
    Single shuffle on ``keys``; ``order_by`` must totally order rows within
    a key group."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
