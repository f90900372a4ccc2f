"""Scale-pattern operators: skew-salted joins and bucketed co-located
joins (SURVEY §7.5 100 TB design; reference relies on AQE skew handling,
src/glue_etl.py:537 — these are the explicit tools for when runtime
re-planning isn't enough).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: a hot key that exceeds what AQE's
    skew-split can rebalance (one key > one partition's worth) gets spread
    across ``n_salts`` reducers.

    The big (left) side gets a deterministic per-row salt; the small
    (right) side is replicated once per salt value; the join key becomes
    (key, salt) so the hot key's rows land on n_salts partitions instead
    of one. Costs: right side inflates ×n_salts — keep it the dimension
    side. Results are identical to the unsalted join (asserted in tests).

    Only left-preserving join types are allowed: with ``right`` or
    ``full_outer`` every unmatched RIGHT row would surface once per salt
    replica (n_salts duplicates). Swap the sides (salt the other input)
    for a right-skewed outer join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched right rows "
            f"x{n_salts}; allowed: inner/left/left_semi/left_anti "
            "(swap sides for right-preserving joins)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)).alias(
        "__salt"
    )
    sl = left.select("*", salt)
    sr = right.select(
        "*", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)])).alias("__salt")
    )
    return sl.join(sr, [on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write a bucketed (and bucket-sorted) catalog table: both sides of a
    recurring fact-fact join bucketed on the join key join WITHOUT any
    exchange — the shuffle is paid once at write time, then every
    downstream join/aggregation on that key is co-located.

    This is the open-Spark equivalent of the reference's Z-order +
    partition co-location strategy for silver.order_items
    (docs/data_model.md:134-150): organize data once, save the shuffle on
    every read."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    shuffle-free (SortMergeJoin with zero Exchange; asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
