"""Testdata table access.

The driver's synthetic star schema (TESTDATA.md): region nation customer
supplier part orders lineitem events documents embeddings — one parquet
file each under a scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain parquet scan → Catalyst gets full
    pushdown/pruning; at cluster scale the same call reads a partitioned
    table directory.

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark 4 refuses
    to read natively: read it as raw nanos (legacy conf, runtime-settable)
    and convert with integer division to microsecond TimestampType —
    bit-identical to DuckDB's nanos→micros truncation.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        # to_utc_timestamp(..., current_timezone()) pins the *rendered*
        # (naive) value regardless of session timezone, matching the
        # tz-naive oracle even if the harness session isn't UTC.
        return spark.read.parquet(path).withColumn(
            "ts",
            F.expr("to_utc_timestamp(timestamp_micros(ts DIV 1000), current_timezone())"),
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() consumption
    (reference's Athena-over-catalog path, SURVEY §3.3 → spark.sql)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
