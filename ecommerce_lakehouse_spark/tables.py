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

    events.ts has shipped in two physical encodings across testdata
    generations: parquet TIMESTAMP(NANOS) (Spark 4 reads only via the
    legacy nanos-as-long conf) and plain TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ). Normalize both to session-local TimestampType with
    the same rendered (naive) wall-clock value as the DuckDB oracle,
    regardless of session timezone.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Raw nanos → micros (integer truncation, bit-identical to
            # DuckDB); to_utc_timestamp(..., current_timezone()) pins the
            # rendered naive value for any session timezone.
            return df.withColumn(
                "ts",
                F.expr("to_utc_timestamp(timestamp_micros(ts DIV 1000), current_timezone())"),
            )
        if isinstance(ts_type, T.TimestampNTZType):
            # NTZ→TZ cast interprets the naive value at the session zone,
            # so render-back yields the identical wall clock.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() consumption
    (reference's Athena-over-catalog path, SURVEY §3.3 → spark.sql)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
