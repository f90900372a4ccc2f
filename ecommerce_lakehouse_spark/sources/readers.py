"""Source scans (SURVEY §2.1 S1-S6) and schema-tolerant casting (P11).

The reference ingests CSV with header+inferSchema (src/glue_etl.py:589-594),
globbed daily files (G:614, G:639-641), then casts column-by-column to a
declared StructType with per-column error tolerance — a failed cast yields
NULL, not a failed job (G:296-307, src/etl_utils.py:320-349). Its docs
variant reads Excel via a third-party reader (docs/etl_processes.md:133-136);
here every tabular format goes through one dispatcher and the same cast
discipline, so the medallion pipeline is format-agnostic.

Scale notes: prefer an explicit schema over inferSchema in production —
inference scans the data once just to guess types (2× read at 100 TB). The
tolerant cast is `try_cast` (JVM, codegen), never a Python UDF; rows whose
casts failed surface as NULLs that the NotNull validation rules route to
the rejected quarantine (same flow as the reference).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV scan (S1) with glob/multi-file paths (S2: 'orders/*.csv').

    With an explicit ``schema`` the inference pass is skipped (the scale
    path); otherwise header+inferSchema matches the reference exactly."""
    reader = spark.read.format("csv").option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.load(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON-lines scan (additive; same dispatcher discipline)."""
    reader = spark.read.format("json")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Format dispatcher (S1/S3/S4 unified): csv | json | parquet.

    The reference's Excel branch (docs/etl_processes.md:133-136, third-party
    reader not installed here) is behaviorally a header+inferSchema tabular
    scan — route .xlsx exports through CSV instead."""
    if fmt == "csv":
        return read_csv(spark, path, schema=schema)
    if fmt == "json":
        return read_json(spark, path, schema=schema)
    if fmt == "parquet":
        reader = spark.read.format("parquet")
        for k, v in options.items():
            reader = reader.option(k, v)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    raise ValueError(f"unsupported source format: {fmt}")


def cast_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Tolerant per-column cast to a declared schema (P11).

    Columns cast with try_cast semantics — a malformed value becomes NULL
    (then caught by NotNull rules downstream), mirroring the reference's
    per-column try/except (etl_utils.py:334-336,346-349) without its
    row-at-a-time failure mode. Columns in the schema but absent from the
    input are added as typed NULLs; extra input columns pass through
    unchanged (schema evolution stance: additive, explicit)."""
    out = df
    for field in schema.fields:
        if field.name in df.columns:
            out = out.withColumn(
                field.name,
                F.col(field.name).try_cast(field.dataType),
            )
        else:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
    return out
