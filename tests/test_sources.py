"""Source scans + tolerant cast (SURVEY §2.1 S1-S3, §2.3 P11): CSV with
header/glob/inference, the format dispatcher, and try_cast-to-declared-schema
feeding the validation split — the reference's full CSV→bronze→silver ingest
shape on messy input."""

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ecommerce_lakehouse_spark.quality import NotNull, split_valid_rejected, validate
from ecommerce_lakehouse_spark.sources import cast_to_schema, read_csv, read_table

SCHEMA = StructType(
    [
        StructField("order_id", IntegerType()),
        StructField("amount", DoubleType()),
        StructField("order_ts", TimestampType()),
        StructField("note", StringType()),
    ]
)

CSV_DAY1 = """order_id,amount,order_ts,note
1,10.50,2025-04-01 10:00:00,ok
2,20.25,2025-04-01 11:00:00,ok
not_an_id,30.00,2025-04-01 12:00:00,bad id
"""

CSV_DAY2 = """order_id,amount,order_ts,note
4,oops,2025-04-02 09:00:00,bad amount
5,50.75,not a timestamp,bad ts
6,60.00,2025-04-02 10:00:00,ok
"""


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_csv_glob_scan_and_inference(spark, tmp_path):
    _write(tmp_path, "2025-04-01.csv", CSV_DAY1)
    _write(tmp_path, "2025-04-02.csv", CSV_DAY2)
    df = read_csv(spark, str(tmp_path / "*.csv"))
    assert df.count() == 6
    assert set(df.columns) == {"order_id", "amount", "order_ts", "note"}
    # mixed good/bad values force string inference on polluted columns
    assert dict(df.dtypes)["order_id"] == "string"


def test_cast_to_schema_tolerant(spark, tmp_path):
    _write(tmp_path, "day1.csv", CSV_DAY1)
    _write(tmp_path, "day2.csv", CSV_DAY2)
    raw = read_csv(spark, str(tmp_path / "*.csv"))
    cast = cast_to_schema(raw, SCHEMA)
    assert dict(cast.dtypes)["order_id"] == "int"
    assert dict(cast.dtypes)["amount"] == "double"
    assert dict(cast.dtypes)["order_ts"] == "timestamp"
    rows = {r["note"]: r for r in cast.collect()}
    assert rows["bad id"]["order_id"] is None
    assert rows["bad amount"]["amount"] is None
    assert rows["bad ts"]["order_ts"] is None
    assert rows["ok"]["order_id"] in (1, 2, 6)


def test_cast_adds_missing_columns_as_typed_nulls(spark):
    df = spark.createDataFrame([(1,)], ["order_id"])
    cast = cast_to_schema(df, SCHEMA)
    assert dict(cast.dtypes)["amount"] == "double"
    assert cast.first()["amount"] is None


def test_csv_ingest_to_validation_split(spark, tmp_path):
    """End-to-end reference shape: glob CSV → tolerant cast → validate →
    valid/rejected split; every malformed cell lands in quarantine with
    its error message, valid rows survive untouched."""
    _write(tmp_path, "day1.csv", CSV_DAY1)
    _write(tmp_path, "day2.csv", CSV_DAY2)
    raw = read_table(spark, str(tmp_path / "*.csv"), fmt="csv")
    cast = cast_to_schema(raw, SCHEMA)
    validated = validate(
        cast, [NotNull("order_id"), NotNull("amount"), NotNull("order_ts")]
    )
    valid, rejected = split_valid_rejected(validated, source="csvtest", job_name="t")
    assert valid.count() == 3
    assert rejected.count() == 3
    errs = [r["validation_errors"] for r in rejected.collect()]
    assert all(e for e in errs)


def test_explicit_schema_skips_inference(spark, tmp_path):
    _write(tmp_path, "day1.csv", CSV_DAY1)
    df = read_csv(spark, str(tmp_path / "day1.csv"), schema=SCHEMA)
    assert dict(df.dtypes)["order_id"] == "int"
    # malformed id row: CSV reader's PERMISSIVE mode nulls the bad cell
    assert df.filter(F.col("order_id").isNull()).count() == 1


def test_empty_relation_short_circuit(spark):
    """Reference S6 (empty-relation source, etl_utils.py:121-128): an empty
    typed frame flows through cast -> validate -> split with schemas intact
    and zero rows on both branches."""
    empty = spark.createDataFrame([], schema=SCHEMA)
    validated = validate(cast_to_schema(empty, SCHEMA), [NotNull("order_id")])
    valid, rejected = split_valid_rejected(validated, source="s6", job_name="t")
    assert valid.count() == 0 and rejected.count() == 0
    assert "order_id" in valid.columns and "validation_errors" in rejected.columns


def test_sharded_export_deterministic(spark, sf_dir, tmp_path):
    """write_sharded: stable shard membership across two runs, hive
    shard dirs on disk, one file per shard, lossless round trip."""
    import glob

    from ecommerce_lakehouse_spark.sources import read_shards, with_shard, write_sharded
    from ecommerce_lakehouse_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    p1, p2 = str(tmp_path / "exp1"), str(tmp_path / "exp2")
    write_sharded(docs, p1, key="doc_id", n_shards=8)
    write_sharded(docs, p2, key="doc_id", n_shards=8)

    a = {(r.doc_id, r.shard) for r in read_shards(spark, p1).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in read_shards(spark, p2).select("doc_id", "shard").collect()}
    assert a == b  # deterministic assignment, run to run
    assert len(a) == docs.count()

    shard_dirs = sorted(glob.glob(f"{p1}/shard=*"))
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1  # one file per shard

    # shard-subset read prunes partitions and returns only those shards
    subset = read_shards(spark, p1, shards=[0, 3])
    assert set(r.shard for r in subset.select("shard").distinct().collect()) <= {0, 3}


def test_sharded_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from ecommerce_lakehouse_spark.sources import read_shards, write_sharded
    from ecommerce_lakehouse_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    p = str(tmp_path / "jsonl")
    write_sharded(docs, p, key="doc_id", n_shards=4, fmt="jsonl")
    back = read_shards(spark, p, fmt="jsonl")
    assert back.count() == docs.count()
    orig = {(r.doc_id, r.text) for r in docs.collect()}
    got = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    assert got == orig
