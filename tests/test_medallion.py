"""End-to-end medallion pipeline on sf0.001 into a temp LakeTable root."""

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.pipelines import run_medallion
from ecommerce_lakehouse_spark.tables import load

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow


def test_medallion_end_to_end(spark, sf_dir, tmp_path):
    t = run_medallion(spark, sf_dir, str(tmp_path / "lake"))

    raw_orders = load(spark, sf_dir, "orders").count()
    silver = t["silver.orders"].read().count()
    rejected = t["rejected.orders"].read().count()
    # valid + rejected == raw (split is complementary); silver == valid
    # (orders pk already unique in testdata)
    assert silver + rejected == raw_orders
    assert t["metrics"]["orders"]["silver_rows"] == silver

    # silver derived columns exist (E:307-309)
    cols = set(t["silver.orders"].read().columns)
    assert {"day_of_week", "hour_of_day"} <= cols

    # silver products derived columns (docs/data_model.md:104,109)
    pcols = set(t["silver.part"].read().columns)
    assert {"is_active", "last_updated_timestamp"} <= pcols
    assert t["silver.part"].read().filter(~F.col("is_active")).count() == 0

    # bronze lineage: source_file is the true input file path
    # (F.input_file_name), not a constant stamp
    src_files = [
        r[0] for r in t["bronze.orders"].read().select("source_file").distinct().collect()
    ]
    assert src_files and all("orders.parquet" in s for s in src_files)

    # smoke phase ran: every clean view served LIMIT 5 rows
    # (stepfunctions/delta-lake.json:147-215)
    assert t["metrics"]["smoke"] == {
        "clean_orders": 5, "clean_order_items": 5, "clean_products": 5,
    }

    # rejected rows carry audit metadata (G:338-346)
    rej_cols = set(t["rejected.orders"].read().columns)
    assert {"validation_errors", "rejection_time", "source", "job_name"} <= rej_cols

    # lineitem RI rules: every silver lineitem joins an order
    sl = t["silver.lineitem"].read()
    so = t["silver.orders"].read()
    orphans = sl.join(so, sl.l_orderkey == so.o_orderkey, "left_anti").count()
    assert orphans == 0

    # gold mart populated and consistent with silver
    gold = t["gold.daily_sales"].read()
    assert gold.count() > 0
    total_orders_gold = gold.agg(F.sum("order_count")).collect()[0][0]
    distinct_orders_silver = (
        sl.join(so.select("o_orderkey"), sl.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert total_orders_gold == distinct_orders_silver


def test_medallion_rerun_idempotent_silver(spark, sf_dir, tmp_path):
    root = str(tmp_path / "lake")
    t1 = run_medallion(spark, sf_dir, root)
    n1 = t1["silver.orders"].read().count()
    t2 = run_medallion(spark, sf_dir, root)
    n2 = t2["silver.orders"].read().count()
    # MERGE keyed on pk: re-processing the same batch is a no-op upsert
    assert n1 == n2
