"""Scale-pattern operators: salted joins must be result-identical to plain
joins on skewed data; bucketed tables must join with zero exchanges (the
shuffle paid once at write time)."""

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from explain_audit import plan_text  # noqa: E402

from ecommerce_lakehouse_spark.operators import bucketed_join, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key — the AQE-resistant worst case
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (10, "a"), (20, "b"), (30, "c")], ["k", "name"]
    )
    plain = left.join(right, "k").select("k", "payload", "name")
    salted = salted_join(left, right, "k").select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "r1")], ["k", "w"])
    got = salted_join(left, right, "k", n_salts=4, how="left").select("k", "v", "w")
    assert sorted(map(tuple, got.collect())) == [(1, "x", "r1"), (2, "y", None), (3, "z", None)]


def test_salted_join_equivalence_every_allowed_how(spark):
    """Property: for every allowed join type, salted == plain on data with
    unmatched rows on BOTH sides (the case that exposes replication bugs)."""
    import pytest

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "r1"), (2, "r2"), (9, "r9")], ["k", "w"])
    for how in ["inner", "left", "left_semi", "left_anti"]:
        plain = left.join(right, "k", how)
        salted = salted_join(left, right, "k", n_salts=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), f"how={how} mismatch"
    for how in ["right", "full", "full_outer", "rightouter"]:
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", n_salts=4, how=how)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=4, path=str(tmp_path / "bo"))
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=4, path=str(tmp_path / "bl"))
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable auto-broadcast: at test scale the tables are tiny and Spark
    # would broadcast; the property under test is the big-big join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        text = plan_text(joined)
        assert "SortMergeJoin" in text
        assert "Exchange" not in text, "bucketed join must not shuffle"
        # and it's still correct
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
