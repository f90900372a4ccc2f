"""Medallion (bronze→silver→gold) pipeline (reference src/glue_etl.py:525-689
``main()`` + docs/etl_processes.md bronze/silver/gold ETLs), re-hosted on the
driver's star schema with LakeTable storage.

Per-dataset flow (reference process_dataset G:286-431): scan → metadata
columns → cast → validate → split valid/rejected → quarantine append →
dedup by pk → MERGE into silver. Gold marts recompute from silver.

Scale notes: row counts come from Observation (df.observe) piggybacked on
the write action — the reference's cache()+count() materialization
anti-pattern (G:291-292 etc.) costs an extra job per dataset at 100 TB
(SURVEY §7.5 mandates observe()). Validation is one expression pass; RI
joins broadcast their pruned key sets.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from ecommerce_lakehouse_spark.lake import LakeTable
from ecommerce_lakehouse_spark.operators import dedup_by_key
from ecommerce_lakehouse_spark.quality import (
    NotNull,
    Range,
    RefIntegrity,
    split_valid_rejected,
    validate,
)
from ecommerce_lakehouse_spark.quality.alerts import (
    ALERT_SCHEMA,
    AlertPolicy,
    QualityAlertError,
    blocking,
    evaluate_alerts,
    metric_discrepancy_alert,
    processing_delay_alert,
)
from ecommerce_lakehouse_spark.tables import load


def _bronze(df: DataFrame, source: str) -> DataFrame:
    """Bronze metadata columns (reference docs/etl_processes.md:74,85:
    source_file + ingestion ts). source_file comes from
    ``F.input_file_name()`` so multi-file ingests keep true per-file
    lineage; the caller-supplied ``source`` is the fallback for inputs
    that aren't file scans (e.g. createDataFrame in tests)."""
    return df.withColumn(
        "source_file",
        F.when(F.input_file_name() != "", F.input_file_name()).otherwise(F.lit(source)),
    ).withColumn("ingestion_timestamp", F.current_timestamp())


def _record_alerts(spark, root: str, alerts: list[dict], tables: dict) -> None:
    """Append alert rows to the ``quality_alerts`` LakeTable (the
    reference's Email/SNS channel re-expressed as a tailable table)."""
    keys = [f.split()[0] for f in ALERT_SCHEMA.split(", ")]
    df = spark.createDataFrame(
        [tuple(a[k] for k in keys) for a in alerts], ALERT_SCHEMA
    )
    at = LakeTable(spark, os.path.join(root, "quality_alerts"))
    at.append(df)
    tables["quality_alerts"] = at


def run_medallion(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    alert_policy: AlertPolicy | None = None,
) -> dict:
    """Run the full pipeline; returns {layer.table: LakeTable} plus
    observed row metrics under key "metrics".

    ``alert_policy`` (OFF by default — metric-only runs pay no extra
    jobs): evaluate the reference's quality alert thresholds
    (docs/data_quality.md:414-421) against each dataset's validation
    results in one extra aggregate per dataset; every fired alert is
    recorded in the ``quality_alerts`` LakeTable, and a blocking-severity
    alert (default: critical = schema-level rejection rate) aborts the
    run with :class:`QualityAlertError` AFTER recording — before the
    offending batch reaches silver."""
    tables: dict = {}
    metrics: dict[str, dict] = {}
    all_alerts: list[dict] = []

    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    datasets = {
        # (df, pk, rules, partition_by)
        "part": (
            part,
            ["p_partkey"],
            [NotNull("p_partkey"), Range("p_retailprice", min=0)],
            [],
        ),
        "orders": (
            orders,
            ["o_orderkey"],
            [
                NotNull("o_orderkey"),
                NotNull("o_custkey"),
                Range("o_totalprice", min=0),
            ],
            [],
        ),
        "lineitem": (
            lineitem,
            ["l_orderkey", "l_linenumber"],
            [
                NotNull("l_orderkey"),
                Range("l_quantity", min=0),
                Range("l_discount", min=0, max=1),
                RefIntegrity("l_orderkey", orders, "o_orderkey", broadcast=False),
                RefIntegrity("l_partkey", part, "p_partkey"),
            ],
            [],
        ),
    }

    for name, (df, pk, rules, part_by) in datasets.items():
        t0 = time.time()
        src = os.path.join(sf_dir, f"{name}.parquet")

        # ---- bronze (K3 append semantics; overwrite for idempotent runs)
        bt = LakeTable(spark, os.path.join(root, "bronze", name))
        bt.overwrite(_bronze(df, src), partition_by=part_by)
        tables[f"bronze.{name}"] = bt

        # ---- silver: validate → split → quarantine → dedup → merge (K5)
        obs = Observation(f"{name}_valid")
        validated = validate(bt.read().drop("source_file", "ingestion_timestamp"), rules)
        if alert_policy is not None:
            ds_alerts = evaluate_alerts(validated, rules, alert_policy, name)
            all_alerts.extend(ds_alerts)
            blk = blocking(ds_alerts, alert_policy)
            if blk:
                _record_alerts(spark, root, all_alerts, tables)
                raise QualityAlertError(blk)
        valid, rejected = split_valid_rejected(validated, source=src, job_name="medallion")

        qt = LakeTable(spark, os.path.join(root, "rejected", name))
        qt.append(rejected)
        tables[f"rejected.{name}"] = qt

        if name == "orders":
            # silver derived columns (E:307-309: day_of_week / hour_of_day)
            valid = valid.withColumn("day_of_week", F.dayofweek("o_orderdate")).withColumn(
                "hour_of_day", F.hour("o_orderdate")
            )
        if name == "part":
            # silver.products derived columns (reference docs/data_model.md:
            # 104,109 + docs/etl_processes.md:253-254: is_active flag +
            # last_updated_timestamp change-tracking stamp)
            valid = valid.withColumn("is_active", F.lit(True)).withColumn(
                "last_updated_timestamp", F.current_timestamp()
            )
        deduped = dedup_by_key(valid, pk, [F.asc(c) for c in pk]).observe(
            obs, F.count(F.lit(1)).alias("rows")
        )
        st = LakeTable(spark, os.path.join(root, "silver", name))
        st.merge(deduped, keys=pk)
        tables[f"silver.{name}"] = st
        metrics[name] = {"silver_rows": obs.get["rows"]}
        if alert_policy is not None:
            all_alerts.extend(
                processing_delay_alert(time.time() - t0, alert_policy, name)
            )

    # ---- gold marts from silver (E:420-450 daily_sales shape)
    so = tables["silver.orders"].read()
    sl = tables["silver.lineitem"].read()
    daily = (
        sl.join(so.select("o_orderkey", "o_orderdate"), sl.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.countDistinct("l_orderkey").alias("order_count"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_sales"),
            F.sum("l_quantity").alias("total_items"),
        )
        .withColumn("last_updated", F.current_timestamp())
    )
    gt = LakeTable(spark, os.path.join(root, "gold", "daily_sales"))
    gt.overwrite(daily)
    tables["gold.daily_sales"] = gt
    if alert_policy is not None:
        # reference "Metric Discrepancy": recompute the headline metric
        # from silver and compare against the WRITTEN gold table (re-read)
        # — catches storage-layer drift in-flight checks can't see
        expected = (
            sl.join(so.select("o_orderkey"), sl.l_orderkey == F.col("o_orderkey"))
            .agg(
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("s")
            )
            .first()["s"]
            or 0.0
        )
        actual = (
            gt.read().agg(F.sum("total_sales").alias("s")).first()["s"] or 0.0
        )
        all_alerts.extend(
            metric_discrepancy_alert(
                expected, actual, alert_policy, "gold.daily_sales", "total_sales"
            )
        )

    # ---- post-pipeline SQL smoke phase (reference stepfunctions/
    # delta-lake.json:147-215: three parallel Athena `SELECT * ... LIMIT 5`
    # checks over the clean tables; here spark.sql over catalog views).
    # A table that registered but can't serve 5 rows fails the run — the
    # same contract as the Step Function's Catch → HandleValidationFailure.
    metrics["smoke"] = run_smoke_queries(
        spark,
        {
            "clean_orders": tables["silver.orders"],
            "clean_order_items": tables["silver.lineitem"],
            "clean_products": tables["silver.part"],
        },
    )

    if all_alerts:
        # non-blocking alerts (high/medium) are recorded, never fatal
        _record_alerts(spark, root, all_alerts, tables)
    tables["metrics"] = metrics
    return tables


def run_smoke_queries(spark: SparkSession, views: dict[str, LakeTable]) -> dict[str, int]:
    """Register each LakeTable under its view name and run
    ``SELECT * FROM <view> LIMIT 5``, returning rows served per view.
    Raises if any smoke query errors (propagated) — mirroring the
    reference's validation-failure branch."""
    served: dict[str, int] = {}
    for view, lt in views.items():
        lt.register(view)
        served[view] = len(spark.sql(f"SELECT * FROM {view} LIMIT 5").collect())
    return served
