"""SparkSession factory with the engine's standard configuration.

Mirrors the reference's session setup (reference src/glue_etl.py:529-539:
AQE + partition coalescing + skew-join + CBO) minus the Glue/AWS parts.
Timezone is pinned to UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ecommerce-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    Defaults target the driver harness: ``local[$SPARK_GRAFT_CPUS]`` with
    32 shuffle partitions.  At cluster scale the same builder applies —
    only master/shuffle-partitions change (AQE coalesces the rest).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Reference parity: src/glue_etl.py:535-539
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts testdata has shipped as parquet TIMESTAMP(NANOS), which
        # Spark 4 only reads with this legacy conf (tables.read_events_raw
        # also sets it lazily for vanilla caller sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas-UDF path (LLM-pipeline operators)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
        )
        # AQE coalescing floor / scan open cost (r10 opt, guide §1.2-3):
        # r09 set these session-global to 16k / 64k; the r10 registry-wide
        # interleaved cold A/B (r10/ab_confs/, OPTIMIZATION_r10.md) showed
        # that outside the dedup/LSH family the raised task counts COST
        # more than they win (21.6 s of losses vs 13.9 s of wins at
        # sf0.1, the r09 driver-bench regression). The session baseline is
        # therefore the Spark DEFAULT for both (still env-parameterised
        # for cluster tuning), and the dedup/LSH-family queries pin the
        # one conf that drives their win (minPartitionSize=16k — the
        # openCost change added nothing even for them, per the isolated
        # arm-C/D runs) per-query via queries.TINY_STAGE_CONFS.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "4m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
