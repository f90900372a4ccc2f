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
        # AQE coalescing floor (r09 opt, guide §2.4): the default 1 MB
        # minPartitionSize collapses compute-heavy-but-byte-tiny shuffle
        # outputs (minhash/shingle/embedding HOF stages after an exact
        # collapse: ~1 MB of text fanning into seconds of per-row array
        # math) onto a SINGLE task. parallelismFirst (default true)
        # already targets cluster parallelism; lowering the floor lets it
        # act on these stages. Scale-safe: the floor only binds when a
        # stage's total shuffle bytes are tiny — large stages coalesce by
        # advisory size exactly as before, so cluster behavior at real
        # data sizes is unchanged. Parameterised for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "16k"),
        )
        # Scan-split open cost (r09 opt, guide §6): Spark sizes file
        # splits at min(maxPartitionBytes, max(openCostInBytes,
        # bytes/defaultParallelism)); the 4 MB default open cost forces
        # MB-scale tables into 1-3 splits, serializing scan-side compute
        # (tokenization/HOF filters run before the first exchange). At
        # production volumes bytes/defaultParallelism >> any open cost,
        # so this only binds where it should: small inputs whose
        # scan-side work deserves the cluster. Parameterised for
        # clusters with genuinely expensive file opens (cold object
        # stores).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "64k"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
