"""Training-data export sinks: deterministic hash-sharded corpus writes.

The last stage of a curation pipeline is exporting the corpus as a stable
set of shards that trainers stream independently. Two properties matter at
100 TB and both are easy to get wrong:

- **Deterministic shard assignment**: shard = pmod(xxhash64(key), n) — a
  pure function of the row key, never round-robin or partition index, so
  re-running the export (or re-running it on a different cluster layout)
  produces byte-compatible shard membership, and downstream loaders can
  re-read a fixed shard subset for reproducible data ordering.
- **One file per shard**: trainers address shards as units; Spark's
  ``partitionBy`` writes a directory per shard and repartitioning by the
  shard column first keeps it to one file each without a global sort.

JSONL is the interchange format LLM pipelines expect; parquet is the
lake-internal format. Both share the same sharding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Deterministic shard id from the row key (stable across runs,
    engines, and cluster layouts — xxhash64 is a pinned algorithm)."""
    return df.withColumn("shard", F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)))


def write_sharded(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 16,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Export ``df`` as ``shard=N`` directories, one file per shard.

    repartition on the shard column co-locates each shard before the
    write (one shuffle, no global sort); partitionBy emits the hive
    layout so any reader can prune to a shard subset."""
    sharded = with_shard(df, key, n_shards).repartition(n_shards, "shard")
    writer = sharded.write.mode(mode).partitionBy("shard")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "jsonl":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def read_shards(spark, path: str, shards: list[int] | None = None, fmt: str = "parquet") -> DataFrame:
    """Read an exported corpus, optionally pruned to a shard subset
    (partition pruning — only the named shard dirs are listed/scanned)."""
    reader = spark.read
    df = reader.parquet(path) if fmt == "parquet" else reader.json(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
