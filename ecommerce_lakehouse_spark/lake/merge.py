"""Logical MERGE semantics (reference src/glue_etl.py:442-458: Delta
``whenMatchedUpdateAll().whenNotMatchedInsertAll()``).

delta-spark is not available in this environment, so MERGE is expressed as
pure DataFrame algebra — updates win on matched keys, unmatched target rows
pass through. ``LakeTable`` (lake/table.py) supplies the storage side
(copy-on-write parquet + manifest versioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """``MERGE INTO target USING updates ON keys WHEN MATCHED UPDATE ALL
    WHEN NOT MATCHED INSERT ALL`` as: updates ∪ (target ⟕anti updates).

    Precondition (same as Delta's): ``updates`` must be unique per key —
    dedup upstream (reference relies on this implicitly: dedup G:404 always
    precedes merge G:452; SURVEY §7.5).

    Scale note: one shuffle on the merge keys for the anti-join; with both
    sides bucketed/pre-partitioned by key it is co-partitioned. The
    anti-join side prunes to key columns only (column pruning keeps the
    shuffle narrow).
    """
    untouched = target.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(untouched)
