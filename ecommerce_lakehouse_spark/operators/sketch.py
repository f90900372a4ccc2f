"""Mergeable quantile sketch (the KLL-family member of the sketch shelf,
next to KMV distinct-count, HLL and CMS frequency in queries/llm6-8).

Design: a LEVEL sketch — every item carries a 60-bit md5 hash; the sketch
at level L keeps exactly the items whose hash clears ``2^60 >> L`` (an
expected ``n / 2^L`` survivors, each standing for ``2^L`` input rows), with
L chosen as the smallest level that bounds the expected size by the
capacity k. This is KLL's geometric level structure (Karnin, Lang,
Liberty 2016) with one deliberate change: the per-compaction coin flips
are replaced by each item's OWN hash bits, which makes the sketch
history-independent — the state is a pure function of the input multiset,
never of arrival order or partition boundaries.

History independence is what buys the strong mergeability contract this
repo tests: ``merge(sketch(P1), ..., sketch(Pm))`` is BIT-IDENTICAL to
``sketch(P1 ∪ ... ∪ Pm)``, because survival is monotone in L (an item kept
at the merged level was kept at every per-partition level) — so merging is
"recompute L from the summed n, re-filter, re-sort", no re-randomization.
True stream-KLL's stacked compactors cannot promise bit-equality under
re-partitioning, only distributional error; a 100 TB pipeline that
checkpoints and merges per-partition state wants the literal-equality
form (the same reason the CMS cells in streaming/jobs.py fold by pure
addition). The price is a single compactor level — rank error
O(1/sqrt(k)) instead of KLL's O(log^1.5 / k) — which the registered query
``kll_quantile_sketch`` reports per quantile rather than asserting.

Everything is exact integer state: values enter as BIGINT (cents, micros —
caller's choice), hashes are the md5 60-bit prefix (the only hash both
Spark and DuckDB compute identically, per kmv_distinct_sketch), levels and
thresholds are integer shifts. No float exists until the caller divides
the answer back into units.

Reference parity: the reference has no sketch layer at all (its profiling
is exact pandas aggregation, src/processing/gold_layer.py) — this family
is the 100 TB extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: hashes are uniform in [0, 2^60): the 15-hex-char md5 prefix both
#: engines agree on (conv/CAST('0x'||...) — see kmv_distinct_sketch)
HASH_SPACE = 1 << 60
MAX_LEVEL = 40


def md5_hash60(col) -> F.Column:
    """The portable 60-bit hash: md5 hex prefix as BIGINT, identical in
    Spark (conv) and DuckDB (CAST('0x'||... AS BIGINT))."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def kll_level_sketch(
    df: DataFrame,
    value_col: str,
    hash_col: str,
    k: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the sketch as a grouped aggregate.

    Input: one row per item with an integer ``value_col`` and a unique
    ``hash_col`` uniform in [0, 2^60). Output: one row per group with
    ``n`` (exact item count — carried state, needed to pick the merge
    level), ``level`` (INT), and ``items`` — the sorted
    array<struct<v,h>> of surviving items (expected size in
    (k/2, k], each representing 2^level input rows).

    Plan shape: the count is a partial-agg groupBy; level selection is a
    41-row broadcast join; the survivor filter is MAP-SIDE (each row
    tests its own hash against the group threshold); the final
    collect_list is a bounded O(k)-row-per-group aggregate. No global
    sort, no window, no driver round-trip — the sketch state IS the
    aggregate value, which is what makes it checkpointable and
    streamable."""
    g = list(group_cols or [])
    spark = df.sparkSession
    tot = df.groupBy(*g).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lvls = spark.range(0, MAX_LEVEL + 1).select(
        F.col("id").cast("int").alias("__l")
    )
    lvl = (
        tot.join(
            F.broadcast(lvls),
            F.expr(f"shiftleft(CAST({int(k)} AS BIGINT), __l)") >= F.col("n"),
        )
        .groupBy(*g, "n")
        .agg(F.min("__l").alias("level"))
    )
    thr = lvl.withColumn(
        "__thr",
        F.expr(
            f"CAST({HASH_SPACE} AS BIGINT)"
            " DIV shiftleft(CAST(1 AS BIGINT), level)"
        ),
    )
    joined = (
        df.join(F.broadcast(thr), on=g) if g else df.crossJoin(F.broadcast(thr))
    )
    # Survivor selection happens INSIDE the aggregate (collect_list skips
    # the NULLs the when() emits for non-survivors) rather than as a
    # pre-filter: a group whose survivors all miss the threshold (real at
    # small k: P = (1-2^-L)^n) must still emit its (n, level, []) row —
    # dropping it would lose that partition's n in a merge and break the
    # union==whole contract (caught by the hypothesis partition-invariance
    # law, tests/test_properties.py).
    return joined.groupBy(*g, "n", "level").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col(hash_col) < F.col("__thr"),
                    F.struct(
                        F.col(value_col).cast("long").alias("v"),
                        F.col(hash_col).cast("long").alias("h"),
                    ),
                )
            )
        ).alias("items")
    )


def kll_merge_grouped(
    sketches: DataFrame, group_cols: list[str], k: int = 1024
) -> DataFrame:
    """Per-GROUP form of :func:`kll_merge`: merge sketch rows
    (group..., n, level, items) into one sketch row per group. Same
    bit-identity contract, per key: recompute each group's level from
    its summed n, re-filter the concatenated items by the merged
    threshold (survival is monotone in level), re-sort — equal to
    building one sketch over that group's full input. Groups whose
    survivors all miss the merged threshold keep an (n, level, [])
    row (the empty-group contract shared with the build side).

    Scale: every stage keys by the group — O(k) state per group, the
    property that lets millions of tenant sketches fold in one shuffle
    (this is the streaming state shape stream_grouped_quantiles
    commits per micro-batch)."""
    g = list(group_cols)
    spark = sketches.sparkSession
    tot = sketches.groupBy(*g).agg(F.sum("n").cast("long").alias("n"))
    lvls = spark.range(0, MAX_LEVEL + 1).select(
        F.col("id").cast("int").alias("__l")
    )
    lvl = (
        tot.join(
            F.broadcast(lvls),
            F.expr(f"shiftleft(CAST({int(k)} AS BIGINT), __l)") >= F.col("n"),
        )
        .groupBy(*g, "n")
        .agg(F.min("__l").alias("level"))
    )
    thr = lvl.withColumn(
        "__thr",
        F.expr(
            f"CAST({HASH_SPACE} AS BIGINT)"
            " DIV shiftleft(CAST(1 AS BIGINT), level)"
        ),
    )
    items = sketches.select(*g, F.explode("items").alias("it")).select(
        *g, F.col("it.v").alias("v"), F.col("it.h").alias("h")
    )
    # no broadcast hint on thr: it carries one row per GROUP, and the
    # millions-of-tenants contract above means it can exceed the
    # broadcast limit — AQE picks broadcast at small group counts and
    # a key-partitioned join at scale (both sides already shuffle on g).
    kept = items.join(thr, on=g).filter(F.col("h") < F.col("__thr"))
    items_rows = kept.groupBy(*g).agg(
        F.sort_array(F.collect_list(F.struct(F.col("v"), F.col("h")))).alias(
            "__items"
        )
    )
    return (
        thr.select(*g, "n", "level")
        .join(items_rows, on=g, how="left")
        .select(
            *g,
            "n",
            "level",
            F.coalesce(
                F.col("__items"),
                F.expr(
                    "CAST(array() AS array<struct<v: bigint, h: bigint>>)"
                ),
            ).alias("items"),
        )
    )


def kll_merge(sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Merge sketch rows (n, level, items) into ONE sketch row.

    Recompute the level from the summed n, re-filter the concatenated
    items by the (tighter) merged threshold, re-sort. Because survival
    is monotone in level, the result is bit-identical to building the
    sketch over the union of the original inputs (tested:
    tests/test_llm10.py::test_kll_sketch_mergeable)."""
    spark = sketches.sparkSession
    tot = sketches.agg(F.sum("n").cast("long").alias("n"))
    lvls = spark.range(0, MAX_LEVEL + 1).select(
        F.col("id").cast("int").alias("__l")
    )
    lvl = (
        tot.join(
            F.broadcast(lvls),
            F.expr(f"shiftleft(CAST({int(k)} AS BIGINT), __l)") >= F.col("n"),
        )
        .groupBy("n")
        .agg(F.min("__l").alias("level"))
    )
    thr = lvl.withColumn(
        "__thr",
        F.expr(
            f"CAST({HASH_SPACE} AS BIGINT)"
            " DIV shiftleft(CAST(1 AS BIGINT), level)"
        ),
    )
    items = sketches.select(F.explode("items").alias("it")).select(
        F.col("it.v").alias("v"), F.col("it.h").alias("h")
    )
    kept = items.crossJoin(F.broadcast(thr)).filter(F.col("h") < F.col("__thr"))
    # global agg (1 row even over zero survivors) + crossJoin back to the
    # (n, level) row: the merged sketch must exist with empty items when
    # no item clears the merged threshold — mirroring the build side's
    # empty-group fix. Merging an EMPTY sketch set stays empty (sum(n)
    # over nothing is NULL, which the level join rejects).
    items_row = kept.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("v"), F.col("h")))
        ).alias("items")
    )
    return thr.select("n", "level").crossJoin(F.broadcast(items_row))
