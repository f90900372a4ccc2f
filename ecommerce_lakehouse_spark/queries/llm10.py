"""LLM training-data pipeline, phase 10 (round 6): the three operators the
r05 verdict named as the highest-value residual gaps —

- ``kll_quantile_sketch``: the quantile member of the sketch shelf
  (KMV distinct / HLL / CMS frequency already exist), built on the
  history-independent KLL-family level sketch in operators/sketch.py and
  reporting its own rank error at three quantiles;
- ``quality_classifier_scores``: the learned (CCNet/fastText-shape)
  quality filter — a hashed-n-gram Naive-Bayes linear scorer trained as a
  query on the corpus's own hash split, weights as exact-integer nanos,
  audited as a held-out confusion matrix;
- ``ivf_pq_search_recall``: IVF cells (embedding_ivf_ann) composed with
  PQ codebooks (pq_encode_eval) into asymmetric-distance-computation
  search — the billion-vector serving shape — with recall@5 against the
  exact top-k and the candidate count reported (no silent cap).

Reference parity: none of these exist in the reference (its Python
surface is Glue ETL over business keys, src/processing/*.py); they are
the training-data-pipeline extensions the engine adds as first-class,
oracle-checked components.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.operators.sketch import (
    kll_level_sketch,
    md5_hash60,
)
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

# ---------------------------------------------------------------------------
# KLL-family quantile sketch with rank-error audit
# ---------------------------------------------------------------------------

_KLL_K = 1024
_KLL_QS = [0.5, 0.9, 0.99]


@query(
    "kll_quantile_sketch",
    oracle=f"""
WITH src AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM src),
lvl AS (
  SELECT n_total, CAST(min(l) AS INT) AS level
  FROM tot, (SELECT unnest(range(0, 41)) AS l)
  WHERE {_KLL_K} * (CAST(1 AS BIGINT) << l) >= n_total
  GROUP BY n_total),
thr AS (
  SELECT n_total, level,
         1152921504606846976 // (CAST(1 AS BIGINT) << level) AS threshold
  FROM lvl),
kept AS (SELECT cents, h FROM src, thr WHERE h < threshold),
sk AS (
  SELECT list_sort(list(struct_pack(v := cents, h := h))) AS items,
         CAST(count(*) AS BIGINT) AS m_kept
  FROM kept),
qs AS (SELECT unnest([{", ".join(str(q) for q in _KLL_QS)}]) AS q),
est AS (
  SELECT q, m_kept,
         items[CAST(ceil(q * m_kept) AS BIGINT)].v AS est_cents
  FROM qs, sk)
SELECT e.q,
       t.n_total,
       t.level,
       e.m_kept,
       CAST(e.est_cents AS DOUBLE) / 100.0 AS est_value,
       CAST(sum(CASE WHEN s.cents <= e.est_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS count_le,
       round(abs(sum(CASE WHEN s.cents <= e.est_cents THEN 1 ELSE 0 END)
                 / CAST(t.n_total AS DOUBLE) - e.q), 9) AS rank_err
FROM src s CROSS JOIN est e CROSS JOIN thr t
GROUP BY e.q, t.n_total, t.level, e.m_kept, e.est_cents
""",
)
def kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch with its own accuracy audit (the pattern
    of kmv_distinct_sketch): build the KLL-family level sketch
    (operators/sketch.py — geometric levels, survival decided by each
    item's md5 bits so both engines, any partitioning, and any merge
    order produce the SAME state) over the events value column in exact
    cents, answer q in {0.5, 0.9, 0.99} from the sketch, then report the
    estimate's TRUE rank error against the full data — the number a
    100 TB profiling pass publishes instead of a silent approximation.

    Quantile answering: the sketch's survivors are equal-weight
    (2^level rows each), so the q-quantile estimate is simply the
    survivor at rank ceil(q·m) of the sorted O(k) item array — an
    element_at on the aggregate value, no window, no second pass. The
    audit rank (count of rows <= estimate) is one conditional aggregate
    over the source.

    Exactness: values are 2dp-quantized event values carried as BIGINT
    cents (llm8 idiom); hashes/levels/thresholds are integer; the only
    doubles are ceil(q·m) (identical IEEE multiply both engines) and the
    final unit/error renders (exact-integer divisions).

    Scale: count + map-side filter + O(k) collect — the sketch never
    shuffles more than k items; the audit pass is a broadcast of 3
    estimate rows against the scan. Mergeability (union of
    per-partition sketches ≡ whole-data sketch, bit-identical) is the
    operator contract, tested in tests/test_llm10.py."""
    src = load(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        md5_hash60(F.col("event_id")).alias("h"),
    )
    sk = kll_level_sketch(src, "cents", "h", k=_KLL_K)
    # one row: (n, level, items); m_kept = size(items)
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _KLL_QS])).alias("q")
    )
    est = qs.crossJoin(F.broadcast(sk)).select(
        "q",
        F.col("n").alias("n_total"),
        "level",
        F.size("items").cast("long").alias("m_kept"),
        F.expr(
            "element_at(items, CAST(ceil(q * size(items)) AS INT)).v"
        ).alias("est_cents"),
    )
    return (
        src.crossJoin(F.broadcast(est))
        .groupBy("q", "n_total", "level", "m_kept", "est_cents")
        .agg(
            F.sum(F.when(F.col("cents") <= F.col("est_cents"), 1).otherwise(0))
            .cast("long")
            .alias("count_le")
        )
        .select(
            "q",
            "n_total",
            "level",
            "m_kept",
            (F.col("est_cents").cast("double") / F.lit(100.0)).alias("est_value"),
            "count_le",
            F.round(
                F.abs(
                    F.col("count_le") / F.col("n_total").cast("double")
                    - F.col("q")
                ),
                9,
            ).alias("rank_err"),
        )
    )
