"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``ecommerce_lakehouse_spark`` package; queries
self-register into its REGISTRY/ORACLES on import.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ecommerce_lakehouse_spark.queries import ORACLES, REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2 daily-sales slice) on sf0.001."""
    return REGISTRY["daily_sales"](spark, "/root/testdata/sf0.001")


# Curated ordering: external verification may only cover a prefix of the
# registry, so the first 50 entries carry at least one representative of
# every SURVEY §2 operator family (gold marts, lakehouse MERGE, streaming
# windows, as-of, JSON, validation, filters, scalar functions, windows,
# ordering, all four join types, set ops, grouping sets, pivot/unpivot,
# stats, TPC-H, LLM dedup/ANN/text) — remaining entries follow in their
# registration order.
#
# Round-3 rotation (verdict item #7): 27 of the 50 slots now hold queries
# the driver has never gated (r02 window passed 50/50; those proven names
# rotate out for per-family stand-ins so CORRECTNESS_r03 adjudicates
# fresh ground), plus this round's new/changed operators
# (corpus_curation_pipeline, collapse-first embedding_cosine_dups + its
# _expanded twin, multiplicity-carrying minhash_lsh_pairs,
# fuzzy_pairs_blocked, png_decode_features) and the wave-5 span-dedup /
# mixing / TF-IDF operators (queries/llm5.py).
_FIRST = [
    "daily_sales",
    "customer_insights",
    "merge_upsert_snapshot",
    "tumbling_window_agg",
    "asof_join_enrich",
    "json_props_agg",
    "validation_split_rejected",
    "cdc_change_feed",  # r3: Change Data Feed over real storage commits
    "mulaw_audio_features",
    "apply_mixture_sample",
    "mjpeg_video_frames",
    "image_dedup_features",
    "temperature_mixture_weights",
    "tfidf_top_terms",
    "split_contamination_audit",
    "span_dedup_spans",
    "span_dedup_rewrite",
    "span_dedup_clean",
    "span_dup_rate",
    "tpch_q1_pricing_summary",
    "exact_dedup",
    "minhash_lsh_pairs",
    "text_quality_stats",
    "corpus_curation_pipeline",
    "embedding_cosine_dups",
    "embedding_cosine_dups_expanded",
    "fuzzy_pairs_blocked",
    "png_decode_features",
    "image_resize_pipeline",
    "neardup_clusters",
    "normalized_dedup_groups",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "embedding_knn_bruteforce",
    "embedding_lsh_ann",
    "embedding_ivf_ann",
    "ann_recall_eval",
    "lang_id_heuristic",
    "repetition_profile",
    "pii_scan",
    "ngram_contamination",
    "hash_sample_stratified",
    "train_val_test_split",
    "jpeg_progressive_features",
    "gif_decode_features",
    "exact_moment_corr",
    "cohort_retention",
    "rolling_7day_revenue",
    "status_mix_by_nation",
    "tpch_q9_product_profit",
]


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _FIRST if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
