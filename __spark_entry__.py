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
# Rotation history: r02 gated the relational/gold core, r03 the lakehouse
# DML + dedup families, r04 the TPC-H tail + round-4 features (each
# round's _FIRST held only names never gated before, plus a few anchors).
#
# NEXT ROTATION (r06): the 31 queries added after this window was frozen
# have never been driver-gated — ks_two_sample, spearman_rank_corr,
# kendall_tau_b, revenue_trend_ols, holt_linear_forecast, mann_whitney_u,
# revenue_theil_sen, forecast_backtest_mae, conformal_forecast_interval,
# seasonal_decompose_monthly, cuped_adjusted_lift, did_revenue_effect,
# event_overdispersion, psi_value_drift, adamic_adar_links,
# label_propagation_communities, copurchase_degree_profile,
# matryoshka_prefix_recall, label_centroid_similarity, ann_ndcg_eval,
# lsh_multiprobe_recall, best_split_infogain, token_zipf_fit,
# hhi_revenue_concentration, pareto_customer_skyline,
# segment_migration_matrix, cohort_ltv_curve, customer_feature_matrix,
# profile_constraint_suggestions, restore_table_snapshot,
# dsir_effective_sample_size — they are the r06 window core (31 + up to
# 19 anchors/representatives = one 50-slot window).
_FIRST = [
    # Round-5 rotation (VERDICT r04 item #1): ALL 44 queries the driver has
    # never gated (union of CORRECTNESS_r01-r04 covers the other 143) enter
    # the window, plus 6 regression anchors spanning the family axes:
    # flagship mart, curation DAG, gold rollup, lakehouse MERGE, LSH dedup,
    # media decode. A green CORRECTNESS_r05 means every registry query has
    # a driver-gated row in some round.
    # anchors
    "daily_sales",
    "corpus_curation_pipeline",
    "product_performance",
    "ogg_stream_features",  # r5: new — RFC 3533 page walk w/ real CRCs
    # (merge_upsert_snapshot rotated out: gated r03; the storage family
    # stays covered by the four never-gated *_snapshot entries below)
    "semantic_cluster_dups",  # r5: new — SemDeDup k-means semantic dedup
    # (takes the dedup-anchor slot: minhash_lsh_pairs was gated r02/r03)
    "mp3_stream_features",  # r5: new — MPEG-1 Layer III header walk
    # (takes the media-anchor slot: jpeg_decode_features was gated r04)
    # never-gated tail (stats / sketches / graph / retrieval / storage)
    "ab_test_lift",
    "basket_association_rules",
    "benford_first_digit",
    "bfs_hops_copurchase",
    "bloom_skipping_snapshot",
    "bm25_search",
    "bootstrap_mean_ci",
    "bpe_encode_stats",
    "bpe_merge_steps",
    "cms_heavy_hitters",
    "column_entropy_profile",
    "contrastive_negatives",
    "convert_parquet_snapshot",
    "customer_spend_gini",
    "customer_survival_km",
    "dsir_gumbel_resample",
    "embedding_quantize_int8",
    "event_interarrival_stats",
    "event_transition_matrix",
    "exp_smoothing_revenue",
    "gopher_quality_flags",
    "hll_distinct_sketch",
    "identity_snapshot",
    "kmv_distinct_sketch",
    "lsh_recall_eval",
    "orders_seasonality",
    "pagerank_copurchase",
    "pq_encode_eval",
    "priority_status_independence",
    "rename_column_snapshot",
    "revenue_autocorrelation",
    "revenue_cusum_changepoint",
    "rrf_hybrid_search",
    "sax_series_profile",
    "shingle_similarity_join",
    "source_kl_divergence",
    "source_overlap_kmv",
    "sq8_recall_eval",
    "sssp_copurchase",
    "triangle_copurchase",
    "trigram_backoff_scores",
    "trigram_index_search",
    "value_mad_outliers",
    "value_trimmed_mean",
]


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _FIRST if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
