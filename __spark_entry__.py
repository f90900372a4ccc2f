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
# ROTATION r06 (VERDICT r05 item #1): ALL 35 queries the driver has never
# gated — computed as registry − union(CORRECTNESS_r01..r05), NOT from a
# hand-maintained list (the r05 comment here undercounted by 4) — enter
# the window, plus this round's new operators (themselves never-gated).
# A green CORRECTNESS_r06 means every registry query except the twelve in
# _NEXT has a driver-gated row in some round r01-r06.
#
# The window is exactly 50 slots and round-6 added 27 new queries on top
# of the 35 carryovers (62 never-gated names), so the four already-gated
# anchors yield their slots to four of the wave-3 mining queries; the
# twelve deferred ones (_NEXT below — each with an already-gated family
# twin and full pytest + 3-SF local-oracle coverage) lead the
# post-window order so the r07 rotation picks them first. Regression
# anchoring this round comes from the bench profile (all queries) + the
# 1300+-test suite.
_FIRST = [
    # wave-3 mining (4 of 6; see deferral note above)
    "pmi_collocations",
    "kcore_peeling_profile",
    "ar2_yule_walker_forecast",
    "readability_profile",
    # new in r06 (11)
    "kll_quantile_sketch",
    "quality_classifier_scores",
    "ivf_pq_search_recall",
    "scd2_asof_lookup",
    "croston_demand_forecast",
    "shingle_containment_pairs",
    "pq_trained_codebook_eval",
    "order_open_interval_concurrency",
    "classifier_calibration_curve",
    "grouped_quantile_sketch",
    "daily_revenue_spike_flags",
    # never-gated tail (35 = registry − union of CORRECTNESS_r01..r05)
    "abc_part_classification",
    "adamic_adar_links",
    "ann_ndcg_eval",
    "best_split_infogain",
    "cohort_ltv_curve",
    "conformal_forecast_interval",
    "copurchase_degree_profile",
    "cuped_adjusted_lift",
    "customer_feature_matrix",
    "did_revenue_effect",
    "dsir_effective_sample_size",
    "event_overdispersion",
    "forecast_backtest_mae",
    "hhi_revenue_concentration",
    "holt_linear_forecast",
    "kendall_tau_b",
    "ks_two_sample",
    "label_centroid_similarity",
    "label_propagation_communities",
    "lsh_multiprobe_recall",
    "mann_kendall_trend",
    "mann_whitney_u",
    "matryoshka_prefix_recall",
    "pareto_customer_skyline",
    "part_demand_intermittency",
    "profile_constraint_suggestions",
    "psi_value_drift",
    "restore_table_snapshot",
    "revenue_runs_test",
    "revenue_theil_sen",
    "revenue_trend_ols",
    "seasonal_decompose_monthly",
    "segment_migration_matrix",
    "spearman_rank_corr",
    "token_zipf_fit",
]


# Deferred never-gated queries lead the post-window tail (r07 rotation
# picks them first; see the _FIRST comment).
_NEXT = [
    "simhash_hamming_pairs",
    "random_projection_distortion",
    "dbscan_customer_segments",
    "markov_prediction_accuracy",
    "frequent_triple_itemsets",
    "isotonic_calibration",
    "binary_segmentation_changepoints",
    "quantile_treatment_effects",
    "haar_wavelet_energy",
    "event_path_trigrams",
    "vocab_chao1_estimate",
    "hurst_rs_exponent",
]


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _FIRST + _NEXT if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
