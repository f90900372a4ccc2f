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
# round's _FIRST held only names never gated before, plus a few
# anchors); r06 gated the 35-name never-gated backlog + 15 round-6
# additions, deferring twelve late-round queries to r07.
#
# ROTATION r07 (VERDICT r06 item #1): the twelve round-6 queries the
# driver never sampled lead the window so CORRECTNESS_r07 proves them;
# four already-gated cross-family anchors (gold mart, lakehouse MERGE,
# streaming-twin window agg, MinHash-LSH dedup) guard against
# regressions in the families every other query composes with. New
# round-7 queries are appended to _FIRST as they land (themselves
# never-gated). After a green r07, every registry query has a
# driver-gated row in some round r01-r07.
_FIRST = [
    # ROTATION r09: the window leads with the queries whose
    # IMPLEMENTATIONS changed in round 9 — the Apriori-pruned
    # collapse-first co-purchase edge build and pagerank's unification
    # onto it (all eight graph consumers re-gate), the collapse-first
    # span candidate/rate rewrites, the BPE private-clone conf
    # isolation, the curation txn-less crash-resume watermark, and the
    # mixture-shift pruned-upsert streaming twin — then recent-round
    # queries with high regression value, then the four cross-family
    # anchors. EXACTLY 50 names (the driver samples 50; the r08 list
    # held 51 and silently dropped its last anchor —
    # tests/test_oracle_parity.py now pins the cap and bans
    # cross-list duplicates).
    # r09-OPTIMIZATION changes first: the split-aggregate constraint
    # profiler and the by-value band-profile collapse (results
    # bit-identical; plans reshaped, so they re-gate first), then the
    # Lloyd-loop queries rebuilt on the driver-literal kmeans operator
    "profile_constraint_suggestions",
    "band_skew_profile",
    "semantic_cluster_dups",
    "pq_trained_codebook_eval",
    "pagerank_copurchase",
    "triangle_copurchase",
    "adamic_adar_links",
    "common_neighbors_jaccard",
    "kcore_peeling_profile",
    "clustering_coefficient_profile",
    "label_propagation_communities",
    "copurchase_degree_profile",
    "span_dedup_spans",
    "span_dup_rate",
    "span_dedup_clean",
    "span_dedup_rewrite",
    "bpe_merge_steps",
    "bpe_encode_stats",
    "corpus_curation_pipeline",
    "dedup_mixture_shift",
    "ann_recall_eval",
    "ann_ndcg_eval",
    # r08 rotation below (kept: recent code, high regression value)
    "mv_incremental_refresh",
    "grouped_quantile_sketch",
    "kll_quantile_sketch",
    "holt_winters_seasonal",
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
    "hurst_rs_exponent",
    "mmr_diversified_topk",
    "embedding_pca_power",
    "pacf_durbin_levinson",
    "page_hinkley_drift",
    "propensity_strata_ate",
    "heaps_law_fit",
    "k_anonymity_audit",
    "semantic_contamination_audit",
    "prefix_share_profile",
    # cross-family regression anchors (gated green every round since r02)
    "daily_sales",
    "merge_upsert_snapshot",
    "tumbling_window_agg",
    "minhash_lsh_pairs",
]


# Post-window order: recent rounds first (freshest code = highest
# regression value), then everything else in registration order.
# Disjoint from _FIRST by test (duplicates collapse silently in the
# ordered-dict build, wasting window slots).
_NEXT = [
    # displaced from _FIRST by the r09-optimization leads (both gated
    # green in r08; unchanged since)
    "discount_uplift_profile",
    "safety_stock_plan",
    "duplication_spectrum",
    "quality_rater_agreement",
    "knn_label_precision",
    "brier_decomposition",
    "source_quality_independence",
    "pmi_collocations",
    "ar2_yule_walker_forecast",
    "readability_profile",
    "quality_classifier_scores",
    "ivf_pq_search_recall",
    "scd2_asof_lookup",
    "croston_demand_forecast",
    "shingle_containment_pairs",
    "order_open_interval_concurrency",
    "classifier_calibration_curve",
    "daily_revenue_spike_flags",
]


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _FIRST + _NEXT if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
