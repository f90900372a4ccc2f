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
    # ROTATION r10 (optimization round 2): the window leads with the
    # queries whose EXECUTION changed this round — the in-row
    # fold/lazy-barrier graph family (all consumers of the rebuilt
    # _support_graph + bfs/sssp's lazy round chains), the BPE loop
    # codegen/stack-cap change, the curation + LakeTable read-cache
    # consumers (the whole DML snapshot family reads through the new
    # version-keyed plan cache) — then the 15 conf-pinned dedup/LSH
    # queries (results and plans unchanged; execution-shape change
    # only), then the NINE names VERDICT r09 #7 ordered re-gated (they
    # left the 50-query window in r09's rotation; all were green in
    # r08), then the cross-family anchors. EXACTLY 50 names
    # (tests/test_oracle_parity.py pins the cap and bans cross-list
    # duplicates).
    "label_propagation_communities",
    "pagerank_copurchase",
    "kcore_peeling_profile",
    "clustering_coefficient_profile",
    "common_neighbors_jaccard",
    "adamic_adar_links",
    "triangle_copurchase",
    "copurchase_degree_profile",
    "bfs_hops_copurchase",
    "sssp_copurchase",
    "bpe_merge_steps",
    "bpe_encode_stats",
    "corpus_curation_pipeline",
    "scd2_apply_snapshot",
    "scd2_asof_lookup",
    "cdc_apply_snapshot",
    "cdc_change_feed",
    "mv_incremental_refresh",
    "restore_table_snapshot",
    "identity_snapshot",
    "bloom_skipping_snapshot",
    "merge_upsert_snapshot",
    "zorder_skipping_snapshot",
    "convert_parquet_snapshot",
    # conf-pinned dedup/LSH family (TINY_STAGE_CONFS)
    "minhash_lsh_pairs",
    "lsh_recall_eval",
    "semantic_cluster_dups",
    "embedding_cosine_dups",
    "embedding_cosine_dups_expanded",
    "shingle_similarity_join",
    "neardup_clusters",
    "band_skew_profile",
    "shingle_containment_pairs",
    "simhash_hamming_pairs",
    "span_dedup_spans",
    "span_dedup_clean",
    "contrastive_negatives",
    "part_cooccurrence",
    "heaps_law_fit",
    # VERDICT r09 #7: the nine names rotated out of the r09 window
    "brier_decomposition",
    "discount_uplift_profile",
    "duplication_spectrum",
    "knn_label_precision",
    "quality_rater_agreement",
    "revenue_periodogram",
    "safety_stock_plan",
    "source_quality_independence",
    "vocab_chao1_estimate",
    # cross-family regression anchors (gated green every round since r02)
    "daily_sales",
    "tumbling_window_agg",
]


# Post-window order: recent rounds first (freshest code = highest
# regression value), then everything else in registration order.
# Disjoint from _FIRST by test (duplicates collapse silently in the
# ordered-dict build, wasting window slots).
_NEXT = [
    # displaced from _FIRST by the r10 leads (all gated green in r09;
    # results unchanged since — profile_constraint/band_skew/kmeans
    # queries re-gated green in CORRECTNESS_r09 after their r09
    # reshapes; the rest are r08-window names whose code is untouched)
    "profile_constraint_suggestions",
    "pq_trained_codebook_eval",
    "span_dup_rate",
    "span_dedup_rewrite",
    "dedup_mixture_shift",
    "ann_recall_eval",
    "ann_ndcg_eval",
    "grouped_quantile_sketch",
    "kll_quantile_sketch",
    "holt_winters_seasonal",
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
    "k_anonymity_audit",
    "semantic_contamination_audit",
    "prefix_share_profile",
    # carried from the r09 _NEXT (never-promoted backlog)
    "pmi_collocations",
    "ar2_yule_walker_forecast",
    "readability_profile",
    "quality_classifier_scores",
    "ivf_pq_search_recall",
    "croston_demand_forecast",
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
