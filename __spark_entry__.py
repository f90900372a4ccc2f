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
# Round-4 rotation (verdict r03 item #2): the 40 names the driver has
# never gated (concentrated in tpch2 q2-q22 and stats) all enter the
# window. The other 10 slots hold this round's new features plus two
# regression anchors (the flagship mart and the most complex DAG);
# three r03-green reps (cdc_change_feed, minhash_lsh_pairs,
# embedding_cosine_dups) rotated OUT late-round for three never-gated
# round-4 features — their families stay represented via
# cdc_apply_snapshot (drives changes()), band_skew_profile +
# corpus_curation_pipeline (LSH), and the curation DAG's dedup stages.
# This round's rewrites (value_quantiles_exact deciles q11 q15 — the
# de-single-partitioned window family) are all in the fresh set.
_FIRST = [
    # regression anchors + round-4 features
    "daily_sales",
    "shingle_novelty_profile",  # r4: new — first-occurrence novelty scoring
    "cdc_apply_snapshot",  # r4: new — CDC loop closed (changes() -> apply_changes)
    "concat_packing_plan",  # r4: new — GPT-style concat packing plan
    "scd2_apply_snapshot",  # r4: new — SCD2 dimension history via MERGE
    "corpus_curation_pipeline",
    "mv_incremental_refresh",  # r4: new — materialized aggregate, cursor=last_txn
    "dsir_importance_scores",  # r4: new — DSIR hashed-ngram importance scoring
    "rfm_segments",  # r4: new — triple bucketed-rank NTILE segmentation
    "zorder_skipping_snapshot",  # r4: new — OPTIMIZE ZORDER + data skipping gated
    # never-gated: this round's global-window rewrites
    "value_quantiles_exact",
    "customer_spend_deciles",
    "tpch_q11_important_parts",
    "tpch_q15_top_supplier",
    # never-gated: remaining TPC-H
    "tpch_q2_top_supplier_by_region",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_shipping_delay",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_part_variety",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_volume_suppliers",
    "tpch_q22_dormant_customers",
    # never-gated: stats / relational tail
    "value_histogram",
    "value_outlier_rate",
    "order_status_journey",
    "monthly_revenue_growth",
    "customers_all_quarters",
    "latest_order_value",
    "date_spine_fill",
    "key_skew_profile",
    "null_safe_join_sizes",
    "orphan_audit_full_outer",
    "revenue_share_by_priority",
    "unpivot_priority_metrics",
    "grouped_median_doclen",
    # never-gated: LLM / text tail
    "band_skew_profile",
    "bigram_lm_score",
    "corpus_curation_funnel",
    "jpeg_decode_features",
    "lang_id_confusion",
    "source_fuzzy_pairs",
    "token_frequencies",
]


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _FIRST if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
