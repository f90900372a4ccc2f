"""10× scale-up smoke for the round-6 mining/stats queries (VERDICT r06
item #2) and the round-7 additions.

`tools/scale_smoke.py` answers the candidate-growth question for the
dedup/ANN family over documents/embeddings; this companion answers it
for the round-6 additions, which run over the TPC-H-side tables. It
replicates customer/orders/lineitem/events K× (key-shifted so referential
integrity holds across replicas: replica i's orders reference replica i's
customers) and documents/embeddings K×, copies the small dims verbatim,
then times every round-6 query and reports wall seconds + rows.

Replication direction per query family (the adversarial one):
- lineitem part keys are NOT shifted, so the co-purchase graph gets K×
  DENSER (same part domain, K× more baskets) — k-core peeling and
  Apriori triples face growing support, not disjoint copies; the k-core
  round budget and the triple-candidate Apriori bound are exercised at
  the larger edge count.
- customer keys ARE shifted, so DBSCAN's integer behavior lattice sees
  K× more points; its cell-count domain bound (grid cells, not points)
  is what must hold.
- event user_ids are shifted → K× more sessions for the Markov /
  trigram path queries (state space fixed at the event_type alphabet).
- o_orderdate is untouched → the daily/monthly frames behind Hurst,
  Haar, changepoints, spike flags, AR(2), Croston stay DOMAIN-BOUNDED
  (same date range, K× the mass) — the claim that makes them 100 TB
  safe is exactly that their shuffled state doesn't grow with rows.

Usage: python tools/scale_smoke_mining.py [K] [base_sf_dir]
Writes the synthetic corpus under /tmp/spark_graft_scale_smoke_mining
and prints one JSON report line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

# the 27 round-6 registry additions (wave-3 mining + stats/sketch/ANN)
QUERIES = [
    # stats / forecasting over the date-domain-bounded daily frame
    "daily_revenue_spike_flags",
    "ar2_yule_walker_forecast",
    "croston_demand_forecast",
    "hurst_rs_exponent",
    "haar_wavelet_energy",
    "binary_segmentation_changepoints",
    # sketches
    "kll_quantile_sketch",
    "grouped_quantile_sketch",
    # classifier / calibration
    "quality_classifier_scores",
    "classifier_calibration_curve",
    "isotonic_calibration",
    # causal
    "quantile_treatment_effects",
    # lakehouse as-of
    "scd2_asof_lookup",
    # interval analytics
    "order_open_interval_concurrency",
    # graph / itemsets over the densified co-purchase graph
    "kcore_peeling_profile",
    "frequent_triple_itemsets",
    # segmentation over the K×-larger customer lattice
    "dbscan_customer_segments",
    # event-sequence models over K× more sessions
    "markov_prediction_accuracy",
    "event_path_trigrams",
    # text mining over the K× document corpus
    "pmi_collocations",
    "readability_profile",
    "simhash_hamming_pairs",
    "vocab_chao1_estimate",
    # embedding index / compression over the K× vector corpus
    "ivf_pq_search_recall",
    "pq_trained_codebook_eval",
    "random_projection_distortion",
    "shingle_containment_pairs",
    # round-7 additions (same 10x bound applies)
    "common_neighbors_jaccard",
    "clustering_coefficient_profile",
    "revenue_periodogram",
    "pacf_durbin_levinson",
    "page_hinkley_drift",
    "propensity_strata_ate",
    "mmr_diversified_topk",
    "embedding_pca_power",
    "dedup_mixture_shift",
    "holt_winters_seasonal",
    "heaps_law_fit",
    "k_anonymity_audit",
    "discount_uplift_profile",
    "safety_stock_plan",
    "semantic_contamination_audit",
    "prefix_share_profile",
    "duplication_spectrum",
    "quality_rater_agreement",
    "knn_label_precision",
    "brier_decomposition",
    "source_quality_independence",
]

# (table, [keys to shift per replica]) — shift = i * (max(key)+1) so
# replicas are disjoint and joins stay within-replica consistent
_REPLICATED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],  # part/supp keys kept → densify graph
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_VERBATIM = ["region", "nation", "part", "supplier"]


def build_corpus(spark, base: str, out: str, k: int) -> dict:
    sizes = {}
    for t in _VERBATIM:
        src = os.path.join(base, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(out, f"{t}.parquet")
            )
    for t, keys in _REPLICATED.items():
        df = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        strides = {
            c: v + 1
            for c, v in df.agg(
                *[F.max(c).alias(c) for c in keys]
            ).collect()[0].asDict().items()
        }
        reps = None
        for i in range(k):
            r = df
            for c in keys:
                r = r.withColumn(c, F.col(c) + F.lit(i * strides[c]))
            reps = r if reps is None else reps.unionByName(r)
        reps.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        sizes[t] = df.count() * k
    return sizes


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_scale_smoke_mining"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    spark = get_spark("scale-smoke-mining")
    sizes = build_corpus(spark, base, out, k)
    report: dict = {"k": k, "base": base, "tables": sizes, "queries": {}}
    for name in QUERIES:
        t0 = time.time()
        df = REGISTRY[name](spark, out)
        rows = df.count()
        report["queries"][name] = {"sec": round(time.time() - t0, 2), "rows": rows}
        print(
            f"{name:34s} {report['queries'][name]['sec']:7.2f}s  {rows} rows",
            file=sys.stderr,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
