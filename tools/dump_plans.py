"""Regenerate PLANS.md: `explain("formatted")` operator trees for the
headline queries, with a one-line note on what each plan should show.

Run after any plan-affecting change: ``python tools/dump_plans.py``.
Keeping the trees in-repo lets a reviewer audit shuffle/broadcast/pruning
decisions without spinning up Spark.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

NAMES = {
    "daily_sales": "flagship gold mart: two-branch agg avoids the reference's join-fanout bug; broadcast dims",
    "tpch_q1_pricing_summary": "scan -> one partial+final agg, whole-stage codegen end to end",
    "tpch_q21_waiting_supplier": "the heaviest TPC-H: exchange reuse across the exists/not-exists branches",
    "exact_dedup": "hash-groupBy on md5: fixed-width shuffle regardless of text size",
    "minhash_lsh_pairs": "collapse-first -> banded LSH self-join on band_key; slim id pairs only",
    "embedding_cosine_dups": "exact-collapse then hyperplane-LSH buckets; candidates never all-pairs",
    "span_dedup_spans": "map-side window slide (HOF) -> single fixed-width shuffle on span hash",
    "span_dedup_rewrite": "span counts + slim position join; text shuffles once, id-keyed",
    "apply_mixture_sample": "broadcast per-domain factors; per-doc pass is map-side only",
    "merge_upsert_snapshot": "partition-pruned MERGE via LakeTable: only touched partitions rescanned",
    "value_quantiles_exact": "distributed exact quantiles: distinct-value collapse, bounded bucket-offset window, per-bucket running totals — NO unpartitioned window over raw input",
    "customer_spend_deciles": "bucketed two-pass global rank + closed-form ntile: the only windows are per-bucket / over the <=1024-row bucket histogram",
    "tpch_q11_important_parts": "global scalar via one-row agg broadcast-joined back; no single-partition window over the per-part frame",
    "rfm_segments": "three bucketed two-pass ranks with lineage barriers; windows are per-bucket only",
    "shingle_novelty_profile": "shingle-keyed aggregate + one-row-per-shingle join back; no pair expansion under boilerplate skew",
    "pagerank_copurchase": "iterative SpMV: checkpointed graph, broadcast rank table per round, TakeOrdered top-k; per-round barrier stops broadcast re-execution of prior rounds",
    "triangle_copurchase": "degree-ordered orientation bounds the wedge join; two equi-self-joins of the oriented edges, pure counting",
    "trigram_index_search": "broadcast pattern-trigram join prunes the posting explode map-side; only pattern-relevant postings shuffle",
    "cms_heavy_hitters": "fixed 4x1024-cell sketch groupBy, broadcast back for estimation, TakeOrdered top-20",
    "pq_encode_eval": "16-row broadcast codebook, map-side subspace distances, (vec,subspace)-partitioned argmin window",
    "source_overlap_kmv": "per-source partitioned rank to 128 min-hashes, checkpointed sketch table, broadcast NLJ over source pairs only",
    "bm25_search": "map-side tf/dl array exprs (no explode), one-row corpus stats broadcast, TakeOrdered top-20",
    "shingle_similarity_join": "rarest-first prefix postings only enter the self-join; two hash joins back to shingle arrays for exact verification",
    "bootstrap_mean_ci": "repartitioned slim spine -> 32x hash fan-out collapsed by partial agg to <=B rows per task before the exchange",
    "value_mad_outliers": "one (type,value) collapse shuffle; both median windows partition by type over DOMAIN-bounded distinct values",
    "customer_spend_gini": "bucketed two-pass global rank (per-bucket windows + <=1024-row offset window), exact BIGINT moment sums",
    "rrf_hybrid_search": "two TakeOrdered top-20 lists full-outer joined; windows only over the <=20-row fused frames",
    "kll_quantile_sketch": "count + map-side hash-threshold filter + O(k) collect_list: the sketch never shuffles more than k items; audit pass broadcasts 3 estimate rows against the scan",
    "quality_classifier_scores": "256-bucket training groupBy + broadcast weight join; the only corpus-sized shuffle is the per-doc presence distinct",
    "ivf_pq_search_recall": "broadcast centroid/codebook/distance tables; candidate scoring joins codes on vec_id bounded by cell sizes; shortlist/refine windows per-query over bounded rows",
    "scd2_asof_lookup": "interval lookup as an EQUI broadcast join on the dim key with the validity range as residual — no nested loop, no cartesian",
    "shingle_containment_pairs": "one-sided rarest-prefix postings against the full inverted index; candidates verified via two id-keyed array joins",
    "order_open_interval_concurrency": "boundary-delta collapse to the date domain; the running-sum window is over that aggregated bounded frame",
    "pmi_collocations": "two vocabulary-bounded token groupBys + broadcast unigram joins; top-20 is TakeOrdered",
    "simhash_hamming_pairs": "collapse-first signatures, 4x band fan-out, stop-band anti-join, in-row popcount verify",
    "kcore_peeling_profile": "12 peel rounds over a checkpointed adjacency; per-round degree groupBy over the shrinking node set",
    "dbscan_customer_segments": "9-cell stencil joins on cell coords; core-cell CC as ONE in-row fold (domain-bounded); no point-level distance join",
    "frequent_triple_itemsets": "in-row C(basket,3) expansion collapsed map-side; three broadcast pair-support probes of the top-20",
    "isotonic_calibration": "shared classifier scoring body -> <=11-bucket groupBy -> ONE in-row PAVA stack fold",
    "binary_segmentation_changepoints": "day-level collapse; both CUSUM scans are aggregate-bounded windows keyed by segment",
    "random_projection_distortion": "broadcast 16x64 sign matrix; projection is a narrow in-row map; fixed-width ratio histogram",
}


def main() -> None:
    spark = get_spark("plans", shuffle_partitions=32)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [
        "# PLANS — physical plans of the headline queries (sf0.1, local[32])",
        "",
        "Generated by `tools/dump_plans.py` (re-run it after plan-affecting changes).",
        "Each plan is `df.explain('formatted')` output; the one-line note says what",
        "to look for. AQE is enabled, so exchanges shown may further coalesce at runtime.",
        "",
    ]
    for name, note in NAMES.items():
        df = REGISTRY[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        head = buf.getvalue().partition("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", "", "```", head.strip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md: {len(NAMES)} plans written")


if __name__ == "__main__":
    main()
