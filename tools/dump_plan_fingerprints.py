"""Plan-fingerprint snapshot tool (VERDICT r07 item #5).

A fingerprint is the STRUCTURE of a query's pre-execution physical plan:
counts of each physical operator kind (parsed from the formatted
explain's numbered operator list) — join strategies, shuffle exchange
count, Expand/Window/Generate presence. PLANS.md shows humans the full
plans; the fingerprint is the machine-checkable digest that makes a
silent broadcast->SortMergeJoin flip or a new Exchange FAIL the test
suite (tests/test_plan_fingerprints.py) instead of waiting for a bench
round to surface it as a regression.

Intentional plan changes: re-run  python tools/dump_plan_fingerprints.py
which rewrites tests/plan_fingerprints.json; review the diff in the PR
(the diff IS the documentation of the plan change) and commit it with
the code change that caused it.

Fingerprints are taken at sf0.001 with the engine's standard session
(32 shuffle partitions, AQE on — the plan is the AdaptiveSparkPlan's
initial plan, deterministic pre-execution).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

# Headline queries (VERDICT r08 #5): the r07 family anchors PLUS every
# query in the committed profile's top-30 by wall — exactly the plans
# whose silent broadcast->SMJ flip or extra Exchange would cost the
# most. Iterative/pipeline queries (bpe, pagerank, curation, cdc/scd2)
# fingerprint their FINAL plan — loop bodies collapse behind
# checkpoints, but the terminal join/agg structure is still pinned.
HEADLINE = [
    # family anchors (r07 set)
    "daily_sales",
    "product_performance",
    "customer_insights",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "exact_dedup",
    "minhash_lsh_pairs",
    "embedding_cosine_dups",
    "window_top1_per_group",
    "top_k_global",
    "anti_join_orphans",
    "tumbling_window_agg",
    "semantic_contamination_audit",
    # committed-profile top-30 additions (r08 profile order)
    "corpus_curation_pipeline",
    "semantic_cluster_dups",
    "bpe_merge_steps",
    "lsh_recall_eval",
    "dbscan_customer_segments",
    "bfs_hops_copurchase",
    "shingle_similarity_join",
    "pagerank_copurchase",
    "embedding_cosine_dups_expanded",
    "profile_constraint_suggestions",
    "neardup_clusters",
    "kcore_peeling_profile",
    "mv_incremental_refresh",
    "sssp_copurchase",
    "cdc_apply_snapshot",
    "label_propagation_communities",
    "pq_trained_codebook_eval",
    "department_analytics",
    "span_dedup_clean",
    "cdc_change_feed",
    "bloom_skipping_snapshot",
    "scd2_asof_lookup",
    "shingle_containment_pairs",
    "scd2_apply_snapshot",
    "quality_rater_agreement",
    "frequent_triple_itemsets",
]

_OP_LINE = re.compile(r"^\(\d+\) (\w+)", re.MULTILINE)
# volatile suffixes the fingerprint must ignore: codegen ids and AQE
# wrappers don't change the plan's scale behavior
_STRIP = {"WholeStageCodegen", "InputAdapter", "AdaptiveSparkPlan",
          "ColumnarToRow", "ReusedExchange"}


def fingerprint(df) -> dict:
    """Operator-kind counts from the formatted physical plan (initial
    AQE plan, pre-execution)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    ops = [o for o in _OP_LINE.findall(buf.getvalue()) if o not in _STRIP]
    return dict(sorted(Counter(ops).items()))


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("plan-fingerprints")
    out = {}
    for name in names:
        df = REGISTRY[name](spark, "/root/testdata/sf0.001")
        out[name] = fingerprint(df)
        print(f"{name}: {out[name]}", file=sys.stderr)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "plan_fingerprints.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
