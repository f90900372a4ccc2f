"""Fuzzy-matching vocab-scale smoke: naive vocab² vs q-gram blocking.

source_fuzzy_pairs is a broadcast NLJ over the distinct-label vocabulary —
fine at 20 labels, quadratic at catalog scale. fuzzy_pairs_blocked builds a
2-gram inverted index and runs levenshtein only on candidates sharing a
gram. This tool synthesizes a V-label vocabulary with planted distance-1
pairs, runs both shapes over it, and checks the blocked path finds exactly
the naive path's pairs (recall proof) while touching far fewer comparisons.

Usage: python tools/fuzzy_vocab_smoke.py [V_blocked] [V_naive]
Defaults: blocked at 20 000 labels, naive capped at 4 000 (vocab² beyond
that is exactly the point).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ecommerce_lakehouse_spark import get_spark  # noqa: E402


def vocab_df(spark, v: int):
    """V labels like feed-3ac9f1-x (hash-derived hex ids — realistic
    catalog diversity, so true distance-1 pairs are only the planted
    siblings) plus a sibling every 10th label (trailing y instead of x)."""
    hexid = F.substring(F.md5(F.col("id").cast("string")), 1, 6)
    base = spark.range(v).select(
        F.concat(F.lit("feed-"), hexid, F.lit("-x")).alias("source")
    )
    sib = spark.range(0, v, 10).select(
        F.concat(F.lit("feed-"), hexid, F.lit("-y")).alias("source")
    )
    return base.unionByName(sib)


def blocked(vdf):
    from ecommerce_lakehouse_spark.queries.stats import blocked_fuzzy_pairs

    return blocked_fuzzy_pairs(vdf)


def naive(vdf):
    a = vdf.select(F.col("source").alias("src_a"))
    b = vdf.select(F.col("source").alias("src_b"))
    return a.join(F.broadcast(b), F.col("src_a") < F.col("src_b")).filter(
        F.levenshtein("src_a", "src_b") <= 1
    )


def main() -> None:
    v_blocked = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    v_naive = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    spark = get_spark("fuzzy-vocab-smoke")
    report: dict = {"v_blocked": v_blocked, "v_naive": v_naive}

    big = vocab_df(spark, v_blocked).cache()
    big.count()
    t0 = time.time()
    report["blocked_pairs"] = blocked(big).count()
    report["blocked_sec"] = round(time.time() - t0, 2)

    small = vocab_df(spark, v_naive).cache()
    small.count()
    t0 = time.time()
    n_naive = naive(small).count()
    report["naive_sec_at_v_naive"] = round(time.time() - t0, 2)

    # recall proof at the naive-feasible size: identical pair sets
    t0 = time.time()
    n_blocked_small = blocked(small).count()
    report["blocked_sec_at_v_naive"] = round(time.time() - t0, 2)
    diff = (
        naive(small)
        .select("src_a", "src_b")
        .exceptAll(blocked(small).select("src_a", "src_b"))
        .count()
    )
    report["recall_missing_pairs"] = diff
    report["pairs_at_v_naive"] = {"naive": n_naive, "blocked": n_blocked_small}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
