"""Invariant tests for the round-7 wave (queries/wave7.py). The oracle
gate proves engine parity; these assert the MATH means what the
docstrings claim."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.queries import REGISTRY


def test_mmr_first_pick_is_max_relevance_and_diverse(spark, sf_dir):
    rows = REGISTRY["mmr_diversified_topk"](spark, sf_dir).collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, 11)
    )
    by_rank = {r.rank: r for r in rows}
    # rank 1 is the pure-relevance argmax: its mmr == its rel
    assert by_rank[1].mmr_score == by_rank[1].cosine_rel
    # every later pick's score is lambda*rel - (1-lambda)*maxsim with
    # maxsim in [-1, 1], so it lives in a band of half-width (1-lambda)
    # around lambda*rel
    for r in sorted(rows, key=lambda r: r.rank)[1:]:
        assert abs(r.mmr_score - 0.7 * r.cosine_rel) <= 0.3 + 1e-9
    # no duplicate results
    assert len({r.vec_id for r in rows}) == 10


def test_mmr_differs_from_pure_relevance_ranking(spark, sf_dir):
    """If MMR never reordered anything it would be dead code: on this
    corpus the greedy diversified list must not equal the pure cosine
    top-10 in order."""
    from ecommerce_lakehouse_spark.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sq = F.aggregate(
        F.transform("emb", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    withn = e.withColumn("nrm", F.sqrt(sq))
    q = withn.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    pure = [
        r.vec_id
        for r in (
            withn.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .withColumn("rel", dot / (F.col("q_nrm") * F.col("nrm")))
            .orderBy(F.desc("rel"), F.asc("vec_id"))
            .limit(10)
            .collect()
        )
    ]
    mmr = [
        r.vec_id
        for r in sorted(
            REGISTRY["mmr_diversified_topk"](spark, sf_dir).collect(),
            key=lambda r: r.rank,
        )
    ]
    # same query, same corpus: the first pick agrees by construction
    assert mmr[0] == pure[0]
    assert mmr != pure  # diversification actually did something


def test_pca_power_bounds(spark, sf_dir):
    row = REGISTRY["embedding_pca_power"](spark, sf_dir).collect()[0]
    assert row.dim == 64
    assert row.trace > 0
    # Rayleigh quotient of a unit vector: mean diag <= lambda1 <= trace
    assert row.trace / 64 - 1e-9 <= row.lambda1 <= row.trace + 1e-9
    assert 1.0 / 64 - 1e-9 <= row.lambda1_share <= 1.0 + 1e-9
    assert 1 <= row.top_component_dim <= 64


def test_periodogram_parseval_budget(spark, sf_dir):
    rows = REGISTRY["revenue_periodogram"](spark, sf_dir).collect()
    assert len(rows) == 12
    # shares are variance fractions: each in [0, 1], partial sum <= 1
    assert all(0.0 <= r.power_share <= 1.0 for r in rows)
    assert sum(r.power_share for r in rows) <= 1.0 + 1e-6
    assert all(abs(r.period_months - r.n / r.k) < 1e-9 for r in rows)


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    pacf = {
        r.lag: r.pacf for r in REGISTRY["pacf_durbin_levinson"](spark, sf_dir).collect()
    }
    acf = {
        r.lag: r.acf
        for r in REGISTRY["revenue_autocorrelation"](spark, sf_dir).collect()
    }
    assert len(pacf) == 6
    # the Durbin-Levinson base case IS the lag-1 autocorrelation
    assert abs(pacf[1] - acf[1]) < 1e-8
    assert all(abs(v) <= 1.0 + 1e-9 for v in pacf.values())


def test_page_hinkley_summary_consistent(spark, sf_dir):
    row = REGISTRY["page_hinkley_drift"](spark, sf_dir).collect()[0]
    assert row.n_days > 0 and row.lambda_threshold > 0
    assert 0 <= row.n_alarm_days <= row.n_days
    assert row.max_excess >= 0
    if row.n_alarm_days > 0:
        assert row.first_alarm_day is not None
        assert row.max_excess > row.lambda_threshold
    else:
        assert row.first_alarm_day is None


def test_propensity_strata_pooled_is_weighted_mean(spark, sf_dir):
    rows = REGISTRY["propensity_strata_ate"](spark, sf_dir).collect()
    assert len(rows) >= 1
    n = sum(r.n_t + r.n_c for r in rows)
    want = sum(r.ate * (r.n_t + r.n_c) for r in rows) / n
    assert abs(rows[0].pooled_ate - want) < 1e-6
    assert len({r.pooled_ate for r in rows}) == 1  # repeated on every row


def test_dedup_mixture_shift_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["dedup_mixture_shift"](spark, sf_dir).collect()
    assert abs(sum(r.share_raw for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_dedup for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_shift for r in rows)) < 1e-9
    for r in rows:
        assert r.n_canonical <= r.n_docs
        assert r.tok_dedup <= r.tok_raw


def test_common_neighbors_jaccard_bounds(spark, sf_dir):
    rows = REGISTRY["common_neighbors_jaccard"](spark, sf_dir).collect()
    assert len(rows) <= 20
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common >= 1
        assert r.part_a < r.part_b


def test_holt_winters_forecast_months_contiguous(spark, sf_dir):
    rows = sorted(
        REGISTRY["holt_winters_seasonal"](spark, sf_dir).collect(),
        key=lambda r: r.h,
    )
    assert [r.h for r in rows] == list(range(1, 7))
    # forecasts follow level + h*trend + seasonal: bounded by level band
    lvl, tr = rows[0].level, rows[0].trend
    assert all(r.level == lvl and r.trend == tr for r in rows)
    months = [r.forecast_month for r in rows]
    assert all(
        (b.year - a.year) * 12 + b.month - a.month == 1
        for a, b in zip(months, months[1:])
    )


def test_heaps_points_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["heaps_law_fit"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens >= a.n_tokens
        assert b.n_types >= a.n_types  # vocabulary never shrinks
    assert len({r.heaps_beta for r in rows}) == 1


def test_k_anonymity_consistency(spark, sf_dir):
    row = REGISTRY["k_anonymity_audit"](spark, sf_dir).collect()[0]
    assert row.n_rows >= row.n_classes >= 1
    assert 1 <= row.k_anonymity
    assert 0 <= row.unique_rows <= row.n_classes
    assert 0.0 <= row.risk_fraction <= 1.0
    if row.k_anonymity >= 5:
        assert row.rows_below_k == 0


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = REGISTRY["clustering_coefficient_profile"](spark, sf_dir).collect()
    assert rows, "relative-support graph has degree>=2 nodes at every SF"
    gt = {r.global_transitivity for r in rows}
    assert len(gt) == 1 and 0.0 <= gt.pop() <= 1.0
    for r in rows:
        assert r.degree >= 2
        assert 0.0 <= r.avg_local_cc <= 1.0 + 1e-9


def test_safety_stock_rank_arithmetic(spark, sf_dir):
    rows = REGISTRY["safety_stock_plan"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.weeks_with_demand <= r.n_weeks
        assert r.p95_weekly >= 0
        assert abs(r.reorder_point_2w - (2 * r.mean_weekly + r.safety_stock)) < 1e-9
        # P95 cannot exceed the largest single week, which is <= total
        assert r.p95_weekly <= r.total_qty


def test_semantic_contamination_buckets(spark, sf_dir):
    rows = REGISTRY["semantic_contamination_audit"](spark, sf_dir).collect()
    assert rows
    rate = {r.contamination_rate for r in rows}
    assert len(rate) == 1 and 0.0 <= rate.pop() <= 1.0
    for r in rows:
        assert -10 <= r.sim_bucket <= 9
        assert r.bucket_min_sim <= r.bucket_max_sim


def test_prefix_share_monotone_in_depth(spark, sf_dir):
    rows = sorted(
        REGISTRY["prefix_share_profile"](spark, sf_dir).collect(),
        key=lambda r: r.prefix_tokens,
    )
    assert [r.prefix_tokens for r in rows] == [4, 8, 16]
    for a, b in zip(rows, rows[1:]):
        # deeper prefixes can only split groups: hit fraction never rises
        assert b.cache_hit_fraction <= a.cache_hit_fraction + 1e-9
        assert b.n_prefixes >= a.n_prefixes


def test_duplication_spectrum_accounting(spark, sf_dir):
    rows = REGISTRY["duplication_spectrum"](spark, sf_dir).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    total_tok = sum(r.tok_total for r in rows)
    from ecommerce_lakehouse_spark.tables import load

    assert total_docs == load(spark, sf_dir, "documents").count()
    for r in rows:
        assert r.n_docs == r.copies * r.n_groups
        assert r.tok_removable <= r.tok_total
        assert 0.0 <= r.removable_share <= 1.0
    assert abs(sum(r.removable_share for r in rows)
               - sum(r.tok_removable for r in rows) / total_tok) < 1e-9


def test_bucketed_prefix_sum_matches_global_window(spark):
    """The two-pass bucketed exclusive prefix sum must equal the naive
    single-window form on any input (operators/scale.py)."""
    from pyspark.sql import Window

    from ecommerce_lakehouse_spark.operators.scale import bucketed_prefix_sum

    df = spark.range(0, 500).select(
        (F.col("id") * 7919 % 501).alias("k"),
        (F.col("id") % 13 + 1).alias("v"),
    ).dropDuplicates(["k"])
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.p
        for r in df.select(
            "k", (F.sum("v").over(w) - F.col("v")).cast("long").alias("p")
        ).collect()
    }
    got = {
        r.k: r.prefix
        for r in bucketed_prefix_sum(
            df, F.col("k"), ["k"], "v", buckets=16
        ).collect()
    }
    assert got == want


def test_kappa_identity(spark, sf_dir):
    row = REGISTRY["quality_rater_agreement"](spark, sf_dir).collect()[0]
    assert row.n == row.n11 + row.n10 + row.n01 + row.n00
    po, pe, k = row.observed_agreement, row.expected_agreement, row.cohen_kappa
    assert abs(k - (po - pe) / (1 - pe)) < 1e-9
    assert -1.0 - 1e-9 <= k <= 1.0 + 1e-9


def test_knn_label_precision_bounds(spark, sf_dir):
    rows = REGISTRY["knn_label_precision"](spark, sf_dir).collect()
    assert sum(r.n_queries for r in rows) == 50
    for r in rows:
        assert 0.0 <= r.precision_at_k <= 1.0
        assert 0.0 <= r.mrr <= 1.0 + 1e-9
        assert r.n_relevant_in_topk <= r.n_queries * 10


def test_brier_murphy_identity(spark, sf_dir):
    rows = REGISTRY["brier_decomposition"](spark, sf_dir).collect()
    b = rows[0]
    # Murphy: brier = reliability - resolution + uncertainty (the binned
    # identity holds exactly when forecasts are replaced by bucket means;
    # with raw per-doc forecasts inside buckets there is a within-bucket
    # variance remainder, so check the inequality chain instead)
    assert 0.0 <= b.brier <= 1.0
    assert b.reliability >= 0.0 and b.resolution >= -1e-12
    assert 0.0 <= b.uncertainty <= 0.25 + 1e-9
    # resolution can never exceed uncertainty
    assert b.resolution <= b.uncertainty + 1e-9
    for r in rows:
        assert 0.0 <= r.empirical_rate <= 1.0
        assert 0.0 <= r.mean_forecast <= 1.0
