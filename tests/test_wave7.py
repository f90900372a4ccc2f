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
