"""Experimentation & causal-inference wave: CUPED, diff-in-differences,
overdispersion.

Extends the A/B readout (`ab_test_lift`) with the three tools an
experimentation platform reaches for next:

- **CUPED** (Deng et al. 2013, "Improving the sensitivity of online
  controlled experiments by utilizing pre-experiment data") — regression
  adjustment on a pre-period covariate; the industry-standard variance
  cut that shrinks required sample sizes by var_reduction = ρ².
- **Difference-in-differences** — the observational fallback when you
  cannot randomize: (treated post − pre) − (control post − pre).
- **Overdispersion check** — var/mean of per-user event counts; the
  diagnostic that says whether a Poisson model (and its CIs) is even
  admissible for count metrics.

Determinism contract: unit-level metrics are exact integer CENTS
(events.value is 2dp-quantized at every SF) or exact decimal sums; all
power sums accumulate in DECIMAL(38,0)/BIGINT; arm assignment is the
repo's salted-md5 split (md5 is the only cross-engine-identical hash);
closed forms run in double in the identical order both engines.

Reference parity: the reference has no experimentation surface; this
module extends the analytics engine beyond it (the same discipline as
queries/llm8.py's statistics wave).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.money import dec2
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

_CUPED_SPLIT_DATE = "2024-01-16 00:00:00"


@query(
    "cuped_adjusted_lift",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5('cuped|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT_DATE}'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT_DATE}'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
         CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         CAST(sum(CASE WHEN arm = 'A' THEN CAST(x AS HUGEINT) ELSE 0 END)
              AS DOUBLE) AS sxa,
         CAST(sum(CASE WHEN arm = 'B' THEN CAST(x AS HUGEINT) ELSE 0 END)
              AS DOUBLE) AS sxb,
         CAST(sum(CASE WHEN arm = 'A' THEN CAST(y AS HUGEINT) ELSE 0 END)
              AS DOUBLE) AS sya,
         CAST(sum(CASE WHEN arm = 'B' THEN CAST(y AS HUGEINT) ELSE 0 END)
              AS DOUBLE) AS syb
  FROM per_user),
fit AS (
  SELECT n, na, nb,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS theta,
         (CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy)
           / ((CAST(n AS DOUBLE) * sxx - sx * sx)
              * (CAST(n AS DOUBLE) * syy - sy * sy)) AS rho2,
         sya / na AS mya, syb / nb AS myb,
         sxa / na AS mxa, sxb / nb AS mxb
  FROM m)
SELECT n AS n_users, theta,
       (myb - mya) / 100.0 AS raw_lift,
       ((myb - mya) - theta * (mxb - mxa)) / 100.0 AS cuped_lift,
       rho2 AS var_reduction
FROM fit
""",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al. 2013): split
    event users by the salted-md5 arm hash, take each user's PRE-period
    total event value (first half of the window) as the covariate X and
    the POST-period total as the metric Y, fit theta = cov(X,Y)/var(X)
    on the pooled population, and report the raw arm lift next to the
    CUPED-adjusted lift (Ycv = Y − theta·(X − X̄); arm-mean difference
    simplifies to raw_lift − theta·(covariate imbalance)). The
    var_reduction column is ρ² — the fraction of metric variance the
    covariate removes, i.e. how much smaller the experiment could have
    been. On this null (A/A) split the adjusted lift should hug zero
    tighter than the raw lift.

    Determinism: per-user totals are exact integer CENTS (value is
    2dp-quantized); the six power sums and four arm sums accumulate in
    DECIMAL(38,0); theta/ρ²/means are one fixed-order double closed
    form, divisions of exact inputs left unrounded (money.py policy).

    Scale: one grouped pass per user (map-side combined conditional
    sums), then a single 1-row aggregate — nothing else moves."""
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy(
        "user_id",
        F.expr(
            "CASE WHEN conv(substr(md5(concat('cuped|', CAST(user_id AS STRING))),"
            " 1, 8), 16, 10) % 2 = 0 THEN 'A' ELSE 'B' END"
        ).alias("arm"),
    ).agg(
        F.sum(
            F.when(F.col("ts") < _CUPED_SPLIT_DATE, cents).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(F.col("ts") >= _CUPED_SPLIT_DATE, cents).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("y"),
    )
    big = "decimal(38,0)"
    x, y = F.col("x").cast(big), F.col("y").cast(big)
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * F.col("x")).cast("double").alias("sxx"),
        F.sum(y * F.col("y")).cast("double").alias("syy"),
        F.sum(x * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("double")
        .alias("nb"),
        F.sum(F.when(F.col("arm") == "A", x).otherwise(F.lit(0).cast(big)))
        .cast("double")
        .alias("sxa"),
        F.sum(F.when(F.col("arm") == "B", x).otherwise(F.lit(0).cast(big)))
        .cast("double")
        .alias("sxb"),
        F.sum(F.when(F.col("arm") == "A", y).otherwise(F.lit(0).cast(big)))
        .cast("double")
        .alias("sya"),
        F.sum(F.when(F.col("arm") == "B", y).otherwise(F.lit(0).cast(big)))
        .cast("double")
        .alias("syb"),
    )
    nD = F.col("n").cast("double")
    theta = (nD * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    rho2 = (
        (nD * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (nD * F.col("sxy") - F.col("sx") * F.col("sy"))
    ) / (
        (nD * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nD * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    fit = m.select(
        F.col("n").alias("n_users"),
        theta.alias("theta"),
        rho2.alias("var_reduction"),
        (F.col("sya") / F.col("na")).alias("mya"),
        (F.col("syb") / F.col("nb")).alias("myb"),
        (F.col("sxa") / F.col("na")).alias("mxa"),
        (F.col("sxb") / F.col("nb")).alias("mxb"),
    )
    return fit.select(
        "n_users",
        "theta",
        ((F.col("myb") - F.col("mya")) / F.lit(100.0)).alias("raw_lift"),
        (
            (
                (F.col("myb") - F.col("mya"))
                - F.col("theta") * (F.col("mxb") - F.col("mxa"))
            )
            / F.lit(100.0)
        ).alias("cuped_lift"),
        "var_reduction",
    )


@query(
    "did_revenue_effect",
    oracle="""
WITH grp AS (
  SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
         CASE WHEN r.r_name = 'EUROPE' THEN 'T' ELSE 'C' END AS grp,
         CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              THEN 'post' ELSE 'pre' END AS period
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey),
cells AS (
  SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS mean_price
  FROM grp GROUP BY 1, 2),
w AS (
  SELECT max(CASE WHEN grp = 'T' AND period = 'pre' THEN mean_price END) AS t_pre,
         max(CASE WHEN grp = 'T' AND period = 'post' THEN mean_price END) AS t_post,
         max(CASE WHEN grp = 'C' AND period = 'pre' THEN mean_price END) AS c_pre,
         max(CASE WHEN grp = 'C' AND period = 'post' THEN mean_price END) AS c_post,
         max(CASE WHEN grp = 'T' AND period = 'pre' THEN n END) AS n_t_pre,
         max(CASE WHEN grp = 'T' AND period = 'post' THEN n END) AS n_t_post,
         max(CASE WHEN grp = 'C' AND period = 'pre' THEN n END) AS n_c_pre,
         max(CASE WHEN grp = 'C' AND period = 'post' THEN n END) AS n_c_post
  FROM cells)
SELECT t_pre, t_post, c_pre, c_post,
       n_t_pre, n_t_post, n_c_pre, n_c_post,
       (t_post - t_pre) - (c_post - c_pre) AS did_estimate
FROM w
""",
)
def did_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on mean order value: EUROPE customers
    as the 'treated' group, everyone else as control, 1996-01-01 as the
    intervention date — DiD = (T_post − T_pre) − (C_post − C_pre), the
    workhorse causal estimator when randomization isn't available
    (parallel-trends caveat applies; on this synthetic data the
    estimate should hug zero, which is itself the placebo check).
    Completes the causal family: `ab_test_lift` (randomized),
    `cuped_adjusted_lift` (randomized + variance reduction), DiD
    (observational).

    Determinism: cell means are exact-decimal sums cast once to double
    and divided by exact counts (money_avg policy, unrounded); the DiD
    closed form is three subtractions in fixed order.

    Scale: the three dimension joins broadcast (region/nation/customer
    ladder); orders collapse map-side into 4 cells; the pivot is one
    1-row aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    grp = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "o_totalprice",
            F.when(F.col("r_name") == "EUROPE", "T").otherwise("C").alias("grp"),
            F.when(
                F.col("o_orderdate") >= "1996-01-01 00:00:00", "post"
            )
            .otherwise("pre")
            .alias("period"),
        )
    )
    cells = grp.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(dec2("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "mean_price"
        ),
    )

    def cell(g, p, col):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col(col))
        )

    w = cells.agg(
        cell("T", "pre", "mean_price").alias("t_pre"),
        cell("T", "post", "mean_price").alias("t_post"),
        cell("C", "pre", "mean_price").alias("c_pre"),
        cell("C", "post", "mean_price").alias("c_post"),
        cell("T", "pre", "n").alias("n_t_pre"),
        cell("T", "post", "n").alias("n_t_post"),
        cell("C", "pre", "n").alias("n_c_pre"),
        cell("C", "post", "n").alias("n_c_post"),
    )
    return w.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@query(
    "event_overdispersion",
    oracle="""
WITH uu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u FROM events),
k AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS sk2
  FROM k GROUP BY 1)
SELECT event_type, u AS n_users, n_active, sk AS total_events,
       CAST(sk AS DOUBLE) / CAST(u AS DOUBLE) AS mean_per_user,
       (CAST(sk2 AS DOUBLE)
          - (CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)) / CAST(u AS DOUBLE))
         / CAST(u AS DOUBLE)
         / (CAST(sk AS DOUBLE) / CAST(u AS DOUBLE)) AS dispersion_index
FROM s, uu ORDER BY event_type
""",
)
def event_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion check per event type: the dispersion
    index var(k)/mean(k) of per-user event counts, zero-count users
    included (a user who never errored still counts toward the error
    rate's denominator). Index ≈ 1 means Poisson assumptions (and any
    CI built on them) hold; >1 says counts are clumped (retry storms,
    power users) and a negative-binomial model is needed — the
    diagnostic to run BEFORE trusting `ab_test_lift`-style z-scores on
    count metrics.

    Determinism: the count moments Σk, Σk² are exact BIGINT; zero-count
    users enter only through the global user total (so no dense
    user×type frame is ever built); the variance/mean closed form runs
    in fixed-order double, divisions of exact inputs unrounded.

    Scale: one (type, user) collapse with map-side combine, one
    per-type rollup, one broadcast 1-row distinct-user count."""
    e = load(spark, sf_dir, "events")
    uu = e.agg(F.countDistinct("user_id").cast("long").alias("u"))
    k = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    s = k.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sk2"),
    )
    j = s.join(F.broadcast(uu))
    skd, ud = F.col("sk").cast("double"), F.col("u").cast("double")
    mean = skd / ud
    var = (F.col("sk2").cast("double") - (skd * skd) / ud) / ud
    return j.select(
        "event_type",
        F.col("u").alias("n_users"),
        "n_active",
        F.col("sk").alias("total_events"),
        mean.alias("mean_per_user"),
        (var / mean).alias("dispersion_index"),
    ).orderBy("event_type")


@query(
    "psi_value_drift",
    oracle=f"""
WITH b AS (
  SELECT least(9, CAST(floor(value / 50.0) AS BIGINT)) AS bin,
         sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT_DATE}' THEN 1 ELSE 0 END)
           AS c1,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT_DATE}' THEN 1 ELSE 0 END)
           AS c2
  FROM events GROUP BY 1),
n AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS k
  FROM b),
t AS (
  SELECT bin, CAST(c1 AS BIGINT) AS n1_bin, CAST(c2 AS BIGINT) AS n2_bin,
         CAST(round(
           ((CAST(c1 + 1 AS DOUBLE) / (n1 + k))
              - (CAST(c2 + 1 AS DOUBLE) / (n2 + k)))
           * ln((CAST(c1 + 1 AS DOUBLE) / (n1 + k))
                / (CAST(c2 + 1 AS DOUBLE) / (n2 + k)))
           * 1000000000) AS BIGINT) AS term_nanos
  FROM b, n)
SELECT bin, n1_bin, n2_bin, term_nanos,
       CAST(sum(term_nanos) OVER () AS DOUBLE) / 1000000000.0 AS psi_total
FROM t ORDER BY bin
""",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the first and second half of the window — THE production
    drift monitor for model inputs (rule of thumb: PSI < 0.1 stable,
    0.1-0.25 investigate, > 0.25 retrain). Fixed equal-width bins
    (width 50, clamped at 9) rather than quantile bins: quantile edges
    would themselves drift, and fixed edges are what makes the monitor
    comparable across snapshots. Laplace-smoothed shares (c+1)/(n+k)
    keep empty bins finite and deterministic. Complements
    `ks_two_sample` (hypothesis test) with the thresholded monitoring
    score dashboards actually track.

    Determinism: bin counts are exact integers; each bin's
    (p−q)·ln(p/q) term — the only transcendental — is rounded ONCE into
    integer nanos (the repo rule: ln differs in the last ulp across
    engines), and the total is an exact BIGINT sum over the ≤10-row bin
    frame rendered once to double.

    Scale: one map-side collapse to ≤10 fixed bins; the window runs
    over that bounded frame."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("long")).alias("bin")
    ).agg(
        F.sum(
            F.when(F.col("ts") < _CUPED_SPLIT_DATE, 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(F.col("ts") >= _CUPED_SPLIT_DATE, 1).otherwise(0)
        ).alias("c2"),
    )
    n = b.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + F.col("k"))
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + F.col("k"))
    t = b.join(F.broadcast(n)).select(
        "bin",
        F.col("c1").cast("long").alias("n1_bin"),
        F.col("c2").cast("long").alias("n2_bin"),
        F.round((p - q) * F.log(p / q) * 1000000000)
        .cast("long")
        .alias("term_nanos"),
    )
    from pyspark.sql import Window as _W

    return t.select(
        "bin",
        "n1_bin",
        "n2_bin",
        "term_nanos",
        (
            F.sum("term_nanos").over(
                _W.partitionBy().rowsBetween(
                    _W.unboundedPreceding, _W.unboundedFollowing
                )
            )
            .cast("double")
            / F.lit(1000000000.0)
        ).alias("psi_total"),
    ).orderBy("bin")


@query(
    "customer_feature_matrix",
    oracle="""
WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
c AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS total_spend,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS avg_order_value,
         min(CAST(o_orderdate AS DATE)) AS first_d,
         max(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_urgent
  FROM orders GROUP BY 1)
SELECT o_custkey AS c_custkey, n_orders, total_spend, avg_order_value,
       CAST(date_diff('day', last_d, max_d) AS BIGINT) AS days_since_last,
       CAST(date_diff('day', first_d, last_d) AS BIGINT) AS days_active,
       CASE WHEN n_orders >= 2
            THEN CAST(date_diff('day', first_d, last_d) AS DOUBLE)
                   / (n_orders - 1)
            ELSE NULL END AS avg_gap_days,
       CAST(n_urgent AS DOUBLE) / n_orders AS urgent_rate
FROM c, mx ORDER BY c_custkey
""",
)
def customer_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer feature assembly — the feature-store face of the
    engine: one row per customer with the churn/LTV model inputs
    (order count, exact-decimal lifetime and average spend, recency in
    days against the corpus max date, tenure, mean inter-order gap,
    urgent-priority rate) computed in ONE grouped pass. This is the
    query a training pipeline materializes as a LakeTable and joins to
    labels; every feature here is already audited piecemeal elsewhere
    (rfm_segments, event_interarrival_stats, customer_survival_km) —
    this is the denormalized serving shape.

    Determinism: spends are exact decimal; all rates/gaps are divisions
    of exact inputs (unrounded by policy); dates render as day diffs
    against a broadcast 1-row max.

    Scale: one map-side-combined groupBy over orders plus a broadcast
    scalar — no window, no second shuffle; output is bounded by the
    customer dimension."""
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("max_d"))
    c = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum(dec2("o_totalprice")), 2).cast("double").alias("total_spend"),
        (F.sum(dec2("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_order_value"
        ),
        F.min(F.to_date("o_orderdate")).alias("first_d"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_urgent"),
    )
    j = c.join(F.broadcast(mx))
    return j.select(
        F.col("o_custkey").alias("c_custkey"),
        "n_orders",
        "total_spend",
        "avg_order_value",
        F.datediff("max_d", "last_d").cast("long").alias("days_since_last"),
        F.datediff("last_d", "first_d").cast("long").alias("days_active"),
        F.when(
            F.col("n_orders") >= 2,
            F.datediff("last_d", "first_d").cast("double")
            / (F.col("n_orders") - 1),
        ).alias("avg_gap_days"),
        (F.col("n_urgent").cast("double") / F.col("n_orders")).alias("urgent_rate"),
    ).orderBy("c_custkey")


@query(
    "cohort_ltv_curve",
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS cohort
  FROM orders GROUP BY 1),
sized AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY 1),
rev AS (
  SELECT f.cohort,
         CAST(date_diff('month', f.cohort,
              CAST(date_trunc('month', o.o_orderdate) AS DATE)) AS BIGINT)
           AS age,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS m_rev
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2),
cum AS (
  SELECT cohort, age,
         CAST(round(sum(m_rev) OVER (
           PARTITION BY cohort ORDER BY age), 2) AS DOUBLE) AS cum_revenue
  FROM rev)
SELECT c.cohort, c.age, s.cohort_size, c.cum_revenue,
       c.cum_revenue / s.cohort_size AS ltv_per_customer
FROM cum c JOIN sized s USING (cohort)
WHERE c.age <= 11
ORDER BY c.cohort, c.age
""",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue per cohort tracked over the first 12
    months of age, normalized per cohort member — the VALUE companion
    to `cohort_retention`'s presence matrix (two cohorts can retain
    identically while one monetizes 3x) and the curve a payback-period
    decision reads directly.

    Determinism: monthly cohort revenue is an exact decimal sum; the
    cumulative is a window over the decimal domain rounded once at 2dp;
    per-customer normalization is an exact-input division (unrounded).

    Scale: one broadcast-joinable firsts table (customer dimension),
    one (cohort, age) collapse with map-side combine, and the running
    sum windows over ages WITHIN a cohort (≤ calendar months per
    partition — bounded by construction)."""
    o = load(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.to_date(F.date_trunc("month", "o_orderdate")), F.col("cohort")
            )
            .cast("long")
            .alias("age"),
        )
        .agg(F.sum(dec2("o_totalprice")).alias("m_rev"))
    )
    from pyspark.sql import Window as _W

    cum = rev.select(
        "cohort",
        "age",
        F.round(
            F.sum("m_rev").over(_W.partitionBy("cohort").orderBy("age")), 2
        )
        .cast("double")
        .alias("cum_revenue"),
    )
    return (
        cum.join(F.broadcast(sized), "cohort")
        .filter(F.col("age") <= 11)
        .select(
            "cohort",
            "age",
            "cohort_size",
            "cum_revenue",
            (F.col("cum_revenue") / F.col("cohort_size")).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "age")
    )
