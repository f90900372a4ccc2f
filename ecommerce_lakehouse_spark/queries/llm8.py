"""Training-data curation operators, wave 8 — the statistics/analytics
wave: distribution audits (per-source KL divergence, Benford first-digit
conformance, chi-square independence, per-column Shannon entropy),
robust & resampling statistics (MAD outlier rates, trimmed means, the
Poisson bootstrap, the spend Gini), experimentation (hash-split A/B
readout), time series (exponential smoothing, autocorrelation, CUSUM
change-point, inter-arrival profiles), survival analysis (Kaplan-Meier
with right-censoring), weighted graph distance (bounded-hop
Bellman-Ford), hybrid retrieval (reciprocal rank fusion of BM25 and
embedding rankings), market-basket association rules, and contrastive
training-pair construction.

Cross-engine float rules (SNIPPETS.md / BASELINE.md): ln/log10 are the
only transcendentals — each is rounded ONCE into integer nano-units (or
embedded as a Python-repr literal both engines parse identically) before
any reuse; cross-row accumulation of scores happens in exact BIGINT,
never a float sum whose association order differs between engines;
divisions of exact inputs ride unrounded (IEEE division is
bit-identical); medians/quantiles are SELECTION statistics over running
BIGINT counts; bounded recursions (smoothing, ACF, survival products)
run as ORDERED array folds after map-side collapse, so both engines
execute the identical IEEE op sequence.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ecommerce_lakehouse_spark.operators.scale import iter_barrier, narrow_barrier
from ecommerce_lakehouse_spark.queries import TINY_STAGE_CONFS, query
from ecommerce_lakehouse_spark.tables import load

# ---------------------------------------------------------------------------
# per-source KL divergence vs the corpus unigram distribution
# ---------------------------------------------------------------------------


@query(
    "source_kl_divergence",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c_st
       FROM tok GROUP BY 1, 2),
s_tot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
                 CAST(count(*) AS BIGINT) AS n_distinct
          FROM st GROUP BY 1),
t_tot AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM s_tot),
term AS (
  SELECT st.source,
         st.c_st * CAST(round(ln((CAST(st.c_st AS DOUBLE) * CAST(tot.n AS DOUBLE))
             / (CAST(s_tot.n_s AS DOUBLE) * CAST(t_tot.c_t AS DOUBLE))) * 1e9, 0)
             AS BIGINT) AS contrib_n
  FROM st JOIN s_tot USING (source) JOIN t_tot USING (token) CROSS JOIN tot)
SELECT s_tot.source, s_tot.n_s AS n_tokens, s_tot.n_distinct,
       CAST(k.kl_n AS BIGINT) AS kl_nanos,
       (CAST(k.kl_n AS DOUBLE) / CAST(s_tot.n_s AS DOUBLE)) / 1e9 AS kl_divergence
FROM (SELECT source, sum(contrib_n) AS kl_n FROM term GROUP BY 1) k
JOIN s_tot USING (source)
""",
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram token distribution from the
    corpus-wide distribution: KL(p_source || p_corpus) = Σ_t p_s(t) ·
    ln(p_s(t)/p(t)) — the domain-shift diagnostic behind mixture design
    (a source with near-zero KL adds no distributional diversity; a
    high-KL source shifts the training mix). Complements
    `temperature_mixture_weights` (which reweights by SIZE, blind to
    content) and `dsir_importance_scores` (per-DOC scores against a
    target; this is per-SOURCE against the corpus itself).

    Determinism: the ln argument is built from exact BIGINT counts in a
    fixed operand order — (c_st · N) / (n_s · c_t) — so both engines see
    the identical double; ln is rounded ONCE into nanos; each token's
    contribution c_st · ln_nanos is exact BIGINT arithmetic, and the
    per-source sum is a BIGINT sum (order-independent). Only the final
    normalization divides (IEEE-identical). Every token of every source
    appears in the corpus distribution by construction, so no zero-q
    smoothing is needed.

    Scale: explode collapses immediately into (source, token) partial
    counts — only distinct pairs shuffle; s_tot/t_tot/N derive from that
    collapsed frame (no second corpus scan); the stats joins broadcast
    (sources × vocab is catalog-sized next to the corpus). BIGINT
    headroom: c_st · ln_nanos < 9.2e18 holds while c_st < ~2e9 per
    (source, token); past that, accumulate in DECIMAL(38,0)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c_st")
    )
    s_tot = st.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    t_tot = st.groupBy("token").agg(F.sum("c_st").cast("long").alias("c_t"))
    tot = s_tot.agg(F.sum("n_s").cast("long").alias("n"))
    term = (
        st.join(F.broadcast(s_tot.select("source", "n_s")), "source")
        .join(F.broadcast(t_tot), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                F.col("c_st")
                * F.expr(
                    "CAST(round(ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE))"
                    " / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))) * 1e9, 0)"
                    " AS BIGINT)"
                )
            ).alias("contrib_n"),
        )
    )
    k = term.groupBy("source").agg(F.sum("contrib_n").cast("long").alias("kl_n"))
    return k.join(F.broadcast(s_tot), "source").select(
        "source",
        F.col("n_s").alias("n_tokens"),
        "n_distinct",
        F.col("kl_n").alias("kl_nanos"),
        (
            (F.col("kl_n").cast("double") / F.col("n_s").cast("double"))
            / F.lit(1e9)
        ).alias("kl_divergence"),
    )


# ---------------------------------------------------------------------------
# MAD-based robust outlier rate
# ---------------------------------------------------------------------------


def _freq_median(grouped: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Exact per-group median from a (key, value, cnt) frequency frame:
    running BIGINT count over the DISTINCT values of each group selects
    the one or two middle values; their mean is the median. The window
    partitions by group and runs over distinct values only — bounded by
    the value DOMAIN (2-decimal amounts here), not the row count, which
    is the 'pre-aggregate to (key, value, freq) first' scale recipe
    grouped_median_doclen's docstring names. Returns (key, out, n)."""
    w = (
        Window.partitionBy(key)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(key)
    c = grouped.select(
        key,
        val,
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    mid_lo = ((F.col("n") + 1) / 2).cast("long")
    mid_hi = ((F.col("n") + 2) / 2).cast("long")
    return c.groupBy(key).agg(
        (
            (
                F.min(F.when(F.col("cum") >= mid_lo, F.col(val)))
                + F.min(F.when(F.col("cum") >= mid_hi, F.col(val)))
            )
            / 2.0
        ).alias(out),
        F.max("n").cast("long").alias("n"),
    )


@query(
    "value_mad_outliers",
    oracle="""
WITH c1 AS (
  SELECT event_type, value, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
m1 AS (
  SELECT event_type,
         (min(CASE WHEN cum >= (n + 1) // 2 THEN value END)
          + min(CASE WHEN cum >= (n + 2) // 2 THEN value END)) / 2.0 AS med,
         max(n) AS n
  FROM (SELECT event_type, value,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY value
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM c1)
  GROUP BY 1),
d1 AS (
  SELECT c1.event_type, abs(c1.value - m1.med) AS dev,
         CAST(sum(c1.cnt) AS BIGINT) AS cnt
  FROM c1 JOIN m1 USING (event_type) GROUP BY 1, 2),
m2 AS (
  SELECT event_type,
         (min(CASE WHEN cum >= (n + 1) // 2 THEN dev END)
          + min(CASE WHEN cum >= (n + 2) // 2 THEN dev END)) / 2.0 AS mad
  FROM (SELECT event_type, dev,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM d1)
  GROUP BY 1)
SELECT m1.event_type, CAST(m1.n AS BIGINT) AS n, m1.med AS median_value,
       m2.mad,
       CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_outliers,
       CAST(coalesce(o.n_out, 0) AS DOUBLE) / m1.n AS outlier_rate
FROM m1 JOIN m2 USING (event_type)
LEFT JOIN (
  SELECT c1.event_type, sum(c1.cnt) AS n_out
  FROM c1 JOIN m1 USING (event_type) JOIN m2 USING (event_type)
  WHERE abs(c1.value - m1.med) > 3.0 * m2.mad
  GROUP BY 1) o ON o.event_type = m1.event_type
""",
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier rate via median absolute deviation:
    |value − median| > 3·MAD. The robust complement of
    `value_outlier_rate`'s 3σ z-score — a z-score's mean AND sigma are
    themselves dragged by the outliers being hunted (masking), while
    median/MAD have a 50% breakdown point; the pair is the standard
    before/after for heavy-tailed quality metrics.

    Determinism needs NO rounding anywhere: medians are selections over
    running BIGINT counts (the only float ops are one + and one /2 of
    two selected doubles, IEEE-identical), deviations are single
    subtractions, the 3·MAD threshold is one multiplication, and the
    rate divides two exact integers.

    Scale: everything runs on the (event_type, value) collapsed frame —
    the two median windows partition by type over DISTINCT values, so
    the per-partition bound is the value DOMAIN (2-decimal amounts:
    range-bounded however many raw rows exist), not the table. Raw rows
    shuffle once, into the collapse. The deviation median reuses the
    same collapsed frame joined to 5 broadcast medians."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    c1 = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    c1 = c1.localCheckpoint(eager=False)  # reused by both medians + the rate
    m1 = _freq_median(c1, "event_type", "value", "med")
    d1 = (
        c1.join(F.broadcast(m1.select("event_type", "med")), "event_type")
        .groupBy("event_type", F.abs(F.col("value") - F.col("med")).alias("dev"))
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    m2 = _freq_median(d1, "event_type", "dev", "mad").select("event_type", "mad")
    base = m1.join(m2, "event_type")
    out = (
        c1.join(F.broadcast(base), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3.0 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("n_out"))
    )
    return base.join(out, "event_type", "left").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("med").alias("median_value"),
        "mad",
        F.coalesce("n_out", F.lit(0)).cast("long").alias("n_outliers"),
        (
            F.coalesce("n_out", F.lit(0)).cast("double") / F.col("n")
        ).alias("outlier_rate"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d) embedded as Python-repr shortest round-trip literals so
# both engines parse the identical double — no engine evaluates log10.
_BENFORD = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}
def _benford_case(col: str) -> str:
    return (
        f"CASE {col} "
        + " ".join(
            f"WHEN {d} THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items()
        )
        + " END"
    )


_BENFORD_CASE = _benford_case("digit")


@query(
    "benford_first_digit",
    oracle=f"""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM cents GROUP BY 1),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
spine AS (SELECT unnest(range(1, 10)) AS digit)
SELECT CAST(spine.digit AS INT) AS digit,
       CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
       CAST(coalesce(obs.n_obs, 0) AS DOUBLE) / tot.n AS obs_share,
       {_benford_case("spine.digit")} AS benford_share,
       (CAST(coalesce(obs.n_obs, 0) AS DOUBLE) / tot.n) / ({_benford_case("spine.digit")})
         AS share_ratio
FROM spine LEFT JOIN obs ON obs.digit = spine.digit CROSS JOIN tot
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order amounts: the
    observed digit distribution of o_totalprice against log10(1+1/d) —
    the classic fabricated-or-truncated-data screen for money columns
    (synthetic generators and capped fields bend the curve; organic
    multiplicative amounts follow it).

    Determinism: amounts become exact integer CENTS once (round of an
    IEEE-identical multiply); the first digit comes from the INTEGER's
    decimal rendering (integer→string is unambiguous in both engines —
    never render a double, whose formatting is engine-specific, and
    never floor(log10(x)), whose last-ulp can misplace exact powers of
    ten); the Benford shares are Python-repr literals both engines parse
    to the identical double, so shares and ratios are bit-exact. Output
    is one row PER DIGIT — no cross-row float sum (a chi-square scalar
    would sum 9 doubles in engine-dependent order; the per-digit ratios
    carry the same information exactly).

    Scale: one map-side digit extraction, a 9-group aggregate, a 1-row
    total broadcast back, and a 9-row literal spine outer join so absent
    digits report 0 rather than vanishing."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    obs = (
        o.select(
            F.substring(
                F.expr("CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS STRING)"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    return (
        spine.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            (F.coalesce("n_obs", F.lit(0)).cast("double") / F.col("n")).alias(
                "obs_share"
            ),
            F.expr(_BENFORD_CASE).alias("benford_share"),
            (
                (F.coalesce("n_obs", F.lit(0)).cast("double") / F.col("n"))
                / F.expr(_BENFORD_CASE)
            ).alias("share_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# reciprocal-rank-fusion hybrid retrieval (BM25 x embedding KNN)
# ---------------------------------------------------------------------------

from ecommerce_lakehouse_spark.queries import ORACLES as _ORACLES  # noqa: E402

_RRF_K = 60  # the standard Cormack/Clarke fusion constant
_RRF_TOPN = 20


def _rrf_oracle() -> str:
    return f"""
WITH lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25_nanos DESC, doc_id) AS INT)
           AS lex_rank
  FROM ({_ORACLES["bm25_search"]})),
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
              'sum')) AS nrm
  FROM embeddings),
q AS (SELECT emb, nrm FROM v WHERE vec_id = 0),
sim AS (
  SELECT c.vec_id AS doc_id,
         list_aggregate(list_transform(range(1, len(q.emb) + 1),
                                       i -> q.emb[i] * c.emb[i]), 'sum')
           / (q.nrm * c.nrm) AS sim
  FROM v c CROSS JOIN q WHERE c.vec_id != 0),
sem AS (
  SELECT doc_id, CAST(rn AS INT) AS sem_rank
  FROM (SELECT doc_id,
               row_number() OVER (ORDER BY sim DESC, doc_id) AS rn
        FROM sim)
  WHERE rn <= {_RRF_TOPN})
SELECT CAST(coalesce(lex.doc_id, sem.doc_id) AS BIGINT) AS doc_id,
       lex.lex_rank, sem.sem_rank,
       coalesce(1.0 / (CAST({_RRF_K} AS DOUBLE) + lex.lex_rank), CAST(0 AS DOUBLE))
         + coalesce(1.0 / (CAST({_RRF_K} AS DOUBLE) + sem.sem_rank), CAST(0 AS DOUBLE))
         AS rrf_score
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
"""


@query("rrf_hybrid_search", oracle=_rrf_oracle())
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion (Cormack, Clarke &
    Buettcher 2009, k=60): fuse the top-20 LEXICAL ranking
    (`bm25_search`'s fixed 3-term query) with the top-20 SEMANTIC
    ranking (cosine against the embedding of doc 0 — vec_id ≡ doc_id by
    the testdata's id convention) as Σ 1/(k + rank), ranks missing from
    a list contributing 0. RRF is the production hybrid-search default
    (Elasticsearch/Vespa/Azure AI Search) precisely because it composes
    incomparable score scales using only ranks — which also makes it
    cross-engine exact: ranks are integers, each reciprocal is one IEEE
    division, and the fusion adds two such doubles in written order.

    Scale: both constituent rankings end in TakeOrdered top-20 (the
    BM25 plan is documented at `bm25_search`; the cosine scan is one
    broadcast-query pass like `embedding_knn_bruteforce`) — the only
    windows run over the ≤20-row fused frames, bounded by construction.
    The fusion itself is a full outer join of two 20-row lists."""
    from ecommerce_lakehouse_spark.queries.llm7 import bm25_search

    # these two empty-partition windows run over <=20-row top-k frames
    # (bounded by the upstream LIMITs) — the allowed class; the runtime
    # `WindowExec: No Partition Defined` warning they log is expected
    # and cosmetic, not a scale risk
    w_lex = Window.orderBy(F.desc("bm25_nanos"), "doc_id")
    lex = bm25_search(spark, sf_dir).select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("lex_rank")
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sq = F.aggregate(
        F.transform("emb", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    withn = e.withColumn("nrm", F.sqrt(sq))
    qv = withn.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    topsem = (
        withn.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot / (F.col("q_nrm") * F.col("nrm"))).alias("sim"),
        )
        .orderBy(F.desc("sim"), "doc_id")
        .limit(_RRF_TOPN)
    )
    w_sem = Window.orderBy(F.desc("sim"), "doc_id")
    sem = topsem.select(
        "doc_id", F.row_number().over(w_sem).cast("int").alias("sem_rank")
    )
    rk = F.lit(float(_RRF_K))
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(
                    F.lit(1.0) / (rk + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (rk + F.col("sem_rank")), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# bounded-hop weighted shortest paths (Bellman-Ford rounds)
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 4


def _sssp_oracle() -> str:
    """Unrolled Bellman-Ford relaxation rounds; every multi-referenced
    CTE is MATERIALIZED (plain CTEs inline, re-evaluating the edge build
    2^rounds times — the measured >80 GB spill from the BFS oracle)."""
    parts = []
    for k in range(1, _SSSP_ROUNDS + 1):
        parts.append(
            f"d{k} AS MATERIALIZED (\n"
            f"  SELECT node, min(dist) AS dist FROM (\n"
            f"    SELECT node, dist FROM d{k-1}\n"
            f"    UNION ALL\n"
            f"    SELECT e.d AS node, d{k-1}.dist + e.w AS dist\n"
            f"    FROM edges e JOIN d{k-1} ON e.s = d{k-1}.node)\n"
            f"  GROUP BY 1)"
        )
    last = f"d{_SSSP_ROUNDS}"
    return (
        """
WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS s, b.l_partkey AS d,
         CAST((100 + count(*) - 1) // count(*) AS BIGINT) AS w
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
edges AS MATERIALIZED (
  SELECT s, d, w FROM pr UNION ALL SELECT d, s, w FROM pr),
d0 AS MATERIALIZED (
  SELECT min(s) AS node, CAST(0 AS BIGINT) AS dist FROM edges),
"""
        + ",\n".join(parts)
        + f""",
nr AS (SELECT CAST(count(*) AS BIGINT) AS n_reached FROM {last})
SELECT CAST(node AS BIGINT) AS node, dist, n_reached
FROM {last} CROSS JOIN nr
ORDER BY dist, node LIMIT 20
"""
    )


@query("sssp_copurchase", oracle=_sssp_oracle())
def sssp_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop weighted shortest paths (Bellman-Ford, 4 relaxation
    rounds) from the minimum part key over the co-purchase graph, edge
    cost = ceil(100 / co-purchase support) — strong associations are
    cheap to traverse, so the 20 nearest parts are the "association
    neighborhood" ranked by path strength, not hop count. The weighted
    companion of `bfs_hops_copurchase` (hops) and the distance member of
    the graph family (pagerank = importance, triangles = density,
    neardup_clusters = components). The K-round contract is explicit:
    dist(v) = cheapest path using ≤ K edges — deterministic whether or
    not K reaches the graph's diameter.

    Determinism: supports, weights, and distances are all exact BIGINT
    (ceil division is (100 + n − 1) DIV n); min() needs no tiebreak.

    Scale: each round joins EDGES to the CURRENT distance frontier and
    folds with a groupBy-min — never an all-pairs product; the distance
    table is broadcast per round (node ids + one BIGINT: catalog-sized;
    swap for a shuffle join past broadcast limits); per-round
    localCheckpoint truncates lineage, without which round k re-executes
    the whole edge build k times (measured on pagerank_copurchase).
    Edge weights come from the in-row pair expansion + one groupBy —
    one shuffle, no self-join."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    # pair expansion as chained Generate operators (posexplode then
    # explode of the tail slice) rather than a flatten(transform(...))
    # lambda tree: generators pipeline row-by-row while the lambda form
    # materializes each basket's full C(w,2) struct array before the
    # explode (the graph_ml/frequent_triple rewrite, measured 8x there)
    p1 = per_order.select("parts", F.posexplode("parts").alias("i", "s"))
    p2 = p1.select(
        "s", F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias("d")
    )
    # r10: one action for the whole bounded-round relaxation — all
    # barriers LAZY (each round's distance RDD still computes once,
    # shared via the checkpoint cache), removing the per-round eager
    # jobs and driver syncs; the fixed round budget bounds the plan.
    pr = (
        p2.groupBy("s", "d")
        .agg(
            F.expr("CAST((100 + count(1) - 1) DIV count(1) AS BIGINT)").alias("w")
        )
        .transform(lambda d: iter_barrier(d, eager=False))
    )
    edges = pr.union(pr.select(F.col("d").alias("s"), F.col("s").alias("d"), "w"))
    dist = (
        edges.agg(F.min("s").alias("node"))
        .withColumn("dist", F.lit(0).cast("long"))
        .transform(lambda d: narrow_barrier(d, eager=False))
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            edges.join(
                F.broadcast(dist.select(F.col("node").alias("s"), "dist")), "s"
            )
            .select(F.col("d").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .transform(lambda d: narrow_barrier(d, eager=False))
        )
    nr = dist.agg(F.count(F.lit(1)).cast("long").alias("n_reached"))
    return (
        dist.crossJoin(F.broadcast(nr))
        .select(F.col("node").cast("long").alias("node"), "dist", "n_reached")
        .orderBy("dist", "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap of the mean (hash-seeded, resample-free)
# ---------------------------------------------------------------------------

_BOOT_B = 32

# Poisson(1) CDF as shortest-round-trip literals (both engines parse the
# identical doubles; no engine ever evaluates exp()). Inverse-CDF lookup
# caps the weight at 10 (P(X > 9) < 1.2e-7).
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
    "0.999998874797402",
    "0.9999998885745216",
)


def _pois_w(u: str) -> str:
    """Inverse Poisson(1) CDF of a (0,1) uniform, as a CASE ladder."""
    return (
        "CASE "
        + " ".join(
            f"WHEN {u} < CAST({c} AS DOUBLE) THEN {k}"
            for k, c in enumerate(_POIS_CDF)
        )
        + " ELSE 10 END"
    )


_BOOT_U = (
    "(CAST({h} AS BIGINT) + 0.5) / 1152921504606846976.0"
)


@query(
    "bootstrap_mean_ci",
    oracle=f"""
WITH fan AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price, r
  FROM orders CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)),
wtd AS (
  SELECT r, price,
         {_pois_w(_BOOT_U.format(h="('0x' || substr(md5('boot|' || CAST(r AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT"))}
           AS w
  FROM fan),
reps AS (
  SELECT CAST(r AS INT) AS replicate,
         CAST(sum(w) AS BIGINT) AS n_eff,
         CAST(CAST(sum(CAST(w AS DECIMAL(2,0)) * price) AS DOUBLE)
              / sum(w) AS DOUBLE) AS mean_value
  FROM wtd GROUP BY r),
point AS (
  SELECT CAST(0 AS INT) AS replicate,
         CAST(count(*) AS BIGINT) AS n_eff,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              / count(*) AS DOUBLE) AS mean_value
  FROM orders)
SELECT * FROM point UNION ALL SELECT * FROM reps
""",
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of mean order value (Chamandy et al. 2012,
    Google's resample-free bootstrap): instead of materializing B
    resamples, each row contributes a hash-seeded Poisson(1) weight to
    each of B=32 replicates in ONE pass — replicate means' spread IS the
    sampling distribution of the mean, the uncertainty quantification
    every corpus metric should ship with. Replicate 0 is the point
    estimate.

    Determinism: the uniform is the house (md5+0.5)/2^60 convention
    keyed 'boot|replicate|orderkey' (same draw on every engine, retry,
    and ingest order); the inverse-CDF ladder compares against
    Poisson(1) CDF repr literals (no engine evaluates exp); weighted
    sums are exact DECIMAL(18,2)·DECIMAL(2,0) products (weight ≤ 10 —
    one digit, so the product precision stays well under 38 and the
    scale is preserved; see the long×decimal precision-loss trap in
    BASELINE.md); each mean is one exact-input IEEE division.

    Scale: the B-way explode multiplies CPU, not shuffle — partial
    aggregation collapses every task to ≤ B rows before the exchange,
    so the wire carries B·partitions tiny rows however big the table
    is. (The explode can be rewritten as B parallel agg columns +
    unpivot to also skip the CPU fan-out; at B=32 the explode is
    clearer and the hash dominates either way.)"""
    # The slim (key, price) spine is repartitioned before the fan-out:
    # the B x md5 work is the whole cost of this query, and a small-SF
    # single-file parquet scan would otherwise run it in ONE task
    # (measured 8.4 s -> 1.7 s at sf0.1). The shuffle moves ~16 bytes/row
    # once; on a many-split cluster scan it is harmless.
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    ).repartition(32)
    fan = o.select(
        "o_orderkey",
        "price",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("r"),
    )
    h = (
        "CAST(conv(substr(md5(concat('boot|', CAST(r AS STRING), '|',"
        " CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    wtd = fan.select(
        "r", "price", F.expr(_pois_w(_BOOT_U.format(h=h))).alias("w")
    )
    reps = wtd.groupBy("r").agg(
        F.sum("w").cast("long").alias("n_eff"),
        (
            F.sum(F.col("w").cast("decimal(2,0)") * F.col("price"))
            .cast("double")
            / F.sum("w")
        ).cast("double").alias("mean_value"),
    ).select(F.col("r").cast("int").alias("replicate"), "n_eff", "mean_value")
    point = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_eff"),
        (F.sum("price").cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("mean_value"),
    ).select(F.lit(0).cast("int").alias("replicate"), "n_eff", "mean_value")
    return point.unionByName(reps)


# ---------------------------------------------------------------------------
# chi-square independence cross-tab
# ---------------------------------------------------------------------------


@query(
    "priority_status_independence",
    oracle="""
WITH obs AS (
  SELECT o_orderpriority AS priority, o_orderstatus AS status,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1, 2),
rm AS (SELECT priority, CAST(sum(n_obs) AS BIGINT) AS n_row FROM obs GROUP BY 1),
cm AS (SELECT status, CAST(sum(n_obs) AS BIGINT) AS n_col FROM obs GROUP BY 1),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
SELECT obs.priority, obs.status, obs.n_obs,
       CAST(rm.n_row * cm.n_col AS DOUBLE) / tot.n AS expected,
       (obs.n_obs - CAST(rm.n_row * cm.n_col AS DOUBLE) / tot.n)
         * (obs.n_obs - CAST(rm.n_row * cm.n_col AS DOUBLE) / tot.n)
         / (CAST(rm.n_row * cm.n_col AS DOUBLE) / tot.n) AS chi2_term
FROM obs JOIN rm USING (priority) JOIN cm USING (status) CROSS JOIN tot
""",
)
def priority_status_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cross-tab of order priority × status: each
    cell's observed count, expected count under independence
    (row·col/N), and chi-square contribution — the categorical-drift /
    association screen (a training-data pipeline runs the same shape
    over source × language, split × label, ...). Per-CELL output keeps
    everything cross-engine exact: margins are BIGINT, row·col stays
    integer-exact, expected is one IEEE division, and the contribution
    is the same three fixed-order float ops in both engines — summing
    the terms into one chi-square scalar would instead add doubles in
    engine-dependent order (the reader can sum the ≤|priorities×statuses|
    terms; the decision threshold is theirs anyway).

    Scale: one grouped count of the fact table (map-side combined);
    margins derive from the tiny cell table, never a second scan; all
    joins broadcast."""
    o = load(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    obs = obs.localCheckpoint(eager=False)  # margins + cells reuse it
    rm = obs.groupBy("priority").agg(F.sum("n_obs").cast("long").alias("n_row"))
    cm = obs.groupBy("status").agg(F.sum("n_obs").cast("long").alias("n_col"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    exp = F.expr("CAST(n_row * n_col AS DOUBLE) / n")
    return (
        obs.join(F.broadcast(rm), "priority")
        .join(F.broadcast(cm), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            "status",
            "n_obs",
            exp.alias("expected"),
            (
                (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# trimmed (winsorized-tail) mean
# ---------------------------------------------------------------------------


@query(
    "value_trimmed_mean",
    oracle="""
WITH c1 AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT event_type, cents, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM c1),
inc AS (
  SELECT event_type, cents, cnt, cum, n, n * 5 // 100 AS trim,
         greatest(CAST(0 AS BIGINT),
                  least(cum, n - (n * 5 // 100))
                  - greatest(cum - cnt, n * 5 // 100)) AS took
  FROM r)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(trim) AS BIGINT) AS n_trimmed_each_side,
       (CAST(sum(cents * took) AS DOUBLE) / (max(n) - 2 * max(trim))) / 100.0
         AS trimmed_mean,
       (CAST(sum(cents * cnt) AS DOUBLE) / max(n)) / 100.0 AS raw_mean
FROM inc GROUP BY 1
""",
)
def value_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-per-tail trimmed mean of event values per type, next to the raw
    mean — the robust location estimate between `value_mad_outliers`
    (detection) and a plain average (contamination-blind): how much do
    the tails move the number? Values are cent-quantized by contract
    (the testdata's are exactly 2dp; the round is a no-op there and the
    documented contract elsewhere), so every sum is exact BIGINT
    cents·count arithmetic — no float sums at all, and the two means
    are fixed-order divisions of exact integers.

    Trim semantics: drop exactly floor(0.05·n) rows from each end of
    the per-type order; a boundary VALUE's multiplicity is taken
    partially (took = overlap of the value's [cum−cnt, cum] rank span
    with the kept [trim, n−trim] span) — exact row semantics on a
    collapsed table.

    Scale: identical shape to value_mad_outliers — one collapse shuffle,
    then windows over DISTINCT (type, cents) rows, bounded by the value
    domain, not the row count."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        )
    )
    c1 = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    r = c1.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    trim = (F.col("n") * 5 / 100).cast("long")
    took = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - trim)
        - F.greatest(F.col("cum") - F.col("cnt"), trim),
    )
    inc = r.select(
        "event_type", "cents", "cnt", "n", trim.alias("trim"), took.alias("took")
    )
    return inc.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("trim").cast("long").alias("n_trimmed_each_side"),
        (
            (
                F.sum(F.col("cents") * F.col("took")).cast("double")
                / (F.max("n") - 2 * F.max("trim"))
            )
            / 100.0
        ).alias("trimmed_mean"),
        (
            (F.sum(F.col("cents") * F.col("cnt")).cast("double") / F.max("n"))
            / 100.0
        ).alias("raw_mean"),
    )


# ---------------------------------------------------------------------------
# exponential smoothing over the monthly revenue series
# ---------------------------------------------------------------------------

_SES_ALPHA = "0.3"  # literal in both engines


@query(
    "exp_smoothing_revenue",
    oracle=f"""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1),
arr AS (
  SELECT list_transform(
           list_sort(list({{'month': month, 'rev': revenue}})),
           x -> {{'month': x.month, 'rev': x.rev, 's': x.rev}}) AS a
  FROM m),
folded AS (
  SELECT list_reduce(
           list_transform(a, x -> [x]),
           (acc, e) -> list_append(acc,
             {{'month': e[1].month, 'rev': e[1].rev,
               's': CAST({_SES_ALPHA} AS DOUBLE) * e[1].rev
                    + (1.0 - CAST({_SES_ALPHA} AS DOUBLE)) * acc[-1].s}})) AS a
  FROM arr)
SELECT u.month, u.rev AS revenue, u.s AS smoothed
FROM (SELECT unnest(a) AS u FROM folded)
""",
)
def exp_smoothing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (alpha = 0.3) over the monthly
    revenue series: s_1 = x_1, s_t = alpha·x_t + (1−alpha)·s_{t−1} — the
    level component every operational forecast starts from (s_T is the
    one-step-ahead forecast), and the missing member of the time-series
    family next to `monthly_revenue_growth` (derivative),
    `rolling_7day_revenue` (uniform window) and `sax_series_profile`
    (symbolic shape).

    Determinism: a recursion is order-dependent by nature, so it runs as
    ONE array fold over the month-sorted series — both engines execute
    the identical sequence of IEEE multiply-adds (alpha is a shared
    literal; monthly revenues are exact-decimal sums cast once), so the
    smoothed values agree bit-for-bit with no rounding.

    Scale: the corpus collapses map-side to one exact-decimal row per
    MONTH; only the ~months-long array is folded (driver-free, inside
    one task) — the standard big-data shape for any bounded recursion:
    reduce to the bounded series first, then recurse inside a row."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue")
    )
    arr = m.agg(
        F.sort_array(F.collect_list(F.struct("month", "revenue"))).alias("a")
    )
    a = _SES_ALPHA
    folded = arr.select(
        F.expr(
            f"""
aggregate(
  slice(a, 2, size(a) - 1),
  array(struct(a[0].month AS month, a[0].revenue AS rev,
               a[0].revenue AS s)),
  (acc, x) -> concat(acc, array(struct(
    x.month AS month, x.revenue AS rev,
    CAST({a} AS DOUBLE) * x.revenue
      + (1.0 - CAST({a} AS DOUBLE)) * element_at(acc, -1).s AS s))))
""".strip()
        ).alias("a")
    )
    u = folded.select(F.explode("a").alias("u"))
    return u.select(
        F.col("u.month").alias("month"),
        F.col("u.rev").alias("revenue"),
        F.col("u.s").alias("smoothed"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer lifetime spend
# ---------------------------------------------------------------------------


@query(
    "customer_spend_gini",
    oracle="""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i
  FROM s),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS tot,
         CAST(sum(i * cents) AS BIGINT) AS wsum
  FROM r)
SELECT n AS n_customers,
       CAST(tot AS DOUBLE) / 100.0 AS total_spend,
       (2.0 * wsum) / (CAST(n AS DOUBLE) * tot)
         - (CAST(n + 1 AS DOUBLE) / n) AS gini
FROM agg
""",
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend — the inequality
    single-number behind `customer_spend_deciles`' distribution view
    (and the whale-dependence metric: revenue Gini near 1 = a few
    customers carry the business; the same statistic audits token-count
    concentration across corpus sources). Computed by the rank formula
    G = 2·Σ i·x_i / (n·Σx) − (n+1)/n over spends sorted ascending.

    Determinism: spends are exact-decimal sums turned integer CENTS; the
    global rank is total-ordered with a custkey tiebreak; Σ i·x_i and Σx
    are exact BIGINT sums, so the final two divisions and one
    subtraction are the only float ops, in identical order. BIGINT
    headroom: Σ i·cents < 9.2e18 holds to ~10M customers at these spend
    levels; swap the two sums to DECIMAL(38,0) beyond.

    Scale: the global rank uses operators/scale.py's
    bucketed_global_row_number (fixed-width bucket counts → broadcast
    prefix offsets → per-bucket row_number) — no single-partition
    window anywhere, per the registry-wide plan guard."""
    from ecommerce_lakehouse_spark.operators.scale import (
        bucketed_global_row_number,
    )

    s = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    r = bucketed_global_row_number(
        s,
        sort_value=F.col("cents"),
        order_cols=[F.asc("cents"), F.asc("o_custkey")],
        rn_col="i",
        n_col="n_total",
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("wsum"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        (F.col("tot").cast("double") / 100.0).alias("total_spend"),
        (
            (2.0 * F.col("wsum")) / (F.col("n").cast("double") * F.col("tot"))
            - (F.col("n") + 1).cast("double") / F.col("n")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# association rules over the co-purchase pairs
# ---------------------------------------------------------------------------


@query(
    "basket_association_rules",
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_ord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lp),
item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM lp GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
top AS (
  SELECT * FROM pair ORDER BY c_ab DESC, part_a, part_b LIMIT 20)
SELECT t.part_a, t.part_b, t.c_ab AS n_both,
       ia.c AS n_a, ib.c AS n_b,
       CAST(t.c_ab AS DOUBLE) / ia.c AS confidence_ab,
       CAST(t.c_ab AS DOUBLE) / ib.c AS confidence_ba,
       (CAST(n_ord.n AS DOUBLE) * t.c_ab) / (CAST(ia.c AS DOUBLE) * ib.c)
         AS lift
FROM top t JOIN item ia ON t.part_a = ia.l_partkey
           JOIN item ib ON t.part_b = ib.l_partkey
           CROSS JOIN n_ord
""",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics for the 20 most co-purchased part pairs:
    support counts, both directed confidences, and lift = N·c_ab/(c_a·c_b)
    (Agrawal & Srikant's Apriori output stage) — `part_cooccurrence`
    surfaces WHICH pairs co-occur; this scores whether each pair
    co-occurs MORE than its items' popularity predicts (lift > 1), the
    number a recommender actually thresholds on.

    Determinism: all three supports are exact BIGINT counts; confidences
    and lift are fixed-order arithmetic on exact inputs — no rounding.

    Scale: pair supports reuse the in-row sorted-set expansion (one
    shuffle, no self-join); top-20 is TakeOrdered; item supports join
    onto 20 rows broadcast-side. The oracle's a<b self-join form is the
    relational statement of the same pair set."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lp = li.distinct().localCheckpoint(eager=False)  # reused 3x
    n_ord = lp.agg(F.countDistinct("l_orderkey").cast("long").alias("n"))
    item = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    per_order = lp.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(parts, (x, i) -> "
            "transform(slice(parts, i + 2, size(parts)), "
            "y -> struct(x AS s, y AS d))))"
        )
    ).alias("p")
    top = (
        per_order.select(pair)
        .groupBy(F.col("p.s").alias("part_a"), F.col("p.d").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(20)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("n_b"))
    return (
        top.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("n_both").cast("double") / F.col("n_a")).alias(
                "confidence_ab"
            ),
            (F.col("n_both").cast("double") / F.col("n_b")).alias(
                "confidence_ba"
            ),
            (
                (F.col("n").cast("double") * F.col("n_both"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# inter-arrival time statistics per event type
# ---------------------------------------------------------------------------


@query(
    "event_interarrival_stats",
    oracle="""
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS gap
  FROM events),
c1 AS (
  SELECT event_type, gap, CAST(count(*) AS BIGINT) AS cnt
  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT event_type, gap, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY gap
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM c1)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(sum(gap * cnt) AS DOUBLE) / max(n) AS mean_gap_s,
       (min(CASE WHEN cum >= (n + 1) // 2 THEN gap END)
        + min(CASE WHEN cum >= (n + 2) // 2 THEN gap END)) / 2.0
         AS median_gap_s,
       CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap END) AS BIGINT)
         AS p90_gap_s
FROM r GROUP BY 1
""",
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: gaps between a
    user's consecutive events of the same type, reduced to mean, exact
    median, and exact p90 (rank-ceil semantics) — the temporal-behavior
    profile behind session-timeout tuning (is 30 min the right gap?),
    bot detection (machine-regular gaps), and arrival-process modeling.

    Determinism: gaps are exact BIGINT second-floored epoch differences
    (the user_session_stats convention — Spark long cast ≡ DuckDB
    epoch()); the mean divides two exact integers; median and p90 are
    SELECTIONS over running BIGINT counts (p90 = the value at rank
    ceil(0.9·n), integer arithmetic (9n+9) DIV 10) — the only float op
    is the median's halving of two selected integers.

    Scale: the lag window partitions by (user, type) — per-user sorted
    streams, one shuffle; gaps then collapse to (type, gap) frequency
    rows, so the quantile windows run over the gap DOMAIN (bounded by
    the observation window in seconds), not the event count."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    g = e.select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    c1 = g.groupBy("event_type", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    r = c1.select(
        "event_type",
        "gap",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    mid_lo = ((F.col("n") + 1) / 2).cast("long")
    mid_hi = ((F.col("n") + 2) / 2).cast("long")
    p90_rank = ((9 * F.col("n") + 9) / 10).cast("long")
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        (
            F.sum(F.col("gap") * F.col("cnt")).cast("double") / F.max("n")
        ).alias("mean_gap_s"),
        (
            (
                F.min(F.when(F.col("cum") >= mid_lo, F.col("gap")))
                + F.min(F.when(F.col("cum") >= mid_hi, F.col("gap")))
            )
            / 2.0
        ).alias("median_gap_s"),
        F.min(F.when(F.col("cum") >= p90_rank, F.col("gap")))
        .cast("long")
        .alias("p90_gap_s"),
    )


# ---------------------------------------------------------------------------
# A/B test analysis over a deterministic hash split
# ---------------------------------------------------------------------------


@query(
    "ab_test_lift",
    oracle="""
WITH u AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM u GROUP BY 1),
w AS (
  SELECT max(CASE WHEN arm = 'A' THEN n_users END) AS na,
         max(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
         max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
         max(CASE WHEN arm = 'B' THEN n_converted END) AS cb
  FROM arms)
SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
       CAST(ca AS DOUBLE) / na AS rate_a,
       CAST(cb AS DOUBLE) / nb AS rate_b,
       (CAST(cb AS DOUBLE) / nb) / (CAST(ca AS DOUBLE) / na) - 1.0
         AS relative_lift,
       ((CAST(cb AS DOUBLE) / nb) - (CAST(ca AS DOUBLE) / na))
         / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 / na + 1.0 / nb)) AS z_score
FROM w
""",
)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B analysis over a deterministic hash split of the
    user base: arm = md5(user)%2, conversion = ever made a purchase with value > 150; reports
    per-arm rates, relative lift, and the pooled two-proportion z-score
    — experiment readout as a query (and, on a null split like this
    one, an A/A test: |z| should be small, which is itself the check
    that the hash splitter is unbiased).

    Determinism: arm assignment is the salted-md5 split convention
    (reproducible across engines/retries/ingest order); counts are exact
    BIGINT; rates/lift/z are a fixed-order chain of IEEE ops (sqrt is
    IEEE-exact) on exact inputs — no rounding anywhere.

    Scale: one grouped pass per user (map-side combined max), a 4-group
    aggregate, then a 1-row pivot; nothing else moves."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id",
        F.expr(
            "CASE WHEN conv(substr(md5(concat('ab|', CAST(user_id AS STRING))),"
            " 1, 8), 16, 10) % 2 = 0 THEN 'A' ELSE 'B' END"
        ).alias("arm"),
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150.0), 1
            ).otherwise(0)
        ).alias("converted")
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    return w.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (rb / ra - 1.0).alias("relative_lift"),
        (
            (rb - ra)
            / F.sqrt(
                pooled
                * (1.0 - pooled)
                * (1.0 / F.col("na") + 1.0 / F.col("nb"))
            )
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Shannon entropy profile of the categorical columns
# ---------------------------------------------------------------------------

_ENTROPY_COLS = (
    ("orders", "o_orderpriority"),
    ("orders", "o_orderstatus"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
)


def _entropy_oracle() -> str:
    parts = []
    for tbl, col in _ENTROPY_COLS:
        parts.append(
            f"""
SELECT '{tbl}.{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(-sum(c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0)
                          AS BIGINT)) AS BIGINT) AS ent_sum_n,
       CAST(-sum(c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0)
                          AS BIGINT)) AS DOUBLE) / sum(c) / 1e9 AS entropy_nats
FROM (SELECT c, sum(c) OVER () AS n
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM {tbl} GROUP BY {col}))
"""
        )
    return "\nUNION ALL\n".join(parts)


@query("column_entropy_profile", oracle=_entropy_oracle())
def column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of every low-cardinality categorical column
    — the one-number distribution fingerprint that drift monitoring
    diffs across batches (an entropy drop means a value started
    dominating; a rise means new values appeared). Profiles priority,
    status, event type, language, and source in one result.

    Determinism: per-value ln(p) is nano-rounded once from a
    fixed-operand-order exact division; the Σ c·ln_nano accumulates in
    BIGINT; the final normalization is two IEEE divisions. (The oracle's
    OVER () total runs over the handful of DISTINCT values, not rows.)

    Scale: each column costs one map-side-combined grouped count; the
    entropy reduction runs over the value domain (constant-ish). The
    five frames union into one result — one job, five tiny aggregates."""
    out = None
    for tbl, col in _ENTROPY_COLS:
        c = (
            load(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        tot = c.agg(F.sum("c").cast("long").alias("n"))
        ent = (
            c.crossJoin(F.broadcast(tot))
            .select(
                F.col("c"),
                F.col("n"),
                (
                    F.col("c")
                    * F.expr(
                        "CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
                        " * 1e9, 0) AS BIGINT)"
                    )
                ).alias("term"),
            )
            .agg(
                F.lit(f"{tbl}.{col}").alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum("c").cast("long").alias("n_rows"),
                (-F.sum("term")).cast("long").alias("ent_sum_n"),
                (
                    (-F.sum("term")).cast("double") / F.sum("c") / F.lit(1e9)
                ).alias("entropy_nats"),
            )
        )
        out = ent if out is None else out.unionByName(ent)
    return out


# ---------------------------------------------------------------------------
# autocorrelation of the monthly revenue series
# ---------------------------------------------------------------------------

_ACF_LAGS = 3


def _acf_oracle() -> str:
    lag_rows = []
    for k in range(0, _ACF_LAGS + 1):
        lag_rows.append(
            f"""
SELECT {k} AS lag, n,
       list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, n - {k} + 1),
                          i -> (a[i] - mu) * (a[i + {k}] - mu))),
         (s, x) -> s + x) / denom AS acf
FROM base"""
        )
    return (
        """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1),
arr AS (
  SELECT list_transform(list_sort(list({'month': month, 'rev': revenue})),
                        x -> x.rev) AS a
  FROM m),
mean AS (
  SELECT a, len(a) AS n,
         list_reduce(a, (s, x) -> s + x) / len(a) AS mu
  FROM arr),
base AS (
  SELECT a, n, mu,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(a, x -> (x - mu) * (x - mu))),
           (s, x) -> s + x) AS denom
  FROM mean)"""
        + "\nUNION ALL".join(lag_rows)
    )


@query("revenue_autocorrelation", oracle=_acf_oracle())
def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of monthly revenue at lags 0-3 (lag 0 = 1 by
    construction — the self-check row): is this series momentum, noise,
    or seasonality? The diagnostic that decides whether
    `exp_smoothing_revenue`'s level model suffices or a seasonal term is
    needed, completing the time-series family (level, derivative,
    rolling window, symbolic shape, now memory structure).

    Determinism: like the smoothing query, every cross-month sum is an
    ORDERED fold over the month-sorted array — both engines execute the
    identical (x_i − μ)(x_{i+k} − μ) multiply-add sequence, so the
    doubles agree bit-for-bit with no rounding; μ and each acf are
    fixed-order divisions. The index-based lag products use
    element_at over a PROJECTED array column (never an inline
    recompute — the HOF-CSE rule).

    Scale: the corpus collapses map-side to one exact-decimal row per
    month; everything after is one task folding a ~months-long array —
    the bounded-recursion-inside-a-row shape again."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue")
    )
    arr = m.agg(
        F.expr(
            "transform(sort_array(collect_list(struct(month, revenue))),"
            " x -> x.revenue)"
        ).alias("a")
    )
    base = arr.selectExpr(
        "a",
        "size(a) AS n",
        "aggregate(a, CAST(0 AS DOUBLE), (s, x) -> s + x) / size(a) AS mu",
    ).selectExpr(
        "a",
        "n",
        "mu",
        "aggregate(transform(a, x -> (x - mu) * (x - mu)),"
        " CAST(0 AS DOUBLE), (s, x) -> s + x) AS denom",
    )
    out = None
    for k in range(0, _ACF_LAGS + 1):
        row = base.selectExpr(
            f"{k} AS lag",
            "n",
            f"aggregate(transform(sequence(1, n - {k}),"
            f" i -> (element_at(a, i) - mu) * (element_at(a, i + {k}) - mu)),"
            " CAST(0 AS DOUBLE), (s, x) -> s + x) / denom AS acf",
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n"),
        "acf",
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection on daily revenue
# ---------------------------------------------------------------------------


@query(
    "revenue_cusum_changepoint",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS t
        FROM d),
s AS (
  SELECT day,
         sum(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
  FROM d),
c AS (
  SELECT day,
         (CAST(cum AS DOUBLE)
          - CAST(i AS DOUBLE) * (CAST(tot.t AS DOUBLE) / tot.n)) / 100.0
           AS cusum
  FROM s CROSS JOIN tot)
SELECT c.day AS changepoint_day, c.cusum AS cusum_at_peak,
       abs(c.cusum) AS max_abs_cusum,
       tot.n AS n_days,
       (CAST(tot.t AS DOUBLE) / tot.n) / 100.0 AS mean_daily
FROM c CROSS JOIN tot
ORDER BY abs(c.cusum) DESC, c.day LIMIT 1
""",
)
def revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue: the day where the
    cumulative deviation from the global daily mean peaks — the classic
    single-change-point estimator (Page 1954; the argmax of |CUSUM| is
    the most likely level-shift location), and the batch face of drift
    monitoring next to `column_entropy_profile`'s distribution
    fingerprints.

    Determinism: daily sums are exact integer cents (from DECIMAL
    totals); the running sum is an exact BIGINT window over the
    day-level aggregate; each CUSUM value is two fixed-order IEEE ops
    (cum − i·μ) on exact inputs, so the argmax (day tiebreak) is
    identical cross-engine.

    Scale: the corpus collapses map-side to one row per DAY; the ordered
    window and the top-1 selection run over that bounded frame
    (aggregate-bounded global windows are the sanctioned class)."""
    o = load(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = d.select(
        "day",
        F.sum("cents").over(w).alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
    )
    c = s.crossJoin(F.broadcast(tot)).select(
        "day",
        (
            (
                F.col("cum").cast("double")
                - F.col("i").cast("double")
                * (F.col("t").cast("double") / F.col("n"))
            )
            / 100.0
        ).alias("cusum"),
        "n",
        ((F.col("t").cast("double") / F.col("n")) / 100.0).alias("mean_daily"),
    )
    return (
        c.orderBy(F.abs(F.col("cusum")).desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("cusum").alias("cusum_at_peak"),
            F.abs(F.col("cusum")).alias("max_abs_cusum"),
            F.col("n").alias("n_days"),
            "mean_daily",
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve of customer engagement lifetimes
# ---------------------------------------------------------------------------

_KM_CHURN_DAYS = 90


@query(
    "customer_survival_km",
    oracle=f"""
WITH c AS (
  SELECT o_custkey,
         date_diff('day', CAST(min(o_orderdate) AS DATE),
                   CAST(max(o_orderdate) AS DATE)) AS t
  FROM orders GROUP BY 1),
g AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
obs AS (
  SELECT c.t,
         CASE WHEN (SELECT mx FROM g) - INTERVAL {_KM_CHURN_DAYS} DAY
                   > (SELECT CAST(max(o_orderdate) AS DATE) FROM orders o2
                      WHERE o2.o_custkey = c.o_custkey)
              THEN 1 ELSE 0 END AS churned
  FROM c),
lt AS (
  SELECT t, CAST(sum(churned) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c_all
  FROM obs GROUP BY 1),
r AS (
  SELECT t, d, c_all,
         sum(c_all) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS n_risk
  FROM lt),
arr AS (
  SELECT list_sort(list({{'t': t, 'd': d, 'n': n_risk}})) AS a
  FROM r WHERE d > 0),
folded AS (
  SELECT list_reduce(
           list_transform(a, x -> [{{'t': x.t, 'd': x.d, 'n': x.n,
             's': 1.0 - CAST(x.d AS DOUBLE) / x.n}}]),
           (acc, e) -> list_append(acc,
             {{'t': e[1].t, 'd': e[1].d, 'n': e[1].n,
               's': acc[-1].s * (1.0 - CAST(e[1].d AS DOUBLE) / e[1].n)}})) AS a
  FROM arr)
SELECT CAST(u.t AS BIGINT) AS t_days, CAST(u.n AS BIGINT) AS n_at_risk,
       u.d AS n_events, u.s AS survival
FROM (SELECT unnest(a) AS u FROM folded)
""",
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer engagement lifetimes
    (first-to-last-order span; a customer whose last order is more than
    90 days before the dataset's end is a churn EVENT, later actives are
    right-CENSORED — the estimator exists precisely to use them without
    bias): S(t) = Π_{{t_i ≤ t}} (1 − d_i/n_i) at each churn time. The
    retention curve behind LTV math, and the survival member of the
    statistics family (location: medians; spread: MAD; uncertainty:
    bootstrap; memory: ACF; now duration).

    Determinism: lifetimes and the 90-day churn rule are integer day
    arithmetic; n_at_risk is a reverse running BIGINT sum over the
    collapsed lifetime table; the survival product is an ORDERED fold
    over the ≤|distinct-lifetimes| array (each step one IEEE divide and
    multiply in identical sequence — the exp_smoothing pattern; never a
    per-row exp(sum(log)) whose transcendentals differ).

    Scale: one grouped pass per customer, a collapse to distinct
    lifetimes (day-range-bounded), a window over that bounded frame, and
    a single-task fold — corpus rows never enter a window or fold."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
        )
        .cast("long")
        .alias("t"),
        F.to_date(F.max("o_orderdate")).alias("last_day"),
    )
    g = o.agg(F.to_date(F.max("o_orderdate")).alias("mx"))
    obs = c.crossJoin(F.broadcast(g)).select(
        "t",
        F.when(
            F.col("last_day") < F.date_sub(F.col("mx"), _KM_CHURN_DAYS), 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    lt = obs.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c_all"),
    )
    wr = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    r = lt.select(
        "t", "d", "c_all", F.sum("c_all").over(wr).alias("n_risk")
    ).filter(F.col("d") > 0)
    arr = r.agg(
        F.expr(
            "sort_array(collect_list(struct(t, d, n_risk AS n)))"
        ).alias("a")
    )
    folded = arr.selectExpr(
        """
aggregate(
  slice(a, 2, size(a) - 1),
  array(struct(a[0].t AS t, a[0].d AS d, a[0].n AS n,
               1.0 - CAST(a[0].d AS DOUBLE) / a[0].n AS s)),
  (acc, x) -> concat(acc, array(struct(
    x.t AS t, x.d AS d, x.n AS n,
    element_at(acc, -1).s * (1.0 - CAST(x.d AS DOUBLE) / x.n) AS s)))) AS a
""".strip()
    )
    u = folded.select(F.explode("a").alias("u"))
    return u.select(
        F.col("u.t").cast("long").alias("t_days"),
        F.col("u.n").cast("long").alias("n_at_risk"),
        F.col("u.d").alias("n_events"),
        F.col("u.s").alias("survival"),
    )


# ---------------------------------------------------------------------------
# contrastive training-pair construction (anchor + hash-mined negatives)
# ---------------------------------------------------------------------------

_NEG_K = 4  # negatives per anchor
_NEG_OVERSAMPLE = 64  # expected survivors of the stage-1 hash filter


def _neg_oracle() -> str:
    bm25 = _ORACLES["bm25_search"]
    return f"""
WITH anchors AS (SELECT doc_id AS anchor_id FROM ({bm25})),
scored AS (
  SELECT doc_id FROM ({bm25})),
pool AS (
  SELECT doc_id AS neg_id FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM scored)),
pn AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM pool),
cand AS (
  SELECT a.anchor_id, p.neg_id,
         (CAST(('0x' || substr(md5('neg|' || CAST(a.anchor_id AS VARCHAR)
             || '|' || CAST(p.neg_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
          + 0.5) / 1152921504606846976.0 AS u
  FROM anchors a CROSS JOIN pool p),
kept AS (
  SELECT anchor_id, neg_id, u
  FROM cand CROSS JOIN pn
  WHERE u < CAST({_NEG_OVERSAMPLE} AS DOUBLE) / pn.n_pool),
ranked AS (
  SELECT anchor_id, neg_id,
         CAST(row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY u, neg_id) AS INT) AS neg_rank
  FROM kept)
SELECT anchor_id, neg_id, neg_rank
FROM ranked WHERE neg_rank <= {_NEG_K}
"""


@query("contrastive_negatives", oracle=_neg_oracle(), confs=TINY_STAGE_CONFS)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair construction: for each of the 20 BM25
    anchors, mine 4 deterministic random negatives from the pool
    of documents that match NO query term — the (anchor, negative) pairs
    a reranker / embedding model trains on (the positive side is the
    BM25 ranking itself). Negative choice is the salted-hash convention
    (md5('neg|anchor|candidate')), so the same pairs come out of every
    engine, retry, and ingest order — resampling-free dataset
    construction, like the bootstrap.

    Scale (the two-stage filter is the point): ranking the whole pool
    per anchor would put |pool| rows in each anchor's partition. Stage 1
    keeps a candidate only when its uniform < OVERSAMPLE/|pool|
    (expected ~64 survivors per anchor, a broadcast
    1-row count); stage 2's per-anchor window then ranks a few dozen
    rows however large the corpus is. P(fewer than 4 survive) is
    negligible at the 64x oversample, and small pools
    (threshold >= 1) keep everything, so the output is never silently
    short."""
    from ecommerce_lakehouse_spark.queries.llm7 import bm25_search

    anchors = bm25_search(spark, sf_dir).select(
        F.col("doc_id").alias("anchor_id")
    )
    scored = bm25_search(spark, sf_dir).select("doc_id")
    pool = (
        load(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("neg_id"))
        .join(scored, F.col("neg_id") == F.col("doc_id"), "left_anti")
    )
    pn = pool.agg(F.count(F.lit(1)).cast("long").alias("n_pool"))
    u = (
        "(CAST(conv(substr(md5(concat('neg|', CAST(anchor_id AS STRING), '|',"
        " CAST(neg_id AS STRING))), 1, 15), 16, 10) AS DOUBLE) + 0.5)"
        " / 1152921504606846976.0"
    )
    cand = (
        pool.crossJoin(F.broadcast(anchors))
        .select("anchor_id", "neg_id", F.expr(u).alias("u"))
        .crossJoin(F.broadcast(pn))
        .filter(
            F.col("u")
            < F.lit(float(_NEG_OVERSAMPLE)) / F.col("n_pool").cast("double")
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("u", "neg_id")
    return (
        cand.select(
            "anchor_id",
            "neg_id",
            F.row_number().over(w).cast("int").alias("neg_rank"),
        )
        .filter(F.col("neg_rank") <= _NEG_K)
    )


# ---------------------------------------------------------------------------
# seasonality profile: month x ISO-weekday order/revenue shares
# ---------------------------------------------------------------------------


@query(
    "orders_seasonality",
    oracle="""
WITH c AS (
  SELECT CAST(month(o_orderdate) AS INT) AS month,
         CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_weekday,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2),
t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS tot FROM c)
SELECT c.month, c.iso_weekday, c.n_orders,
       CAST(c.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(c.n_orders AS DOUBLE) / t.n AS order_share,
       CAST(c.cents AS DOUBLE) / t.tot AS revenue_share
FROM c CROSS JOIN t
""",
)
def orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × ISO-weekday seasonality fingerprint of order volume and
    revenue — the calendar structure `revenue_autocorrelation` detects
    and `exp_smoothing_revenue`'s level model ignores; diffing two
    batches' profiles is the calendar face of drift monitoring.
    ISO weekday (Mon=1..Sun=7) because the engines' default dayofweek
    numberings disagree (Spark Sun=1, DuckDB Sun=0) — Spark side is
    weekday()+1, oracle side isodow(), both ISO.

    Determinism: counts and integer-cent sums are exact; shares divide
    exact integers (fixed order). Scale: one map-side grouped pass to
    ≤84 cells, a 1-row total broadcast back."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(
        F.month("o_orderdate").cast("int").alias("month"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_weekday"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    t = c.agg(
        F.sum("n_orders").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "month",
        "iso_weekday",
        "n_orders",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (F.col("n_orders").cast("double") / F.col("n")).alias("order_share"),
        (F.col("cents").cast("double") / F.col("tot")).alias("revenue_share"),
    )
