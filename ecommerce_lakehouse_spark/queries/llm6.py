"""Training-data curation operators, wave 6: statistical language-model
quality scoring (CCNet-style perplexity filtering) and sketch-based
distinct counting (KMV) — the "score every document against a corpus LM"
and "how big is this vocabulary, cheaply" primitives of a 100 TB text
pipeline.

All hot-path logic is JVM Column expressions; cross-engine float rules
(round ln/log2 to 9 decimals before aggregation, accumulate in DECIMAL)
keep the oracles bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

# one tokenization, shared by query and oracle: lowercase, alpha runs only
_TOKENIZE_SQL = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')"
    ", ' '), x -> x <> '')"
)


def _tokens(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.filter(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
            lambda x: x != "",
        ).alias("t"),
    )


@query(
    "bigram_perplexity_scores",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKENIZE_SQL} AS t FROM documents),
uni AS (
  SELECT count(DISTINCT u) AS v
  FROM (SELECT unnest(t) AS u FROM toks)),
bi AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> {{'w1': t[i], 'w2': t[i+1]}})) AS u
    FROM toks WHERE len(t) >= 2)),
c12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
lp AS (
  SELECT c12.w1, c12.w2,
         CAST(round(log2((n12 + 1.0) / (n1 + v)) * 1000000000, 0) AS BIGINT)
           AS ubits
  FROM c12 JOIN c1 ON c12.w1 = c1.w1 CROSS JOIN uni),
pd AS (SELECT doc_id, w1, w2, count(*) AS k FROM bi GROUP BY 1, 2, 3),
agg AS (
  SELECT pd.doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
         CAST(sum(k * (-ubits)) AS BIGINT) AS pos_units
  FROM pd JOIN lp ON pd.w1 = lp.w1 AND pd.w2 = lp.w2
  GROUP BY 1)
SELECT doc_id, n_bigrams,
       CAST((2 * pos_units + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
         / 1000000000 AS bits_per_bigram
FROM agg
""",
)
def bigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-one-smoothed bigram
    model on the corpus itself, then score every document by its bits
    per bigram (log2 perplexity) under that model — the classic
    "weird text scores high" filter (Wenzek et al. 2020 use KenLM; the
    bigram model is the same decision signal built from relational
    algebra alone). p(w2|w1) = (c12+1)/(c1+V).

    Cross-engine determinism: each distinct bigram's log2 is rounded
    ONCE into integer nano-bits (×1e9); per-doc totals are exact BIGINT
    sums (no float association, no decimal precision-loss), and the
    per-doc average is exact integer half-up division — a double
    quotient rounded at 9 decimals would land exactly on round-half
    boundaries (sum/12 does at sf0.01) where engines disagree.

    Scale: tokenize and bigram expansion are map-side (higher-order
    array fns); the model is two vocabulary-bounded groupBys; scoring
    joins per-doc DISTINCT bigrams (not occurrences) against the model
    on (w1, w2) — hot bigrams are one model row each, and the join is
    AQE-skew-safe since the model side is distinct-bigram-bounded."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(d)
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    vdf = (
        toks.select(F.explode("t").alias("u"))
        .agg(F.countDistinct("u").alias("v"))
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    lp = (
        c12.join(c1, on="w1")
        .crossJoin(F.broadcast(vdf))
        .select(
            "w1",
            "w2",
            F.round(
                F.log2((F.col("n12") + F.lit(1.0)) / (F.col("n1") + F.col("v")))
                * F.lit(1000000000.0),
                0,
            )
            .cast("long")
            .alias("ubits"),
        )
    )
    pd_ = bi.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    return (
        pd_.join(lp, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("k") * -F.col("ubits")).cast("long").alias("__pos"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.expr(
                    "(2 * __pos + n_bigrams) DIV (2 * n_bigrams)"
                ).cast("double")
                / F.lit(1000000000.0)
            ).alias("bits_per_bigram"),
        )
    )


@query(
    "kmv_distinct_sketch",
    oracle="""
WITH h AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM orders),
exact AS (SELECT count(*) AS n_exact FROM h),
kth AS (SELECT max(hv) AS kth_hash, count(*) AS k_used
        FROM (SELECT hv FROM h ORDER BY hv LIMIT 256))
SELECT CAST(256 AS BIGINT) AS k,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(CASE WHEN n_exact <= 256 THEN CAST(n_exact AS DOUBLE)
                  ELSE (k_used - 1) /
                       (CAST(kth_hash AS DOUBLE) / 1152921504606846976.0)
             END, 6) AS kmv_estimate
FROM exact CROSS JOIN kth
""",
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    2002; the Theta-sketch family's core) over the orders table's
    customer domain: hash every key, keep the k=256 smallest hash
    values, estimate |D| ≈ (k−1)/frac(kth-min). The answer rides next
    to the exact count so the query IS its own accuracy audit (expected
    relative error ~1/sqrt(k−2) ≈ 6%). Below k distinct values the
    sketch IS the exact set (the CASE arm) — at sf0.001 that branch
    answers; from sf0.01 up the estimator branch runs (the documents
    table's 31-token vocabulary would never leave the exact branch,
    hence the customer domain).

    The hash is md5 truncated to 60 bits — chosen because BOTH engines
    compute identical md5 hex, so the sketch is deterministic
    cross-engine (Spark xxhash64 and DuckDB hash() don't match, a
    portable sketch must pick a portable hash).

    Scale: the k smallest of a distributed set is TakeOrdered — each
    partition ships only its local top-k, no global sort, no collect;
    the sketch state is O(k) regardless of corpus size, and UNLIKE an
    exact countDistinct there is no vocabulary-sized shuffle: this is
    what you run when the vocabulary itself doesn't fit."""
    o = load(spark, sf_dir, "orders")
    h = (
        o.select(
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("hv")
        )
        .distinct()
    )
    exact = h.agg(F.count(F.lit(1)).alias("n_exact"))
    kth = (
        h.orderBy("hv")
        .limit(256)
        .agg(F.max("hv").alias("kth_hash"), F.count(F.lit(1)).alias("k_used"))
    )
    return exact.crossJoin(F.broadcast(kth)).select(
        F.lit(256).cast("long").alias("k"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(
            F.when(
                F.col("n_exact") <= 256, F.col("n_exact").cast("double")
            ).otherwise(
                (F.col("k_used") - 1)
                / (F.col("kth_hash").cast("double") / F.lit(1152921504606846976.0))
            ),
            6,
        ).alias("kmv_estimate"),
    )
