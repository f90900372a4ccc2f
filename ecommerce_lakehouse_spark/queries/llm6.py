"""Training-data curation operators, wave 6: higher-order statistical
LM scoring (stupid-backoff trigram, the KenLM-family shape) and
sketch-based distinct counting (KMV) — the "score every document against
a corpus LM" and "how big is this domain, cheaply" primitives of a
100 TB text pipeline.

All hot-path logic is JVM Column expressions; cross-engine float rule:
round each log2 ONCE into integer nano-bits, accumulate and divide in
exact integer arithmetic — no float association, no decimal precision
loss, no round-half boundaries.
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
    "trigram_backoff_scores",
    oracle=f"""
WITH d AS (SELECT doc_id, {_TOKENIZE_SQL} AS t FROM documents),
tr AS (SELECT * FROM d
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80),
n AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tok FROM tr),
u1 AS (SELECT u AS w, count(*) AS c FROM (SELECT unnest(t) AS u FROM tr) GROUP BY 1),
b2 AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS c FROM (
         SELECT unnest(list_transform(range(1, len(t)), i -> {{'w1': t[i], 'w2': t[i+1]}})) AS u
         FROM tr WHERE len(t) >= 2) GROUP BY 1, 2),
t3 AS (SELECT u.w1 AS w1, u.w2 AS w2, u.w3 AS w3, count(*) AS c FROM (
         SELECT unnest(list_transform(range(1, len(t) - 1),
                i -> {{'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]}})) AS u
         FROM tr WHERE len(t) >= 3) GROUP BY 1, 2, 3),
dt AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3 FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                i -> {{'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]}})) AS u
         FROM d WHERE len(t) >= 3)),
dk AS (SELECT doc_id, w1, w2, w3, count(*) AS k FROM dt GROUP BY 1, 2, 3, 4),
corpus_tri AS (SELECT DISTINCT w1, w2, w3 FROM dk),
lp AS (
  SELECT ct.w1, ct.w2, ct.w3,
         CASE WHEN t3.c IS NOT NULL THEN 1
              WHEN b23.c IS NOT NULL THEN 2
              WHEN u3.c IS NOT NULL THEN 3 ELSE 4 END AS tier,
         CASE WHEN t3.c IS NOT NULL THEN CAST(t3.c AS DOUBLE) / b12.c
              WHEN b23.c IS NOT NULL THEN CAST(0.4 AS DOUBLE) * b23.c / u2.c
              WHEN u3.c IS NOT NULL THEN CAST(0.16 AS DOUBLE) * u3.c / n.n_tok
              ELSE CAST(0.16 AS DOUBLE) / n.n_tok END AS p
  FROM corpus_tri ct
  LEFT JOIN t3 ON ct.w1 = t3.w1 AND ct.w2 = t3.w2 AND ct.w3 = t3.w3
  LEFT JOIN b2 b12 ON ct.w1 = b12.w1 AND ct.w2 = b12.w2
  LEFT JOIN b2 b23 ON ct.w2 = b23.w1 AND ct.w3 = b23.w2
  LEFT JOIN u1 u2 ON ct.w2 = u2.w
  LEFT JOIN u1 u3 ON ct.w3 = u3.w
  CROSS JOIN n),
lpu AS (SELECT w1, w2, w3, tier,
               CAST(round(log2(p) * 1000000000, 0) AS BIGINT) AS ubits FROM lp),
agg AS (
  SELECT dk.doc_id,
         CAST(sum(k) AS BIGINT) AS n_trigrams,
         CAST(sum(CASE WHEN tier > 1 THEN k ELSE 0 END) AS BIGINT) AS n_backoff,
         CAST(sum(CASE WHEN tier = 4 THEN k ELSE 0 END) AS BIGINT) AS n_oov,
         CAST(sum(k * (-ubits)) AS BIGINT) AS pos_units
  FROM dk JOIN lpu ON dk.w1 = lpu.w1 AND dk.w2 = lpu.w2 AND dk.w3 = lpu.w3
  GROUP BY 1)
SELECT doc_id, n_trigrams, n_backoff, n_oov,
       CAST((2 * pos_units + n_trigrams) // (2 * n_trigrams) AS DOUBLE)
         / 1000000000 AS bits_per_trigram
FROM agg
""",
)
def trigram_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007 — the
    web-scale KenLM-family shape; complements `bigram_lm_score`'s
    add-alpha bigram with a HIGHER-ORDER model and graceful degradation):
    train unigram/bigram/trigram counts on the deterministic 80% hash
    split (same bucket rule as train_val_test_split), then score every
    document's trigrams through the backoff chain
    S(w3|w1w2) = c123/c12, else 0.4*c23/c2, else 0.16*c3/N, else
    0.16/N (OOV floor) — per-doc bits-per-trigram plus integer backoff
    and OOV counts (the held-out docs exercise every tier).

    Cross-engine determinism: each distinct trigram's log2 is rounded
    ONCE into integer nano-bits (x1e9); per-doc totals are exact BIGINT
    sums, and the per-doc average is exact integer half-up division — a
    double quotient rounded at 9 decimals lands exactly on round-half
    boundaries (sum/12 does at sf0.01) where engines disagree.

    Scale: the model is three vocabulary-bounded groupBys; the backoff
    chain's five lookups join the CORPUS-DISTINCT trigram set (vocab^3-
    bounded), never the document stream — docs then join the finished
    (trigram -> nano-bits) table once on a fixed-width key. Hot
    trigrams are one model row each; everything is map-side HOF
    expansion plus vocabulary-bounded shuffles."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(d)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(100),
    )
    tr = toks.filter(bucket < 80)
    ndf = tr.agg(F.sum(F.size("t")).cast("long").alias("n_tok"))
    u1 = (
        tr.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def _bigrams(df):
        return df.filter(F.size("t") >= 2).select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("g")
        ).select("g.w1", "g.w2")

    def _trigrams(df, keep):
        return df.filter(F.size("t") >= 3).select(
            *keep,
            F.explode(
                F.expr(
                    "zip_with(zip_with(slice(t, 1, size(t)-2),"
                    " slice(t, 2, size(t)-2), (a, b) -> struct(a, b)),"
                    " slice(t, 3, size(t)-2),"
                    " (p, c) -> struct(p.a AS w1, p.b AS w2, c AS w3))"
                )
            ).alias("g"),
        ).select(*keep, "g.w1", "g.w2", "g.w3")

    b2 = _bigrams(tr).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    t3 = (
        _trigrams(tr, [])
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dk = (
        _trigrams(toks, ["doc_id"])
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    corpus_tri = dk.select("w1", "w2", "w3").distinct()
    b12 = b2.select(
        F.col("w1").alias("w1"), F.col("w2").alias("w2"), F.col("c").alias("c12")
    )
    b23 = b2.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c").alias("c23")
    )
    u2 = u1.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    u3 = u1.select(F.col("w").alias("w3"), F.col("c").alias("c3"))
    t3n = t3.withColumnRenamed("c", "c123")
    p = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double") / F.col("c12"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(0.4) * F.col("c23") / F.col("c2"),
        )
        .when(
            F.col("c3").isNotNull(),
            F.lit(0.16) * F.col("c3") / F.col("n_tok"),
        )
        .otherwise(F.lit(0.16) / F.col("n_tok"))
    )
    tier = (
        F.when(F.col("c123").isNotNull(), F.lit(1))
        .when(F.col("c23").isNotNull(), F.lit(2))
        .when(F.col("c3").isNotNull(), F.lit(3))
        .otherwise(F.lit(4))
    )
    lpu = (
        corpus_tri.join(t3n, on=["w1", "w2", "w3"], how="left")
        .join(b12, on=["w1", "w2"], how="left")
        .join(b23, on=["w2", "w3"], how="left")
        .join(u2, on="w2", how="left")
        .join(u3, on="w3", how="left")
        .crossJoin(F.broadcast(ndf))
        .select(
            "w1",
            "w2",
            "w3",
            tier.alias("tier"),
            F.round(F.log2(p) * F.lit(1000000000.0), 0)
            .cast("long")
            .alias("ubits"),
        )
    )
    return (
        dk.join(lpu, on=["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("tier") > 1, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_backoff"),
            F.sum(F.when(F.col("tier") == 4, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.col("k") * -F.col("ubits")).cast("long").alias("__pos"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "n_backoff",
            "n_oov",
            (
                F.expr(
                    "(2 * __pos + n_trigrams) DIV (2 * n_trigrams)"
                ).cast("double")
                / F.lit(1000000000.0)
            ).alias("bits_per_trigram"),
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
