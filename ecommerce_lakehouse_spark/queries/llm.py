"""LLM training-data-pipeline operators over documents/embeddings
(BASELINE north star; additive to the reference per SURVEY §7.3 v6).

All hot-path logic is built-in Column expressions (JVM, codegen) — no
Python UDFs. Deduplication/similarity hashing uses md5-derived integers so
the DuckDB oracle can reproduce bit-identical signatures.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_SQL = "('" + "', '".join(STOPWORDS) + "')"


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


@query(
    "text_quality_stats",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, lang,
       length(text) AS n_chars,
       len(toks) AS n_words,
       len(list_distinct(toks)) AS n_unique_words,
       round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
             / CAST(len(toks) AS DOUBLE), 4) AS avg_word_len,
       round(len(list_filter(toks, x -> x IN {_SW_SQL}))
             / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
       round(least(len(toks) / 100.0, 1.0)
             * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)), 6) AS quality_score
FROM t
""",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring (north-star text analysis): length, token
    counts, type-token ratio, stopword ratio, and a deterministic
    quality score — all JVM-side array expressions, no UDF."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks).cast("double")
    n_unique = F.size(F.array_distinct(toks))
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_words"),
        n_unique.alias("n_unique_words"),
        F.round(
            F.aggregate(F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
            / n_words,
            4,
        ).alias("avg_word_len"),
        F.round(sw / n_words, 6).alias("stopword_ratio"),
        F.round(
            F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * (n_unique / n_words), 6
        ).alias("quality_score"),
    )


@query(
    "token_count_by_lang",
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
""",
)
def token_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per (lang, source) — the bookkeeping agg
    every training-data pipeline runs before sampling."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@query(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(text) AS fingerprint,
       ('0x' || substr(md5(text), 1, 8))::BIGINT AS content_hash,
       substr(text, 1, 16) AS prefix
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 content hash + a 32-bit integer
    projection (the primitive under MinHash/SimHash below). Spark's conv()
    and DuckDB's hex cast agree bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint").alias("content_hash"),
        F.substring("text", 1, 16).alias("prefix"),
    )


@query(
    "exact_dedup",
    oracle="""
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
""",
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (north star): canonical doc = min
    doc_id per content hash. One shuffle on the hash; at 100 TB group on
    the hash (fixed width), never the raw text."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies")
    )


@query(
    "embedding_stats",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 5)
         AS l2_norm,
       round(list_aggregate(embedding::DOUBLE[], 'sum') / len(embedding), 6) AS mean_component
FROM embeddings
""",
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector column profiling: dimension, L2 norm, component mean — all
    via JVM higher-order array functions (no UDF, no collect)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 5).alias("l2_norm"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6).alias(
            "mean_component"
        ),
    )


@query(
    "embedding_knn_bruteforce",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')) AS nrm
  FROM embeddings
), q AS (SELECT * FROM v WHERE vec_id < 10),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_aggregate(list_transform(range(1, len(q.emb) + 1),
                                       i -> q.emb[i] * c.emb[i]), 'sum')
           / (q.nrm * c.nrm) AS sim
  FROM q, v c WHERE c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, round(sim, 5) AS cosine_sim, rn AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM pairs
) WHERE rn <= 5
""",
)
def embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline (north star): the small query
    set broadcasts, candidates stream — no shuffle of the big side; per-query
    top-k via window. Dot products are JVM zip_with/aggregate in float64 so
    the oracle matches to the last ulp (rounded to 5dp regardless)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sq = lambda v: F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    withn = e.withColumn("nrm", F.sqrt(sq(F.col("emb"))))
    q = withn.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "emb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    pairs = (
        withn.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", dot / (F.col("q_nrm") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("sim", 5).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "gopher_quality_flags",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\.\.\.')) AS n_symbols
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
              AS BIGINT) AS sum_word_len,
         n_symbols,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))
              AS BIGINT) AS n_bullet,
         CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
              AS BIGINT) AS n_ellipsis_end,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                              s -> list_contains(toks, s))) AS BIGINT) AS n_req_sw
  FROM t)
SELECT doc_id, n_words,
       n_words BETWEEN 50 AND 100000 AS rule_word_count,
       sum_word_len BETWEEN 3 * n_words AND 10 * n_words AS rule_mean_word_len,
       10 * n_symbols < n_words AS rule_symbol_ratio,
       10 * n_bullet < 9 * n_lines AS rule_bullet_lines,
       10 * n_ellipsis_end < 3 * n_lines AS rule_ellipsis_lines,
       5 * n_alpha >= 4 * n_words AS rule_alpha_words,
       n_req_sw >= 2 AS rule_stopwords,
       (n_words BETWEEN 50 AND 100000)
         AND sum_word_len BETWEEN 3 * n_words AND 10 * n_words
         AND 10 * n_symbols < n_words
         AND 10 * n_bullet < 9 * n_lines
         AND 10 * n_ellipsis_end < 3 * n_lines
         AND 5 * n_alpha >= 4 * n_words
         AND n_req_sw >= 2 AS passes_gopher
FROM m
""",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, Appendix A —
    the published rule set most curation pipelines start from), one
    boolean flag per rule plus the combined verdict: word count in
    [50, 100k]; mean word length in [3, 10]; symbol-to-word ratio
    ('#' + '...') < 0.1; < 90% of lines bullet-led; < 30% of lines
    ellipsis-terminated; >= 80% of words containing an alphabetic
    char; >= 2 of the 8 required stopwords present. Per-rule flags
    (not just the verdict) are the point: a curation run audits WHICH
    rule rejected how many documents before tuning thresholds.

    Cross-engine determinism: every threshold is evaluated in exact
    integer arithmetic (10*symbols < n_words, 5*alpha >= 4*n_words,
    3n <= sum_len <= 10n) — no float ratio ever materializes, so no
    rounding boundary can disagree between engines.

    Scale: pure map-side array/string expressions per document — zero
    shuffles, zero UDFs, whole-stage codegen end to end; composes
    with the curation DAG as a quality gate (pipelines/curation.py)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    lines = F.split(F.col("text"), "\n")
    n_words = F.size(toks).cast("long")
    sum_word_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_symbols = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda line: line.rlike(r"^\s*[-*•]"))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda line: line.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("long")
    req = ["the", "be", "to", "of", "and", "that", "have", "with"]
    n_req_sw = sum(
        (F.array_contains(toks, s).cast("long") for s in req), F.lit(0).cast("long")
    )
    r_wc = n_words.between(50, 100000)
    r_mwl = sum_word_len.between(3 * n_words, 10 * n_words)
    r_sym = (10 * n_symbols) < n_words
    r_bul = (10 * n_bullet) < (9 * n_lines)
    r_ell = (10 * n_ellipsis) < (3 * n_lines)
    r_alp = (5 * n_alpha) >= (4 * n_words)
    r_sw = n_req_sw >= 2
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        r_wc.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_bul.alias("rule_bullet_lines"),
        r_ell.alias("rule_ellipsis_lines"),
        r_alp.alias("rule_alpha_words"),
        r_sw.alias("rule_stopwords"),
        (r_wc & r_mwl & r_sym & r_bul & r_ell & r_alp & r_sw).alias("passes_gopher"),
    )
