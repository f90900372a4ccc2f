"""Event-stream operators on the events table (SURVEY §2.10).

The reference is batch-only; its "near real-time" requirement
(docs/requirements.md:19-23) maps to windowed/session/as-of semantics.
These queries run the SAME expressions batch-side (window(), session_window()
work in batch); streaming/jobs.py wires identical logic into Structured
Streaming with watermarks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ecommerce_lakehouse_spark.money import money_sum
from ecommerce_lakehouse_spark.operators.relational import asof_join, dedup_by_key
from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load


@query(
    "tumbling_window_agg",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation — the streaming workhorse, run
    batch-side. Epoch-aligned buckets match DuckDB time_bucket."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "sliding_window_agg",
    oracle="""
WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS h, value FROM events),
     ex AS (SELECT h AS ws, value FROM b
            UNION ALL
            SELECT h - INTERVAL '1 hour' AS ws, value FROM b)
SELECT ws AS window_start, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM ex GROUP BY 1
""",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): each event lands in two
    windows. The oracle expands the two memberships explicitly."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "session_window_agg",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sess_id
""",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute gap (Structured Streaming's
    session_window run batch-side). Spark merges events whose windows
    overlap (gap strictly less than 30 min ⇒ same session); the
    gaps-and-islands oracle uses >= for the new-session test to match."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "asof_join_enrich",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       r.o_orderkey AS last_orderkey,
       r.o_totalprice AS last_order_total
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
""",
)
def asof_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.4: absent in the reference, flagged in §7 as
    the events-table extension): each event is enriched with the user's
    most recent order at event time. Merge-based implementation
    (operators/relational.py) — one shuffle, no theta join. The right side
    is pre-deduped per (key, time) with a deterministic survivor."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = dedup_by_key(
        load(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderdate"],
        [F.desc("o_orderkey")],
    ).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    out = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_order_total"),
    )


@query(
    "json_props_agg",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events
GROUP BY 1
""",
)
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column processing (function family absent from
    the reference; first-class in any event pipeline): extract typed values
    from the props JSON string and aggregate. get_json_object is JVM-side
    (Jackson); at scale prefer from_json with an explicit schema once per
    pipeline so the parse happens exactly once and columns prune."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_high"),
    )


@query(
    "user_session_stats",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM o
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM m
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         date_diff('second', min(ts), max(ts)) AS dur_s
  FROM s GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(dur_s) AS max_session_seconds,
       CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events_per_session
FROM per_sess GROUP BY 1
""",
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics via explicit gaps-and-islands (lag →
    new-session flag → running sum → two-level reduction) — the batch
    form of sessionization, complementing session_window_agg's built-in
    session_window. Deterministic: the lag/cumsum windows order by
    (ts, event_id).

    Scale: both window passes partition by user_id — one shuffle, then
    per-user sorted streams (no global sort); the two groupBys reduce
    strictly (events → sessions → users). Session duration compares
    second-floored epochs on both engines (Spark long cast ≡ DuckDB
    date_diff('second'))."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col("ts") >= prev + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    s = e.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = s.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "dur_s"
        ),
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("dur_s").alias("max_session_seconds"),
        (F.sum("n_events").cast("double") / F.count("*")).alias(
            "avg_events_per_session"
        ),
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH t1 AS (
  SELECT user_id, min(ts) AS ts1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2 FROM events e
  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1
  WHERE e.event_type = 'click' GROUP BY 1),
t3 AS (
  SELECT e.user_id, min(e.ts) AS ts3 FROM events e
  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2
  WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT '1_view' AS step, count(*) AS n_users FROM t1
UNION ALL
SELECT '2_click', count(*) FROM t2
UNION ALL
SELECT '3_purchase', count(*) FROM t3
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users counted at each step only if the
    step's event happens strictly AFTER their entry into the previous step
    (first view → first later click → first later purchase) — temporal
    ordering, not mere co-occurrence.

    Scale: each stage is a filtered pre-aggregation joined on user_id —
    all three joins co-partition on the same key (one shuffle family, AQE
    reuses the exchange), per-user state is one timestamp, and the final
    output is three rows via unionByName of 1-row aggregates."""
    e = load(spark, sf_dir, "events")
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )

    def step(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )

    return (
        step(t1, "1_view")
        .unionByName(step(t2, "2_click"))
        .unionByName(step(t3, "3_purchase"))
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
t AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total FROM t GROUP BY 1)
SELECT t.from_type, t.to_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       ft.from_total,
       CAST(t.n AS DOUBLE) / ft.from_total AS p_transition
FROM t JOIN ft USING (from_type)
ORDER BY from_type, to_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (the clickstream 'what happens after a view' estimator): consecutive
    event-type pairs within each user's ts-ordered stream, counted and
    row-normalized into transition probabilities. Complements the FIXED
    view->click->purchase funnel (funnel_view_click_purchase) with the
    full event_types x event_types estimate.

    Cross-engine determinism: ordering ties broken by event_id;
    p_transition is a single IEEE division of exact BIGINT inputs,
    emitted UNROUNDED (bit-identical; round() at a half boundary would
    not be).

    Scale: lead() runs in per-user partitions (never a global window);
    only (from, to) pairs shuffle after the map-side pair extraction;
    the row-normalizing join is |event_types|-sized and broadcast. The
    matrix itself is event-type-cardinality-bounded however large the
    stream."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    t = s.groupBy(
        F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    ft = t.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("from_total")
    )
    return (
        t.join(F.broadcast(ft), on="from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            "from_total",
            (F.col("n_transitions").cast("double") / F.col("from_total")).alias(
                "p_transition"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "sax_series_profile",
    oracle="""
WITH s AS (
  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS j,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
u AS (
  SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
         CAST(sum(v) AS DOUBLE) / max(n) AS mu,
         sqrt((CAST(sum(v * v) AS DOUBLE)
               - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / max(n))
              / max(n)) AS sigma
  FROM s GROUP BY user_id),
seg AS (
  SELECT s.user_id, (s.j * 8) // s.n AS sg,
         CAST(sum(s.v) AS DOUBLE) AS seg_sum,
         CAST(count(*) AS BIGINT) AS seg_cnt
  FROM s GROUP BY 1, 2),
paa AS (
  SELECT seg.user_id, seg.sg,
         CASE WHEN u.sigma > 0
              THEN (seg.seg_sum - seg.seg_cnt * u.mu)
                   / (seg.seg_cnt * u.sigma)
              ELSE 0 END AS z
  FROM seg JOIN u USING (user_id)),
sym AS (
  SELECT user_id, sg,
         substr('abcd',
                CAST(CASE WHEN z < -0.6745 THEN 0
                          WHEN z < 0 THEN 1
                          WHEN z < 0.6745 THEN 2
                          ELSE 3 END AS INT) + 1, 1) AS c
  FROM paa)
SELECT sym.user_id, u.n_events,
       string_agg(sym.c, '' ORDER BY sym.sg) AS sax_word
FROM sym JOIN u USING (user_id)
GROUP BY sym.user_id, u.n_events
ORDER BY sym.user_id
""",
)
def sax_series_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of each user's event-value series (Lin et al.
    2003, the indexable time-series similarity representation behind
    distributed trajectory/series search engines): z-normalize per
    user, piecewise-aggregate into 8 segments, map each segment mean
    onto a 4-letter Gaussian-breakpoint alphabet — one 8-char word per
    user, the blocking key under which similar series collide for
    cheap candidate generation (two users with equal words are
    near-identical in shape up to the PAA resolution).

    Cross-engine determinism for a FLOAT-normalizing op: all sums run
    as exact DECIMAL(18,2) (value has 2dp) — association-proof — and
    mean/std/PAA-z compose from those exact sums in ONE fixed
    expression order, so every intermediate double is bit-identical;
    breakpoint comparisons on identical doubles cannot disagree.
    Constant series (sigma=0) map to symbol chain of z=0 explicitly.
    Segment assignment is integer math: segment = (j*8) DIV n.

    Scale: the per-user rank and count are partitioned windows; the
    stats and segment sums are two groupBys over slim (user, decimal)
    rows; the word assembles from 8 rows per user via an in-row sorted
    fold — nothing global anywhere."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    s = e.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (F.row_number().over(w) - 1).alias("j"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    u = s.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        (F.sum("v").cast("double") / F.max("n")).alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("v") * F.col("v")).cast("double")
                - F.sum("v").cast("double") * F.sum("v").cast("double") / F.max("n")
            )
            / F.max("n")
        ).alias("sigma"),
    )
    seg = s.groupBy("user_id", F.expr("(j * 8) DIV n").alias("sg")).agg(
        F.sum("v").cast("double").alias("seg_sum"),
        F.count(F.lit(1)).cast("long").alias("seg_cnt"),
    )
    paa = seg.join(u, on="user_id").select(
        "user_id",
        "sg",
        F.when(
            F.col("sigma") > 0,
            (F.col("seg_sum") - F.col("seg_cnt") * F.col("mu"))
            / (F.col("seg_cnt") * F.col("sigma")),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    sym = paa.select(
        "user_id",
        "sg",
        F.substring(
            F.lit("abcd"),
            F.when(F.col("z") < -0.6745, 0)
            .when(F.col("z") < 0, 1)
            .when(F.col("z") < 0.6745, 2)
            .otherwise(3)
            .cast("int")
            + 1,
            1,
        ).alias("c"),
    )
    word = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("sg", "c"))), lambda x: x["c"]
        ),
        "",
    )
    return (
        sym.join(u.select("user_id", "n_events"), on="user_id")
        .groupBy("user_id", "n_events")
        .agg(word.alias("sax_word"))
        .orderBy("user_id")
    )
