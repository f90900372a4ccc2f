"""Round-6 operators: KLL-family quantile sketch, learned quality
classifier, IVF-PQ ADC search, SCD2 as-of lookup."""

import pyspark.sql.functions as F
import pytest

from ecommerce_lakehouse_spark.operators.sketch import (
    kll_level_sketch,
    kll_merge,
    md5_hash60,
)
from ecommerce_lakehouse_spark.tables import load


def _src(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        md5_hash60(F.col("event_id")).alias("h"),
        F.col("event_id"),
    )


def test_kll_sketch_mergeable(spark, sf_dir):
    """The operator contract: union of per-partition sketches merged ==
    whole-data sketch, BIT-IDENTICAL (n, level, and every item) — the
    history-independence property the md5-derived compaction buys."""
    src = _src(spark, sf_dir)
    whole = kll_level_sketch(src, "cents", "h").collect()
    assert len(whole) == 1
    # 8 arbitrary "partitions" (any disjoint cover must give the same merge)
    parts = src.withColumn("p", F.pmod("event_id", F.lit(8)))
    per_part = kll_level_sketch(parts, "cents", "h", group_cols=["p"]).drop("p")
    merged = kll_merge(per_part).collect()
    assert len(merged) == 1
    w, m = whole[0], merged[0]
    assert (w.n, w.level) == (m.n, m.level)
    assert [(i.v, i.h) for i in w.items] == [(i.v, i.h) for i in m.items]


def test_kll_sketch_bounded_and_accurate(spark, sf_dir):
    """Size stays within the capacity band whatever the input size, and
    the q=0.5 answer's true rank error is inside the 1/sqrt(k) family
    bound (loose factor for the small-SF sample)."""
    src = _src(spark, sf_dir)
    row = kll_level_sketch(src, "cents", "h", k=256).collect()[0]
    n = row.n
    m = len(row.items)
    # expected size in (k/2, k]; allow 4-sigma binomial slack
    assert m <= 256 + 4 * 16 and (n <= 256 or m >= 128 - 4 * 12)
    est = sorted(i.v for i in row.items)[max(0, -(-m // 2) - 1)]
    count_le = src.filter(F.col("cents") <= est).count()
    assert abs(count_le / n - 0.5) < 4 / (256 ** 0.5)


def test_kll_merge_idempotent_on_single_sketch(spark, sf_dir):
    """Merging a single sketch with itself excluded (i.e. a 1-row merge)
    must be the identity — level recomputation lands on the same level."""
    src = _src(spark, sf_dir)
    sk = kll_level_sketch(src, "cents", "h")
    again = kll_merge(sk).collect()[0]
    orig = sk.collect()[0]
    assert (orig.n, orig.level) == (again.n, again.level)
    assert [(i.v, i.h) for i in orig.items] == [(i.v, i.h) for i in again.items]


@pytest.mark.parametrize(
    "name", ["bfs_hops_copurchase", "label_propagation_communities"]
)
def test_reliable_checkpoint_mode_agrees(spark, sf_dir, name):
    """iter_barrier's two modes (executor-local localCheckpoint vs
    reliable checkpoint()) must produce identical rows — the flag is a
    fault-tolerance choice, never a semantics choice."""
    from ecommerce_lakehouse_spark.operators.scale import (
        RELIABLE_CHECKPOINT_CONF,
    )
    from ecommerce_lakehouse_spark.queries import REGISTRY

    def rows():
        return sorted(map(tuple, REGISTRY[name](spark, sf_dir).collect()))

    spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    local = rows()
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        reliable = rows()
    finally:
        spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    assert local == reliable


def test_quality_classifier_learns_the_gate(spark, sf_dir):
    """The Bernoulli-NB presence scorer must actually LEARN the length
    gate (>=0.9 held-out accuracy) — guards against silently regressing
    to the chance-level multinomial form."""
    from ecommerce_lakehouse_spark.queries.llm10 import (
        quality_classifier_scores,
    )

    rows = quality_classifier_scores(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.label == r.predicted)
    assert n > 0 and correct / n >= 0.9, (correct, n)


def test_pq_training_reduces_error(spark, sf_dir):
    """k-means training must lower the PQ reconstruction error for the
    overwhelming majority of vectors (the query's stated contract)."""
    from ecommerce_lakehouse_spark.queries.llm10 import (
        pq_trained_codebook_eval,
    )

    rows = pq_trained_codebook_eval(spark, sf_dir).collect()
    improved = sum(1 for r in rows if r.improved)
    assert improved / len(rows) >= 0.9, (improved, len(rows))
    assert all(r.sq_err_trained >= 0 for r in rows)


def test_croston_matches_python_recompute(spark, sf_dir):
    """Croston/SBA per part vs an independent Python recomputation of
    the same sparse-entry recursion (the stats-family discipline)."""
    import math

    import pyspark.sql.functions as F

    from ecommerce_lakehouse_spark.queries.llm10 import load as _load
    from ecommerce_lakehouse_spark.queries.stats2 import (
        _CROSTON_ALPHA,
        croston_demand_forecast,
    )

    got = {r.l_partkey: r for r in croston_demand_forecast(spark, sf_dir).collect()}
    o = _load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _load(spark, sf_dir, "lineitem")
    m0 = o.agg(F.min(F.date_trunc("month", "o_orderdate")).alias("m")).collect()[0].m
    pm = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "l_partkey",
            (
                F.months_between(
                    F.to_date(F.date_trunc("month", "o_orderdate")),
                    F.lit(m0).cast("timestamp"),
                )
                + 1
            )
            .cast("long")
            .alias("idx"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("q"))
        .collect()
    )
    series: dict = {}
    for r in pm:
        series.setdefault(r.l_partkey, []).append((r.idx, r.q))
    a = _CROSTON_ALPHA
    for pk, entries in series.items():
        entries.sort()
        (i0, q0), rest = entries[0], entries[1:]
        z, p, prev = float(q0), float(i0), i0
        for idx, q in rest:
            z = z + a * (float(q) - z)
            p = p + a * (float(idx - prev) - p)
            prev = idx
        g = got[pk]
        assert g.n_demands == len(entries)
        assert math.isclose(g.croston_forecast, round(z / p, 9), rel_tol=1e-9, abs_tol=1e-9)


def test_kll_sketch_empty_survivor_group_keeps_its_n(spark):
    """A group whose items ALL miss the survival threshold must still
    emit an (n, level, []) row, and a merge must carry that group's n —
    dropping it silently undercounts the merged sketch (the bug the
    partition-invariance property caught; ids chosen so group A's five
    md5-60 hashes all exceed the k=1/n=5 threshold 2^57 while group B
    survives)."""
    import pyspark.sql.functions as F

    hi = [0, 1, 2, 3, 4]        # md5_hash60 >= 2^57 each
    lo = [27, 59, 60, 63, 119]  # md5_hash60 <  2^56 each
    rows = [(i, 100 + i, "A") for i in hi] + [(i, 200 + i, "B") for i in lo]
    df = spark.createDataFrame(rows, "rid long, cents long, p string").select(
        "p", "cents", md5_hash60(F.col("rid")).alias("h")
    )
    per = kll_level_sketch(df, "cents", "h", k=1, group_cols=["p"])
    got = {r.p: r for r in per.collect()}
    assert set(got) == {"A", "B"}
    assert got["A"].n == 5 and list(got["A"].items) == []
    assert got["B"].n == 5 and len(got["B"].items) > 0
    merged = kll_merge(per.drop("p"), k=1).collect()
    whole = kll_level_sketch(df, "cents", "h", k=1).collect()
    assert len(merged) == 1 and len(whole) == 1
    w, m = whole[0], merged[0]
    assert (w.n, w.level) == (m.n, m.level) == (10, 4)
    assert [(i.v, i.h) for i in w.items] == [(i.v, i.h) for i in m.items]


def test_kll_grouped_merge_mergeable(spark, sf_dir):
    """Grouped form of the merge law: per-group union of per-partition
    sketches merged == per-group whole-data sketch, bit-identical for
    every group (operators/sketch.py::kll_merge_grouped)."""
    from ecommerce_lakehouse_spark.operators.sketch import kll_merge_grouped

    src = _src(spark, sf_dir).withColumn(
        "g", F.pmod("event_id", F.lit(3)).cast("int")
    )
    whole = {
        r.g: r
        for r in kll_level_sketch(src, "cents", "h", k=256, group_cols=["g"]).collect()
    }
    parts = src.withColumn("p", F.pmod(F.col("event_id") * 7, F.lit(5)))
    per_part = kll_level_sketch(
        parts, "cents", "h", k=256, group_cols=["g", "p"]
    ).drop("p")
    merged = {
        r.g: r for r in kll_merge_grouped(per_part, ["g"], k=256).collect()
    }
    assert set(merged) == set(whole)
    for g, w in whole.items():
        m = merged[g]
        assert (w.n, w.level) == (m.n, m.level), g
        assert [(i.v, i.h) for i in w.items] == [(i.v, i.h) for i in m.items], g
