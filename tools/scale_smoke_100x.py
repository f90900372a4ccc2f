"""100× scale smoke for the five scale-critical families (VERDICT r07
item #4): one decade beyond the 10× smoke on the machine's budget.

The 10× smoke validates slopes; this run validates the MEMORY CEILING —
for each family it reports wall seconds AND ``max_task_rows``, the
largest row count any one task must hold/sort/aggregate (the r04 rank
smoke's metric, computed analytically per family the same way). A shape
that is secretly single-task (global window, uncapped hot bucket,
unbounded adjacency fanout) shows up here as max_task_rows ~ input size
even when 32 warm cores hide it in wall time.

Families and their ceiling metric:
- exact dedup (documents 100×): max DISTINCT hashes per reduce
  partition (map-side combine means reducers see groups, not rows) and
  max single-group multiplicity (the combiner's per-key cell).
- MinHash-LSH (documents 100×): max band-bucket size AFTER the
  canonical collapse, pre-cap — the candidate join's fanout driver.
- span dedup (documents 100×): max occurrence count of the hottest
  span (the count combiner's per-key cell) and spans per reduce
  partition.
- bucketed ranks (events/orders 100×): max fixed-width bucket
  population — the one task-local sort the de-windowed rank design
  pays (vs the retired global window's task = ENTIRE input).
- graph (lineitem 100×, part keys unshifted → 100× DENSER baskets):
  max adjacency degree on the relative-support co-purchase graph — the
  wedge-join fanout driver; the relative threshold (2n/150k baskets)
  is exactly what must keep this bounded as baskets multiply.

Usage: python tools/scale_smoke_100x.py [K] [base_sf_dir]
Writes the corpus under /tmp/spark_graft_scale_smoke_100x, prints one
JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402
from ecommerce_lakehouse_spark.tables import load  # noqa: E402

OUT = "/tmp/spark_graft_scale_smoke_100x"

# (table, keys to shift per replica); lineitem part keys unshifted on
# purpose — the graph densifies (the adversarial direction)
_REPLICATED = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
}

QUERIES = [
    "exact_dedup",
    "band_skew_profile",
    "minhash_lsh_pairs",
    "span_dedup_spans",
    "span_dedup_clean",
    "value_quantiles_exact",
    "customer_spend_deciles",
    "pagerank_copurchase",
    # r09: the corpus-sized word-count stage runs once at full width,
    # then the vocabulary-bounded merge loop — its wall should be FLAT
    # across 10x/100x (the loop never touches the corpus again)
    "bpe_merge_steps",
]


def build_corpus(spark, base: str, out: str, k: int) -> dict:
    sizes = {}
    for t, keys in _REPLICATED.items():
        df = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        strides = {
            c: v + 1
            for c, v in df.agg(*[F.max(c).alias(c) for c in keys])
            .collect()[0]
            .asDict()
            .items()
        }
        # replica index via a small cross join (a 100-element unionByName
        # chain is a 100-branch plan; this is one Generate)
        reps = df.crossJoin(
            spark.range(k).select(F.col("id").alias("__rep"))
        )
        for c in keys:
            reps = reps.withColumn(c, F.col(c) + F.col("__rep") * strides[c])
        # replicated text compresses so well that a naive write lands in
        # ONE input split (a 5M-doc table under 128 MB) and every scan
        # runs 1-2 tasks — write 64 files so the fixture parallelizes
        # like real data of this row count would
        reps.drop("__rep").repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        sizes[t] = df.count() * k
    return sizes


def ceilings(spark, out: str, width: int = 32) -> dict:
    """The per-family max_task_rows metrics (see module docstring)."""
    from ecommerce_lakehouse_spark.operators.scale import fixed_width_bucket
    from ecommerce_lakehouse_spark.queries.llm2 import (
        minhash_bands_df,
        minhash_signatures_df,
    )

    m: dict = {}
    d = load(spark, out, "documents")

    hashes = d.select(F.md5("text").alias("h"))
    per_hash = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    row = per_hash.select(
        F.max("c").alias("max_mult"),
        (F.count(F.lit(1)) / width).cast("long").alias("groups_per_part"),
    ).first()
    m["exact_dedup"] = {
        "max_group_multiplicity": row["max_mult"],
        "distinct_groups_per_reducer": row["groups_per_part"],
    }

    canon = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.min_by("text", "doc_id").alias("text")
    )
    bands = minhash_bands_df(
        minhash_signatures_df(canon.select("doc_id", "text"))
    )
    m["minhash_lsh"] = {
        "max_band_bucket_post_collapse": bands.groupBy("band_key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    }

    from ecommerce_lakehouse_spark.queries.llm5 import _span_hashes

    spans = _span_hashes(d)
    row = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.max("c").alias("hot"),
            (F.count(F.lit(1)) / width).cast("long").alias("per_part"),
        )
        .first()
    )
    m["span_dedup"] = {
        "hottest_span_occurrences": row["hot"],
        "distinct_spans_per_reducer": row["per_part"],
    }

    e = load(spark, out, "events")
    st = e.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    m["bucketed_ranks"] = {
        "max_value_bucket": e.join(F.broadcast(st))
        .groupBy(
            fixed_width_bucket(F.col("value"), F.col("lo"), F.col("hi"), 4096).alias("b")
        )
        .count()
        .agg(F.max("count"))
        .first()[0],
        "global_window_equivalent": e.count(),
    }

    from ecommerce_lakehouse_spark.queries.graph_ml import _support_graph

    _, adj = _support_graph(spark, out)
    m["graph"] = {
        "max_degree": adj.groupBy("z").count().agg(F.max("count")).first()[0],
        "edges": adj.count() // 2,
    }
    return m


def curation_two_batches(spark, out: str) -> dict:
    """100x evidence for the flagship MERGE-incremental pipeline
    (VERDICT r08 #3): run ``curate()`` as TWO committed batches and
    report per-batch wall plus the stage-4 candidate-pair volume — the
    number the "new ⋈ index, never index ⋈ index" contract keeps
    batch-driven as the index grows.

    - batch 1 (bootstrap): the full 100x replicated documents table
      (500k rows collapsing to the base corpus's distinct texts) — the
      heavy-duplication ingest shape.
    - batch 2 (incremental): an equally-sized batch of entirely NEW
      distinct texts (ids monotonically above batch 1 per the
      pipeline's contract). Each text is 8 md5 words from a sliding
      window over the id space, so every new doc is a genuine near-dup
      of its ~7 id-neighbors — the index grows by the full batch AND
      stage 4 does real bounded-fanout candidate work, never
      index ⋈ index.
    """
    import shutil as _sh

    from ecommerce_lakehouse_spark.pipelines.curation import curate

    root = os.path.join("/tmp", "spark_graft_curation_100x")
    _sh.rmtree(root, ignore_errors=True)
    d = load(spark, out, "documents")

    rep: dict = {}
    t0 = time.time()
    t = curate(spark, d, root, txn={"app_id": "scale100", "version": 1})
    rep["batch1_sec"] = round(time.time() - t0, 2)
    rep["batch1_pairs"] = t["pairs"].read().count()
    rep["batch1_canonicals"] = t["canonical"].read().count()

    # monotone ids above batch 1; unique 8-word texts (pass the quality
    # gate: >=5 words, no duplicate bigrams, no emails)
    hi = d.agg(F.max("doc_id")).first()[0] + 1
    words = [F.md5((F.col("doc_id") + F.lit(i)).cast("string")) for i in range(8)]
    batch2 = d.select(
        (F.col("doc_id") + F.lit(hi)).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        "lang",
        "source",
    )
    t0 = time.time()
    t = curate(spark, batch2, root, txn={"app_id": "scale100", "version": 2})
    rep["batch2_sec"] = round(time.time() - t0, 2)
    rep["batch2_pairs_delta"] = t["pairs"].read().count() - rep["batch1_pairs"]
    rep["batch2_canonicals_delta"] = (
        t["canonical"].read().count() - rep["batch1_canonicals"]
    )
    rep["final_index_max_bucket"] = (
        t["band_index"].read().groupBy("band_key").count().agg(F.max("count")).first()[0]
    )
    rep["survivors"] = t["survivors"].read().count()
    _sh.rmtree(root, ignore_errors=True)
    return rep


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 100
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    skip_build = "--skip-build" in sys.argv

    spark = get_spark("scale-smoke-100x")
    if skip_build and os.path.isdir(OUT):
        sizes = {}
    else:
        shutil.rmtree(OUT, ignore_errors=True)
        os.makedirs(OUT, exist_ok=True)
        sizes = build_corpus(spark, base, OUT, k)
    report: dict = {"k": k, "base": base, "tables": sizes, "queries": {}}
    for name in QUERIES:
        t0 = time.time()
        rows = REGISTRY[name](spark, OUT).count()
        report["queries"][name] = {
            "sec": round(time.time() - t0, 2), "rows": rows
        }
        print(
            f"{name:28s} {report['queries'][name]['sec']:8.2f}s  {rows} rows",
            file=sys.stderr, flush=True,
        )
    t0 = time.time()
    report["max_task_rows"] = ceilings(spark, OUT)
    report["ceilings_sec"] = round(time.time() - t0, 2)
    if "--skip-pipelines" not in sys.argv:
        t0 = time.time()
        report["curation_two_batches"] = curation_two_batches(spark, OUT)
        report["curation_sec"] = round(time.time() - t0, 2)
        print(
            f"curation 2-batch: {report['curation_two_batches']}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
