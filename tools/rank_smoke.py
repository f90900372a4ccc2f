"""Rank-family scale smoke: replicate events/orders K× and measure the
distributed bucketed-rank queries against the single-partition
global-window shapes they replaced (r03 verdict item #1).

Replication is the adversarial direction for the bucket design: every
value appears K× more often (tie mass grows), per-customer rows multiply,
and the retired shapes' single WindowExec partition grows K× — while the
bucketed rewrite's per-bucket partitions stay ~1/buckets of the input.

Reports wall seconds for:
- ``quantiles_bucketed`` / ``deciles_bucketed``: the registered queries
  (operators/scale.py:bucketed_global_row_number machinery);
- ``quantiles_window`` / ``deciles_window``: the retired
  `row_number()/ntile() OVER (ORDER BY ...)` single-partition forms,
  inlined here purely as the measured baseline.

Usage: python tools/rank_smoke.py [K] [base_sf_dir]
Writes the synthetic tables under /tmp/spark_graft_rank_smoke; prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.money import dec2  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402
from ecommerce_lakehouse_spark.tables import load  # noqa: E402


def build(spark, base: str, out: str, k: int) -> dict:
    ev = spark.read.parquet(os.path.join(base, "events.parquet"))
    n = ev.count()
    reps = None
    for i in range(k):
        r = ev.withColumn("event_id", F.col("event_id") + F.lit(i * n))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    o = spark.read.parquet(os.path.join(base, "orders.parquet"))
    m = o.count()
    oreps = None
    for i in range(k):
        r = o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * m)).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * 10_000_000)
        )
        oreps = r if oreps is None else oreps.unionByName(r)
    oreps.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    return {"events": n * k, "orders": m * k}


def quantiles_window(spark, sf_dir: str):
    """The RETIRED shape: global row_number, one task sorts everything."""
    e = load(spark, sf_dir, "events")
    s = e.select(
        "value",
        (F.row_number().over(Window.orderBy(F.asc("value"), F.asc("event_id"))) - 1).alias("rn"),
    )
    nn = e.agg(F.count("*").alias("n"))
    p = spark.range(1).select(
        F.explode(F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("pct")
    )
    idx = F.col("pct") * (F.col("n") - 1)
    ix = p.join(F.broadcast(nn)).select(
        "pct",
        F.floor(idx).cast("bigint").alias("lo"),
        F.ceil(idx).cast("bigint").alias("hi"),
        (idx - F.floor(idx)).alias("frac"),
    )
    slo = s.select(F.col("rn").alias("lo"), F.col("value").alias("lo_val"))
    shi = s.select(F.col("rn").alias("hi"), F.col("value").alias("hi_val"))
    return (
        slo.join(F.broadcast(ix), "lo")
        .join(shi, "hi")
        .select(
            "pct",
            (F.col("lo_val") + (F.col("hi_val") - F.col("lo_val")) * F.col("frac")).alias("qvalue"),
        )
    )


def deciles_window(spark, sf_dir: str):
    """The RETIRED shape: global ntile(10) over per-customer rows."""
    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(F.sum(dec2("o_totalprice")).alias("spend"))
    w = Window.orderBy(F.desc("spend"), "o_custkey")
    d = s.withColumn("decile", F.ntile(10).over(w))
    return d.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.min("spend").cast("double").alias("min_spend"),
        F.max("spend").cast("double").alias("max_spend"),
        F.sum("spend").cast("double").alias("total_spend"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_rank_smoke"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    spark = get_spark("rank-smoke")
    sizes = build(spark, base, out, k)
    report: dict = {"k": k, "base": base, **sizes, "queries": {}}
    runs = [
        ("quantiles_bucketed", lambda: REGISTRY["value_quantiles_exact"](spark, out)),
        ("quantiles_window", lambda: quantiles_window(spark, out)),
        ("deciles_bucketed", lambda: REGISTRY["customer_spend_deciles"](spark, out)),
        ("deciles_window", lambda: deciles_window(spark, out)),
    ]
    results: dict[str, list] = {}
    for name, fn in runs:
        t0 = time.time()
        rows = sorted(map(str, fn().collect()))
        report["queries"][name] = {"sec": round(time.time() - t0, 2), "rows": len(rows)}
        results[name.split("_")[0]] = results.get(name.split("_")[0], []) + [rows]
        print(f"{name:22s} {report['queries'][name]['sec']:7.2f}s", file=sys.stderr)
    # the rewrite must be value-identical to the retired shape, not just fast
    report["quantiles_match"] = results["quantiles"][0] == results["quantiles"][1]
    report["deciles_match"] = results["deciles"][0] == results["deciles"][1]

    # The scale-limiting metric: the largest row count any ONE task must
    # sort. Wall times at this SF are comparable (a single task sorting
    # ~1M rows is cheap); the shapes differ in their MEMORY CEILING — the
    # window forms put the entire input in one task (OOM at 100 TB), the
    # bucketed forms cap every task at ~input/buckets.
    from ecommerce_lakehouse_spark.operators.scale import fixed_width_bucket

    e = load(spark, out, "events")
    vc = e.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    st = vc.agg(
        F.count(F.lit(1)).alias("nd"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    qmax = (
        vc.join(F.broadcast(st))
        .groupBy(fixed_width_bucket(F.col("value"), F.col("lo"), F.col("hi"), 4096).alias("b"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    o = load(spark, out, "orders")
    cust = o.groupBy("o_custkey").agg(F.sum(dec2("o_totalprice")).alias("spend"))
    cst = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(-F.col("spend").cast("double")).alias("lo"),
        F.max(-F.col("spend").cast("double")).alias("hi"),
    )
    dmax = (
        cust.join(F.broadcast(cst))
        .groupBy(
            fixed_width_bucket(-F.col("spend").cast("double"), F.col("lo"), F.col("hi"), 1024).alias("b")
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    report["max_task_rows"] = {
        "quantiles_window": sizes["events"],
        "quantiles_bucketed": qmax,
        "deciles_window": o.select("o_custkey").distinct().count(),
        "deciles_bucketed": dmax,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
