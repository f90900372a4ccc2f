"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default sf0.1), fully materialized via the noop sink (so column pruning
can't skip work), printed as ONE JSON line.

Usage: python bench.py [--warmup N] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402


def materialize(df) -> None:
    # noop datasource: full pipeline execution, zero sink cost
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--queries", type=str, default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    names = [n for n in args.queries.split(",") if n] or list(REGISTRY)

    # JVM/codegen warmup on the flagship
    for _ in range(args.warmup):
        materialize(REGISTRY["daily_sales"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        materialize(REGISTRY[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "n_queries": len(times),
            }
        )
    )


if __name__ == "__main__":
    main()
