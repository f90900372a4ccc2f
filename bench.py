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
    payload = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
    }
    # Full detail to stderr + sidecar file; stdout gets ONE JSON line capped
    # at ~1800 chars (the harness keeps only the last 2000 chars of stdout —
    # a 105-query dict blows that buffer and parses as null). If the full
    # dict doesn't fit, keep the slowest queries and count the rest.
    full = json.dumps(payload)
    print(full, file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    if len(full) > 1800:
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1]))
        kept: dict[str, float] = {}
        for k, v in slowest.items():
            kept[k] = v
            payload["queries"] = kept
            payload["queries_omitted"] = len(times) - len(kept)
            if len(json.dumps(payload)) > 1800:
                kept.pop(k)
                payload["queries"] = kept
                payload["queries_omitted"] = len(times) - len(kept)
                break
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
