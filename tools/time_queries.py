"""Time a subset of registered queries N times in one session (noop sink,
bench.py methodology) — the quick A/B harness for optimization work.

Usage: python tools/time_queries.py q1,q2,... [--repeat N] [--sf DIR]
Prints per-query min/median wall across repeats (min is the comparable
number on a drifting host; bench.py single-shot remains the committed
protocol).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeat = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args[0].split(",") if args else list(REGISTRY)
    spark = get_spark("timeq")
    # warmup, same as bench.py
    REGISTRY["daily_sales"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        walls = []
        for _ in range(repeat):
            t0 = time.time()
            REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        walls.sort()
        print(
            f"{name:42s} min={walls[0]:6.3f} med={walls[len(walls)//2]:6.3f} "
            f"all={[round(w,2) for w in walls]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
