"""Registry-wide K× scale smoke (VERDICT r07 item #1).

The 10× adversarial smokes (`scale_smoke.py` dedup/ANN family,
`scale_smoke_mining.py` round-6/7 analytics) cover ~90 queries; the
other ~180 registry entries (TPC-H, gold marts, storage snapshots,
stats waves 1-5) had never been measured above sf0.1. This tool runs
the ENTIRE registry against a K× replication of sf0.1 (same key-shifted
corpus builder as the mining smoke — referential integrity holds across
replicas, lineitem part keys unshifted so the co-purchase graph
densifies, date domains unshifted so calendar-bounded frames keep their
domain bound) and grades every query against a PER-CLASS bound derived
from its committed sf0.1 profile (BENCH_DETAIL.json):

- data_bound queries scan/shuffle data proportional to input, so K×
  input may cost up to ~K× wall: bound = max(10 s, 1.2*K × profile).
- job_count_bound queries (iterative loops, multi-commit DAGs, and
  sub-second fixed-cost entries — bench._class_of's definition) are
  dominated by per-job fixed cost that does NOT grow with data:
  bound = max(10 s, 4 × profile).

Queries with no profile entry get the absolute 10 s bound only. A query
over its bound is a scale defect to fix (the frequent_triple / kcore
treatment: rewrite + re-gate), not a number to record and move past.

Usage:
  python tools/scale_smoke_all.py [K] [base_sf_dir] [--queries a,b,c]
         [--skip-build] [--start-at NAME]
Writes the corpus under /tmp/spark_graft_scale_smoke_all, prints one
JSON report line (recorded in BASELINE.md); exit code = #over-bound
capped at 125 (0 = all under bound), 2 = bad --queries name.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

OUT = "/tmp/spark_graft_scale_smoke_all"


def main() -> int:
    argv = sys.argv[1:]
    only: list[str] = []
    start_at = None
    if "--queries" in argv:
        i = argv.index("--queries")
        only = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    if "--start-at" in argv:
        i = argv.index("--start-at")
        start_at = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    skip_build = "--skip-build" in argv
    args = [a for a in argv if not a.startswith("--")]
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    import bench
    from tools.scale_smoke_mining import build_corpus

    if only:
        unknown = [n for n in only if n not in REGISTRY]
        if unknown:
            print(f"unknown --queries names: {unknown}", file=sys.stderr)
            return 2

    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")) as f:
        profile = json.load(f)["queries"]

    spark = get_spark("scale-smoke-all")
    if skip_build and os.path.isdir(OUT):
        sizes = {}
    else:
        shutil.rmtree(OUT, ignore_errors=True)
        os.makedirs(OUT, exist_ok=True)
        sizes = build_corpus(spark, base, OUT, k)

    names = [n for n in REGISTRY if not only or n in only]
    if start_at and start_at in names:
        names = names[names.index(start_at):]
    report: dict = {"k": k, "base": base, "tables": sizes, "queries": {}}
    over: list[str] = []
    for name in names:
        p = profile.get(name)
        cls = bench._class_of(name, p) if p is not None else "unprofiled"
        if p is None:
            bound = 10.0
        elif cls == "job_count_bound":
            bound = max(10.0, 4.0 * p)
        else:
            bound = max(10.0, 1.2 * k * p)
        t0 = time.time()
        try:
            rows = REGISTRY[name](spark, OUT).count()
            err = None
        except Exception as e:  # noqa: BLE001
            rows, err = -1, f"{type(e).__name__}: {e}"[:300]
        sec = round(time.time() - t0, 2)
        entry = {"sec": sec, "rows": rows, "class": cls, "bound": round(bound, 1)}
        if err:
            entry["err"] = err
        report["queries"][name] = entry
        flag = ""
        if err:
            flag = "  ERR"
            over.append(name)
        elif sec > bound:
            flag = f"  OVER BOUND ({bound:.0f}s)"
            over.append(name)
        print(f"{name:36s} {sec:8.2f}s  {rows:>10} rows  [{cls}]{flag}",
              file=sys.stderr, flush=True)
    report["over_bound"] = over
    print(json.dumps(report))
    # bounded exit code (a raw count wraps mod 256 — 256 failures would
    # read as success); the report carries the exact list
    return min(len(over), 125)


if __name__ == "__main__":
    sys.exit(main())
