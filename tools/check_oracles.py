"""Run every registered query against its DuckDB oracle and report.

Usage: python tools/check_oracles.py [--tz ZONE] [--oracle-budget SEC]
       [sf_dir] [query_name ...]

--tz runs the whole gate under a non-UTC session timezone (e.g.
America/New_York) — the probe that catches timestamp normalization bugs
whose rendered wall clock depends on the session zone.

--oracle-budget SEC (default 5) tags any query whose DUCKDB ORACLE alone
exceeds SEC wall seconds — expensive oracles silently dominate the gate
(frequent_triple's original oracle: 167 s at sf0.1) and should be
rewritten at authoring time. The tag is a warning, not a failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark
from ecommerce_lakehouse_spark.queries import ORACLES, REGISTRY
from ecommerce_lakehouse_spark.testing import check_query


def main() -> int:
    args = sys.argv[1:]
    tz = None
    budget = 5.0
    def _flag_value(flag: str) -> str | None:
        if flag not in args:
            return None
        i = args.index(flag)
        if i + 1 >= len(args):
            raise SystemExit(f"usage: {flag} <value> (value missing)")
        v = args[i + 1]
        del args[i : i + 2]
        return v

    v = _flag_value("--oracle-budget")
    if v is not None:
        try:
            budget = float(v)
        except ValueError:
            raise SystemExit(f"usage: --oracle-budget <seconds>, got {v!r}")
    tz = _flag_value("--tz")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    extra = {"spark.sql.session.timeZone": tz} if tz else None
    spark = get_spark("oracle-check", extra_conf=extra)
    if tz:
        # getOrCreate may reuse a session built with UTC — force the conf
        spark.conf.set("spark.sql.session.timeZone", tz)
        print(f"session timezone: {tz}")
    failures = []
    slow_oracles = []
    n_run = 0
    for name, fn in REGISTRY.items():
        if names and name not in names:
            continue
        n_run += 1
        t0 = time.time()
        try:
            ok, msg = check_query(spark, name, fn, ORACLES.get(name), sf_dir,
                                  oracle_budget_sec=budget)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name:32s} {dt:6.2f}s  {msg}")
        if not ok:
            failures.append(name)
        if "ORACLE SLOW" in msg:
            slow_oracles.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if slow_oracles:
        print("slow oracles (over budget):", ", ".join(slow_oracles))
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
