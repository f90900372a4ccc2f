"""Dump plans/r10/<query>_<suffix>.txt — `.explain("formatted")` for the
queries named on the command line, at sf0.001 (the r09 snapshot SF).

Usage: python tools/dump_r10_plans.py before q1 q2 ...
       python tools/dump_r10_plans.py after q1 q2 ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "suffix must be before|after"
    names = sys.argv[2:]
    spark = get_spark("dump-r10-plans")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = REGISTRY[name](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
