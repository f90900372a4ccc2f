"""Dump plans/r09/<query>_after.txt — `.explain("formatted")` for the
queries named on the command line, at sf0.001 (same SF as the _before
snapshots). Run after each optimization change.

Usage: python tools/dump_after_plans.py q1 q2 ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("dump-after-plans")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = REGISTRY[name](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_after.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
