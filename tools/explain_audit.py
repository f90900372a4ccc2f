"""Explain-plan audit: print scale-critical physical-plan properties for
every registered query (or a subset).

Usage: python tools/explain_audit.py [query ...]

For each query reports: join strategies used, whether any cartesian
product appears, pushed filters per parquet scan, and read-schema width —
the things that decide whether the plan survives a 100x scale-up.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
)


def audit(df) -> dict:
    text = plan_text(df)
    joins = sorted(set(JOIN_RE.findall(text)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return {
        "joins": joins,
        "cartesian": "CartesianProduct" in joins,
        "pushed_filters": [p for p in pushed if p],
        "read_widths": [len(s.split(",")) if s else 0 for s in schemas],
        "exchanges": text.count("Exchange"),
    }


# Logical nodes whose output cardinality is bounded (aggregated / limited /
# literal) regardless of input size — a global-order window over one of
# these is a bounded sort, not a scale bug.
_BOUNDED_NODES = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "LocalRelation",
    "OneRowRelation",
    "Range",
    "Deduplicate",
}


def _children(node) -> list:
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _bounded(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in _BOUNDED_NODES:
        return True
    ch = _children(node)
    if not ch:
        return False  # leaf relation: raw-table cardinality
    return all(_bounded(c) for c in ch)


def unbounded_global_windows(df) -> list[str]:
    """Scan the optimized logical plan for Window nodes with an EMPTY
    partition spec whose input is raw-table cardinality (no Aggregate /
    limit / literal relation anywhere below). Such a window executes as
    `WindowExec: No Partition Defined` — ONE task sorting the entire
    input, the canonical 100 TB OOM. Returns a description per offender
    (empty list = clean)."""
    bad: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            if not all(_bounded(c) for c in _children(node)):
                bad.append(node.simpleString(80))
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain-audit")
    names = sys.argv[1:] or sorted(REGISTRY)
    for name in names:
        info = audit(REGISTRY[name](spark, sf_dir))
        flag = "  !! CARTESIAN" if info["cartesian"] else ""
        print(
            f"{name:34s} joins={','.join(info['joins']) or '-':60s} "
            f"exchanges={info['exchanges']:2d} read_widths={info['read_widths']} "
            f"pushed={len(info['pushed_filters'])}{flag}"
        )


if __name__ == "__main__":
    main()
