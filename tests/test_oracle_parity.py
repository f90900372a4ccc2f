"""The engine's primary correctness gate, run locally: every registered
query vs its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01).
Mirrors the reference's recompute-and-compare validation strategy
(docs/data_quality.md:301-372) with DuckDB as the independent recomputation.
"""

import pytest

from ecommerce_lakehouse_spark.queries import ORACLES, REGISTRY
from ecommerce_lakehouse_spark.testing import check_query

# The full 273-query DuckDB parity sweep (the same gate tools/check_oracles.py
# runs standalone at three SFs in round-close). Slow tier: ~7 min of the suite;
# iterate per-query with  python tools/check_oracles.py <sf_dir> <name>  instead.
pytestmark = pytest.mark.slow



@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = check_query(spark, name, REGISTRY[name], ORACLES.get(name), sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_oracle_or_is_flagged(spark):
    # non-SQL-expressible ops are allowed to omit oracles, but by default
    # every query ships one; additions to this allowlist need a reason.
    allowed_rows_only: set[str] = set()
    missing = set(REGISTRY) - set(ORACLES) - allowed_rows_only
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"order_date", "order_count", "total_sales"}


def test_comparator_catches_corruption():
    """Canary for the gate itself: compare_frames must FAIL on a changed
    value, a dropped row, a renamed column, and an int->float type
    change — and must PASS on a pure row-order permutation (order
    insensitivity is the one intended equivalence). A comparator bug
    here would silently bless every query above."""
    import pandas as pd

    from ecommerce_lakehouse_spark.testing import compare_frames

    base = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})

    ok, _ = compare_frames(base, base.copy())
    assert ok

    shuffled = base.iloc[[2, 0, 1]].reset_index(drop=True)
    ok, _ = compare_frames(base, shuffled)
    assert ok, "row order must not matter"

    changed = base.copy()
    changed.loc[1, "v"] = 21
    ok, msg = compare_frames(base, changed)
    assert not ok and "differing row" in msg

    dropped = base.iloc[:2].reset_index(drop=True)
    ok, msg = compare_frames(base, dropped)
    assert not ok and "row count" in msg

    renamed = base.rename(columns={"v": "w"})
    ok, msg = compare_frames(base, renamed)
    assert not ok and "column mismatch" in msg

    floated = base.copy()
    floated["v"] = floated["v"].astype(float)
    ok, msg = compare_frames(base, floated)
    assert not ok, "int64 vs float64 cells must not canonicalize equal"

    # NULL and NaN are the same absent-value token across engines
    a = pd.DataFrame({"x": [None]})
    b = pd.DataFrame({"x": [float("nan")]})
    ok, _ = compare_frames(a, b)
    assert ok


def test_bench_loop_pipelines_exist_in_registry():
    """ADVICE r07: a misspelled _LOOP_PIPELINES entry silently
    misclassifies a query's drift class, skewing the per-class bench
    medians. Every name in the list must be a registered query."""
    import bench

    unknown = bench._LOOP_PIPELINES - set(REGISTRY)
    assert not unknown, f"_LOOP_PIPELINES names not in registry: {sorted(unknown)}"


def test_rotation_window_names_exist_in_registry():
    """Same failure mode as _LOOP_PIPELINES: a misspelled _FIRST/_NEXT
    rotation name silently drops out of the driver's correctness window
    instead of erroring — every curated name must be a registered query."""
    import re

    import __spark_entry__ as entry_mod

    src = open(entry_mod.__file__).read()
    blocks = {}
    for block in ("_FIRST = [", "_NEXT = ["):
        body = src.split(block)[1].split("]")[0]
        names = re.findall(r'"([a-z0-9_]+)"', body)
        blocks[block[:-4]] = names
        unknown = [n for n in names if n not in REGISTRY]
        assert not unknown, f"{block[:-4]} names not in registry: {unknown}"
        dups = sorted({n for n in names if names.count(n) > 1})
        assert not dups, (
            f"{block[:-4]} duplicate names (they collapse silently in the "
            f"ordered-dict build, shrinking the curated window): {dups}"
        )
    # VERDICT r08: the driver samples exactly 50 queries — a 51st
    # _FIRST name is silently never gated (r08 lost its
    # minhash_lsh_pairs anchor this way), and a shorter list wastes
    # window slots on uncurated registration order.
    assert len(blocks["_FIRST"]) == 50, (
        f"_FIRST must hold exactly 50 names (driver window size), "
        f"got {len(blocks['_FIRST'])}"
    )
    overlap = sorted(set(blocks["_FIRST"]) & set(blocks["_NEXT"]))
    assert not overlap, (
        f"_FIRST/_NEXT overlap (the _NEXT slots are dead weight): {overlap}"
    )
