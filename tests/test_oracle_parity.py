"""The engine's primary correctness gate, run locally: every registered
query vs its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01).
Mirrors the reference's recompute-and-compare validation strategy
(docs/data_quality.md:301-372) with DuckDB as the independent recomputation.
"""

import pytest

from ecommerce_lakehouse_spark.queries import ORACLES, REGISTRY
from ecommerce_lakehouse_spark.testing import check_query


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
