"""Query catalog: every implemented operator from SURVEY.md §2 exposed as a
named (spark, sf_dir) -> DataFrame callable, with (where SQL-expressible) a
matching DuckDB oracle SQL string.

Registration happens via the @query decorator in each submodule; importing
this package populates REGISTRY / ORACLES.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query. ``oracle`` is ANSI SQL DuckDB runs over the same
    parquet tables (views pre-registered by the driver); omit it only for
    genuinely non-SQL-expressible operators (driver then does a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import side effects populate the registry.
from ecommerce_lakehouse_spark.queries import (  # noqa: E402,F401
    curation,
    events,
    experiment,
    gold,
    graph_ml,
    lakehouse,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    llm7,
    llm8,
    llm9,
    llm10,
    media,
    mining,
    quality,
    relational,
    stats,
    stats2,
    tpch,
    wave7,
    tpch2,
)
