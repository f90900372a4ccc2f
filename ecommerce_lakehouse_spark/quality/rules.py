"""Rule-driven validation engine (reference src/etl_utils.py:110-297).

The reference validates each dataset with null / range / referential-
integrity checks, accumulating distinct error messages into an
``ArrayType(StringType)`` column (U:133-158 array_union pattern), then
splits the frame into valid / rejected branches (U:275-281) and enriches
rejected rows with audit metadata (src/glue_etl.py:334-360).

Design for scale: every rule compiles to a Column expression evaluated in
one pass (no per-rule jobs); referential integrity is a key-pruned join
(broadcast when the key set is small) — never the reference's legacy
collect()+isin (G:153-189, banned per SURVEY §7.5). Error arrays are built
in declared rule order, so downstream string renderings are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

ERRORS_COL = "validation_errors_list"


@dataclass(frozen=True)
class NotNull:
    """U:148-159: non-nullable schema fields drive generic null checks."""

    column: str

    def message(self) -> str:
        return f"Null {self.column}"

    def violation(self, df: DataFrame) -> Column:
        return F.col(self.column).isNull()


@dataclass(frozen=True)
class Range:
    """U:246-258 / G:214: numeric range predicates (min/max inclusive)."""

    column: str
    min: float | None = None
    max: float | None = None

    def message(self) -> str:
        return f"Out-of-range {self.column}"

    def violation(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        v = F.lit(False)
        if self.min is not None:
            v = v | (c < self.min)
        if self.max is not None:
            v = v | (c > self.max)
        return c.isNotNull() & v


@dataclass(frozen=True)
class Custom:
    """Q:273-279: arbitrary boolean Column predicate."""

    condition: Column
    msg: str

    def message(self) -> str:
        return self.msg

    def violation(self, df: DataFrame) -> Column:
        return self.condition


@dataclass(frozen=True)
class RefIntegrity:
    """U:165-245: FK must exist in the reference table's key column.

    Implemented as distinct-key left join + null-flag check (the
    flag-back J3 pattern), one shuffle, broadcastable."""

    column: str
    ref: DataFrame
    ref_column: str
    broadcast: bool = True

    def message(self) -> str:
        return f"Invalid {self.column} reference"

    def flag_col(self) -> str:
        return f"__ri_ok_{self.column}"


def validate(df: DataFrame, rules: list) -> DataFrame:
    """Append ``validation_errors_list`` (array<string>, empty = valid),
    accumulating messages in declared rule order (deterministic)."""
    # Phase 1: RI joins add presence flags (single plan, Catalyst merges
    # the joins; each is key-pruned to the ref key column only).
    out = df
    for r in rules:
        if isinstance(r, RefIntegrity):
            keys = r.ref.select(F.col(r.ref_column).alias("__ref_key")).distinct().withColumn(
                r.flag_col(), F.lit(True)
            )
            keys = F.broadcast(keys) if r.broadcast else keys
            out = out.join(keys, out[r.column] == keys["__ref_key"], "left").drop("__ref_key")

    # Phase 2: one expression builds the error array in rule order.
    errors = F.array().cast("array<string>")
    for r in rules:
        if isinstance(r, RefIntegrity):
            viol = F.col(r.column).isNotNull() & F.col(r.flag_col()).isNull()
        else:
            viol = r.violation(df)
        errors = F.when(viol, F.array_union(errors, F.array(F.lit(r.message())))).otherwise(errors)

    out = out.withColumn(ERRORS_COL, errors)
    return out.drop(*[r.flag_col() for r in rules if isinstance(r, RefIntegrity)])


def split_valid_rejected(
    validated: DataFrame,
    source: str = "unknown",
    job_name: str = "local",
    with_metadata: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """P5 dual-output split (U:275-281) + rejected-audit enrichment
    (G:334-360: rejection_time/source/job_name). The two branches are
    complementary filters off one plan — cache the parent if both sides
    are consumed."""
    is_valid = F.size(F.col(ERRORS_COL)) == 0
    valid = validated.filter(is_valid).drop(ERRORS_COL)
    rejected = validated.filter(~is_valid).withColumn(
        "validation_errors", F.concat_ws("; ", F.col(ERRORS_COL))
    ).drop(ERRORS_COL)
    if with_metadata:
        rejected = (
            rejected.withColumn("rejection_time", F.current_timestamp())
            .withColumn("source", F.lit(source))
            .withColumn("job_name", F.lit(job_name))
        )
    return valid, rejected
