"""Local replica of the driver's correctness gate: run a query's Spark plan
and its DuckDB oracle on the same parquet tables, canonicalize both frames,
and diff (column set + row multiset of canonicalized values).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pandas as pd

from ecommerce_lakehouse_spark.tables import TABLES

NULL_TOKEN = "∅"


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def _canon_cell(x) -> str:
    if x is None:
        return NULL_TOKEN
    if isinstance(x, decimal.Decimal):
        x = float(x)
    if isinstance(x, float):
        if math.isnan(x):
            return NULL_TOKEN
        # Strict: 5.0 != 5. The driver's value-hash distinguishes int64 from
        # float64 cells, so the local gate must too — oracles must CAST integer
        # aggregates (DuckDB sum(BIGINT) -> HUGEINT -> pandas float64) back to
        # BIGINT rather than rely on canonicalization.
        return repr(x)
    if isinstance(x, (pd.Timestamp, datetime.datetime)):
        if pd.isna(x):
            return NULL_TOKEN
        return pd.Timestamp(x).isoformat()
    if isinstance(x, datetime.date):
        return pd.Timestamp(x).isoformat()
    if isinstance(x, (int, bool, str)):
        return str(x)
    if pd.isna(x):
        return NULL_TOKEN
    return str(x)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return False, f"column mismatch: spark={sc} oracle={oc}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    srows, orows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return False, f"first differing row (sorted) #{i} cols={sc}:\n  spark : {a}\n  oracle: {b}"
    return True, f"OK ({len(srows)} rows)"


def check_query(
    spark, name: str, fn, sql: str | None, sf_dir: str,
    oracle_budget_sec: float | None = None,
) -> tuple[bool, str]:
    """Run the Spark query and its DuckDB oracle, compare.

    ``oracle_budget_sec``: warn (in the returned message) when the
    ORACLE alone exceeds this wall time — an oracle whose cost silently
    dominates the gate (the frequent_triple lesson: 167 s at sf0.1
    before its rewrite) should be caught at authoring time, not in a
    slow verify round."""
    import time as _time

    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if sql is None:
        ok = len(spdf) >= 0
        return ok, f"rows-only ({len(spdf)} rows, no oracle)"
    t0 = _time.time()
    opdf = run_oracle(sql, sf_dir)
    o_sec = _time.time() - t0
    ok, msg = compare_frames(spdf, opdf)
    # tag independently of pass/fail: a slow oracle on a still-failing
    # query is exactly the authoring-time moment the flag exists for
    if oracle_budget_sec is not None and o_sec > oracle_budget_sec:
        msg += f"  [ORACLE SLOW: {o_sec:.1f}s > {oracle_budget_sec:.0f}s budget]"
    return ok, msg
