"""Incremental materialized-aggregate maintenance (lake/mv.py):
incremental refresh must be indistinguishable from recompute."""

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.lake import LakeTable
from ecommerce_lakehouse_spark.lake.mv import MaterializedAggregate

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow


def _state(t):
    return {
        (r.g, r.n_rows, str(r.revenue)) for r in t.read().collect()
    }


def _recompute(src):
    return {
        (r.g, r.n_rows, str(r.revenue))
        for r in src.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("amt").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue"),
        )
        .collect()
    }


def test_mv_incremental_equals_recompute(spark, tmp_path):
    """Bootstrap, then fold a merge (including a group-moving update) and
    a delete incrementally: state is bit-identical to a from-scratch
    recompute at every step, and an emptied group's row disappears."""
    src = LakeTable(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "mv"))
    mv = MaterializedAggregate(src, dst, ["g"], {"revenue": "amt"})

    src.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.50), (2, "a", 4.25), (3, "b", 7.00), (4, "c", 1.00)],
            "k int, g string, amt double",
        ).coalesce(1)
    )
    assert mv.refresh() == src.current_version()  # bootstrap
    assert _state(dst) == _recompute(src)

    # merge: k=2 moves group a->b (CDF delete+insert), k=5 inserts into b
    src.merge(
        spark.createDataFrame(
            [(2, "b", 4.25), (5, "b", 2.75)], "k int, g string, amt double"
        ),
        keys=["k"],
    )
    assert mv.refresh() == src.current_version()
    assert _state(dst) == _recompute(src)
    assert dst.history()[-1]["operation"] == "mv_refresh"

    # delete empties group c entirely: its MV row must vanish
    src.delete("g = 'c'")
    mv.refresh()
    assert _state(dst) == _recompute(src)
    assert {r.g for r in dst.read().collect()} == {"a", "b"}

    # already current: no-op, no new version
    v = dst.current_version()
    assert mv.refresh() is None
    assert dst.current_version() == v

    # RANGED catch-up: two source commits folded by ONE refresh land on
    # the identical state per-commit refreshes would (fold associativity
    # over the slice — the shape mv_incremental_refresh benches)
    src.merge(
        spark.createDataFrame([(6, "d", 9.00)], "k int, g string, amt double"),
        keys=["k"],
    )
    src.delete("k = 1")
    assert mv.refresh() == src.current_version()
    assert _state(dst) == _recompute(src)


def test_mv_cursor_survives_reconstruction(spark, tmp_path):
    """The refresh cursor lives in the TABLE (txn metadata), not the
    Python object: a fresh MaterializedAggregate over the same tables
    resumes incrementally instead of re-bootstrapping."""
    src = LakeTable(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "mv"))
    MaterializedAggregate(src, dst, ["g"], {"revenue": "amt"})
    src.overwrite(
        spark.createDataFrame([(1, "a", 1.00)], "k int, g string, amt double")
    )
    MaterializedAggregate(src, dst, ["g"], {"revenue": "amt"}).refresh()
    ops_before = [m["operation"] for m in dst.history()]
    src.merge(
        spark.createDataFrame([(2, "a", 2.00)], "k int, g string, amt double"),
        keys=["k"],
    )
    mv2 = MaterializedAggregate(src, dst, ["g"], {"revenue": "amt"})
    mv2.refresh()
    ops = [m["operation"] for m in dst.history()]
    assert ops == ops_before + ["mv_refresh"]  # incremental, not overwrite
    assert _state(dst) == _recompute(src)


def test_stream_mv_refresh_maintains_mart(spark, tmp_path):
    """The streaming face of IVM: a change-feed stream folds signed
    deltas into the mart per microbatch, exactly-once across restarts,
    always matching a from-scratch recompute."""
    from ecommerce_lakehouse_spark.streaming.jobs import stream_mv_refresh

    src = LakeTable(spark, str(tmp_path / "src"))
    mart_root = str(tmp_path / "mart")
    ckpt = str(tmp_path / "ckpt")

    src.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.50), (2, "a", 4.25), (3, "b", 7.00)],
            "k int, g string, amt double",
        ).coalesce(1)
    )
    src.append(
        spark.createDataFrame([(4, "c", 1.00)], "k int, g string, amt double")
    )
    q = stream_mv_refresh(
        spark, str(tmp_path / "src"), mart_root, ["g"], {"revenue": "amt"}, ckpt
    )
    q.awaitTermination(120)
    mart = LakeTable(spark, mart_root)
    assert _state(mart) == _recompute(src)

    # more commits, fresh stream from the same checkpoint: resumes, no
    # double counting
    src.append(
        spark.createDataFrame([(5, "a", 3.00)], "k int, g string, amt double")
    )
    q2 = stream_mv_refresh(
        spark, str(tmp_path / "src"), mart_root, ["g"], {"revenue": "amt"}, ckpt
    )
    q2.awaitTermination(120)
    assert _state(mart) == _recompute(src)
