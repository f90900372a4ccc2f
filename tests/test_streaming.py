"""Structured Streaming jobs: availableNow trigger over the events parquet,
asserting streaming results equal the batch twins (same expressions, two
execution modes)."""

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.lake import LakeTable
from ecommerce_lakehouse_spark.queries.events import session_window_agg, tumbling_window_agg
from ecommerce_lakehouse_spark.streaming import (
    read_events_stream,
    sessionized_stream,
    stream_merge_into,
    windowed_event_counts,
)

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow



def _run_to_memory(stream_df, spark, name, checkpoint, output_mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    stream = windowed_event_counts(read_events_stream(spark, sf_dir))
    got = _run_to_memory(stream, spark, "win_counts", str(tmp_path / "cp1"))
    expect = tumbling_window_agg(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    got = _run_to_memory(stream, spark, "sess_counts", str(tmp_path / "cp2"))
    expect = session_window_agg(spark, sf_dir)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_stream_merge_into_laketable(spark, sf_dir, tmp_path):
    table = LakeTable(spark, str(tmp_path / "events_table"))
    events = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    q = stream_merge_into(events, table, ["event_id"], str(tmp_path / "cp3")).start()
    q.awaitTermination(120)

    batch_count = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").distinct().count()
    )
    assert table.read().count() == batch_count
    # merge is keyed: no duplicate event_ids
    assert table.read().select("event_id").distinct().count() == batch_count
    assert table.history()[-1]["operation"] in ("merge", "overwrite")


def test_running_user_profile_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    3 spool files x maxFilesPerTrigger=1 = 3 batches; the last emitted row
    per user must equal the batch-mode groupBy, and multi-batch users must
    show n_batches > 1 (proof state actually crossed batch boundaries)."""
    from ecommerce_lakehouse_spark.streaming import running_user_profile
    from ecommerce_lakehouse_spark.tables import load

    src = load(spark, sf_dir, "events")
    spool = str(tmp_path / "spool")
    for i in range(3):
        src.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(spool)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    emitted = []

    def collect_batch(batch_df, batch_id):
        emitted.append((batch_id, batch_df.collect()))

    q = (
        running_user_profile(stream)
        .writeStream.outputMode("update")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "cp_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = {}
    for batch_id, rows in sorted(emitted):
        for r in rows:
            final[r["user_id"]] = r
    expect = {
        r["user_id"]: r
        for r in src.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert set(final) == set(expect)
    for uid, r in final.items():
        assert r["n_events"] == expect[uid]["n_events"]
        assert abs(r["total_value"] - expect[uid]["total_value"]) < 1e-6
    assert max(r["n_batches"] for r in final.values()) > 1


def test_deduped_stream_drops_cross_batch_duplicates(spark, sf_dir, tmp_path):
    """The same events file lands twice (two spool files, two micro-batches)
    — dropDuplicatesWithinWatermark must emit each event_id exactly once."""
    from ecommerce_lakehouse_spark.streaming import deduped_stream
    from ecommerce_lakehouse_spark.tables import load

    src = load(spark, sf_dir, "events")
    spool = str(tmp_path / "dup_spool")
    for _ in range(2):
        src.coalesce(1).write.mode("append").parquet(spool)

    stream = (
        spark.readStream.schema(src.schema).option("maxFilesPerTrigger", 1).parquet(spool)
    )
    got = _run_to_memory(
        deduped_stream(stream).select("event_id"),
        spark,
        "dedup_stream",
        str(tmp_path / "cp_dedup"),
        output_mode="append",
    )
    n_distinct = src.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (click→purchase attribution)
    must produce exactly the batch join's rows once the availableNow run
    drains."""
    from ecommerce_lakehouse_spark.streaming import stream_stream_join
    from ecommerce_lakehouse_spark.tables import load

    src = load(spark, sf_dir, "events")
    spool = str(tmp_path / "ss_spool")
    src.coalesce(1).write.mode("append").parquet(spool)

    def typed_stream(t):
        return (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
            .filter(F.col("event_type") == t)
        )

    joined = stream_stream_join(typed_stream("click"), typed_stream("purchase"))
    got = _run_to_memory(
        joined, spark, "ss_join", str(tmp_path / "cp_ss"), output_mode="append"
    )

    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    # batch twin: same join condition on static frames
    l_ = clicks.select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id")
    )
    r_ = purchases.select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_event_id")
    )
    batch = l_.join(
        r_,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
    )
    assert got.count() == batch.count()
    assert got.count() > 0


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across a stop/restart: run an availableNow query to
    completion, add new source files, restart with the SAME checkpoint.
    The sink is a raw append (NOT a keyed merge), so any re-read of the
    first batch's files would duplicate rows — the count assertion proves
    the checkpoint skips already-committed files and processes only the
    new ones."""
    src = tmp_path / "src"
    cp = str(tmp_path / "cp_restart")
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    b1 = base.filter(F.col("event_id") % 2 == 0)
    b2 = base.filter(F.col("event_id") % 2 == 1)
    b1.write.mode("append").parquet(str(src))

    table = LakeTable(spark, str(tmp_path / "append_sink"))

    def sink(batch_df, batch_id):
        if not batch_df.isEmpty():
            table.append(batch_df)

    def run_once():
        q = (
            spark.readStream.schema(base.schema)
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = b1.count()
    assert table.read().count() == n1

    b2.write.mode("append").parquet(str(src))
    run_once()  # restart from the same checkpoint
    assert table.read().count() == n1 + b2.count()
    assert table.read().select("event_id").distinct().count() == n1 + b2.count()


def test_stream_static_enrich_dim_join(spark, sf_dir, tmp_path):
    """Stream-static join: every streamed event picks up its customer's
    nation key from the static dim, matching the batch join exactly."""
    from ecommerce_lakehouse_spark.streaming import read_events_stream, stream_static_enrich
    from ecommerce_lakehouse_spark.tables import load

    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    stream = stream_static_enrich(
        read_events_stream(spark, sf_dir).select("event_id", "user_id"), dim, "user_id"
    )
    got = _run_to_memory(stream, spark, "enriched", str(tmp_path / "cp_enrich"),
                         output_mode="append")
    expect = load(spark, sf_dir, "events").select("event_id", "user_id").join(
        dim, "user_id", "left"
    )
    cols = ["event_id", "user_id", "c_nationkey"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_stream_rollup_refresh_matches_batch(spark, sf_dir, tmp_path):
    """Continuous aggregate via foreachBatch + merge_aggregate: after the
    stream drains (3 micro-batches), the rollup table equals a batch
    recompute of the same (hour, event_type) grain."""
    from ecommerce_lakehouse_spark.streaming import stream_rollup_refresh
    from ecommerce_lakehouse_spark.tables import load

    src = load(spark, sf_dir, "events")
    spool = str(tmp_path / "rollup_spool")
    for i in range(3):
        src.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(spool)

    stream = (
        spark.readStream.schema(spark.read.parquet(spool).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    table = LakeTable(spark, str(tmp_path / "rollup_table"))
    q = stream_rollup_refresh(stream, table, str(tmp_path / "cp_rollup")).start()
    q.awaitTermination(180)

    expect = (
        src.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    cols = ["bucket", "event_type", "n_events", "total_value"]
    got_rows = _rows(table.read(), cols)
    exp_rows = _rows(expect, cols)
    assert len(got_rows) == len(exp_rows)
    for g, e in zip(got_rows, exp_rows):
        assert g[:3] == e[:3]
        assert abs(g[3] - e[3]) < 1e-6


def test_available_now_backfill_drains_and_stops(spark, sf_dir, tmp_path):
    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import (
        read_events_stream,
        stream_backfill_available_now,
    )
    from ecommerce_lakehouse_spark.tables import load

    table = LakeTable(spark, str(tmp_path / "backfill"))
    q = stream_backfill_available_now(
        spark, sf_dir, table, str(tmp_path / "ckpt"), spool_dir=str(tmp_path / "spool")
    )
    q.awaitTermination(120)
    assert not q.isActive  # availableNow terminates after draining
    n_batch = load(spark, sf_dir, "events").count()
    assert table.read().count() == n_batch
    # a second backfill run from the same checkpoint is a no-op (no new
    # files): exactly-once across restarts
    v = table.current_version()
    q2 = stream_backfill_available_now(
        spark, sf_dir, table, str(tmp_path / "ckpt"), spool_dir=str(tmp_path / "spool")
    )
    q2.awaitTermination(120)
    assert table.current_version() == v and table.read().count() == n_batch


def test_stream_replicate_table(spark, tmp_path):
    """Streaming replication: the CDF stream of an append-only source,
    applied per microbatch with apply_changes + txn idempotency,
    reproduces the source exactly and stays correct across repeated
    catch-up drains."""
    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_replicate

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ck")
    src = LakeTable(spark, src_root)
    src.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(1)
    )
    src.append(spark.createDataFrame([(3, "c")], "k int, v string"))

    q = stream_replicate(spark, src_root, dst_root, keys=["k"], checkpoint_dir=ckpt)
    q.awaitTermination(120)
    dst = LakeTable(spark, dst_root)
    same = lambda: (  # noqa: E731
        {tuple(r) for r in dst.read().collect()}
        == {tuple(r) for r in src.read().collect()}
    )
    assert same()

    # incremental catch-up: new appends, re-drain from the checkpoint
    src.append(spark.createDataFrame([(4, "d")], "k int, v string"))
    q = stream_replicate(spark, src_root, dst_root, keys=["k"], checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert same()
    # idempotent: draining again with nothing new changes nothing
    v = dst.current_version()
    q = stream_replicate(spark, src_root, dst_root, keys=["k"], checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert dst.current_version() == v and same()


def test_stream_apply_changes_scd2(spark, tmp_path):
    """Streaming SCD2: an append-only CDC event log drained per
    microbatch keeps a history-preserving dimension that (a) survives
    repeated catch-up drains exactly-once and (b) equals one batch
    apply_changes_scd2 over the whole feed."""
    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_apply_changes_scd2

    feed_root = str(tmp_path / "feed")
    dim_root = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ck")
    schema = "k int, v string, seq bigint, _change_type string"
    feed = LakeTable(spark, feed_root)
    feed.overwrite(
        spark.createDataFrame(
            [(1, "a", 1, "insert"), (2, "b", 1, "insert")], schema
        ).coalesce(1)
    )
    feed.append(
        spark.createDataFrame([(1, "a2", 2, "update_postimage")], schema)
    )

    def drain():
        q = stream_apply_changes_scd2(
            spark, feed_root, dim_root, keys=["k"],
            sequence_col="seq", checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    drain()
    dim = LakeTable(spark, dim_root)
    hist = lambda t: {  # noqa: E731
        (r["k"], r["v"], r["__start_at"], r["__end_at"])
        for r in t.read().collect()
    }
    assert hist(dim) == {(1, "a", 1, 2), (1, "a2", 2, None), (2, "b", 1, None)}

    # catch-up drain: a delete and a fresh key arrive
    feed.append(
        spark.createDataFrame(
            [(2, "b", 3, "delete"), (3, "c", 3, "insert")], schema
        )
    )
    drain()
    want = {
        (1, "a", 1, 2),
        (1, "a2", 2, None),
        (2, "b", 1, 3),
        (3, "c", 3, None),
    }
    assert hist(dim) == want

    # idempotent: nothing new -> no commit, history unchanged
    v = dim.current_version()
    drain()
    assert dim.current_version() == v and hist(dim) == want

    # equivalence: one batch apply over the whole feed = the incremental history
    batch_root = str(tmp_path / "dim_batch")
    batch_dim = LakeTable(spark, batch_root)
    batch_dim.apply_changes_scd2(
        feed.read(), keys=["k"], sequence_col="seq"
    )
    assert hist(batch_dim) == hist(dim)


def test_stream_drift_monitor_matches_batch_psi(spark, sf_dir, tmp_path):
    """Streaming PSI over the second-half events vs a first-half
    reference must land EXACTLY on psi_value_drift's batch total, and
    the log is exactly-once across a restart."""
    import math as _math
    from datetime import datetime as _dt

    import os
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries.experiment import psi_value_drift
    from ecommerce_lakehouse_spark.streaming.jobs import stream_drift_monitor
    from ecommerce_lakehouse_spark.tables import read_events_raw

    src = os.path.join(sf_dir, "events.parquet")
    t = _pq.read_table(src)
    split = _dt(2024, 1, 16)
    ts = t.column("ts").to_pylist()
    first = t.filter(pa.array([x < split for x in ts]))
    second = t.filter(pa.array([x >= split for x in ts]))
    ref_bins = {}
    for v in first.column("value").to_pylist():
        b = min(9, int(v // 50.0))
        ref_bins[b] = ref_bins.get(b, 0) + 1
    spool = tmp_path / "spool"
    spool.mkdir()
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    half = second.num_rows // 2
    _pq.write_table(second.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(second.slice(half), str(spool / "b.parquet"))

    schema = read_events_raw(spark, src).schema
    from ecommerce_lakehouse_spark.tables import normalize_events_ts

    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    log_root = str(tmp_path / "drift_log")
    ckpt = str(tmp_path / "ckpt")
    q = stream_drift_monitor(stream, ref_bins, log_root, ckpt)
    q.awaitTermination(120)

    log = LakeTable(spark, log_root)
    rows = sorted(log.read().collect(), key=lambda r: r.batch_id)
    assert rows, "monitor logged nothing"
    final = rows[-1]
    assert final.n_seen == second.num_rows
    batch = psi_value_drift(spark, sf_dir).collect()[0]
    batch_nanos = int(round(batch.psi_total * 1e9))
    assert final.psi_nanos == batch_nanos
    assert final.psi == batch.psi_total
    assert final.alert == (final.psi_nanos > 100_000_000)
    # PSI is cumulative-monotone in coverage here: earlier partial batch
    # differs from final (the monitor really recomputes per batch)
    if len(rows) > 1:
        assert rows[0].n_seen < final.n_seen

    # exactly-once across restart: re-run with same checkpoint, no new rows
    q2 = stream_drift_monitor(stream, ref_bins, log_root, ckpt)
    q2.awaitTermination(60)
    assert log.read().count() == len(rows)


def test_stream_heavy_hitters_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Mergeability is the claim: streaming the orders table in two
    micro-batches must leave CMS cells BIT-IDENTICAL to one batch build,
    and the streamed top-20 estimates must equal cms_heavy_hitters'."""
    import os
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries.llm6 import cms_heavy_hitters
    from ecommerce_lakehouse_spark.streaming.jobs import stream_heavy_hitters

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_custkey"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("o_custkey bigint")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "hh_state")
    ckpt = str(tmp_path / "hh_ckpt")
    q = stream_heavy_hitters(stream, state, ckpt)
    q.awaitTermination(120)

    batch = {
        r.o_custkey: (r.exact_cnt, r.est_cnt)
        for r in cms_heavy_hitters(spark, sf_dir).collect()
    }
    cand = LakeTable(spark, os.path.join(state, "cand")).read().collect()
    streamed = {r.o_custkey: r.est_cnt for r in cand}
    # top-20 of the batch query must be present with identical estimates
    for k, (_exact, est) in batch.items():
        assert streamed.get(k) == est
    # cells additivity: streamed sketch == batch-built sketch, cell by cell
    import pyspark.sql.functions as F

    exact = spark.read.parquet(src).groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )

    def bucket(i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("o_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    bcells = (
        exact.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).cast("long").alias("i"), bucket(i).alias("b"))
                        for i in range(4)
                    ]
                )
            ).alias("ib"),
        )
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    got_cells = {
        (r.i, r.b): r.cell
        for r in LakeTable(spark, os.path.join(state, "cells")).read().collect()
    }
    want_cells = {(r.i, r.b): r.cell for r in bcells.collect()}
    assert got_cells == want_cells
    # exactly-once: restart with the same checkpoint adds nothing
    v_before = LakeTable(spark, os.path.join(state, "cells")).current_version()
    q2 = stream_heavy_hitters(stream, state, ckpt)
    q2.awaitTermination(60)
    assert (
        LakeTable(spark, os.path.join(state, "cells")).current_version()
        == v_before
    )


def test_stream_heavy_hitters_torn_commit_replay(spark, sf_dir, tmp_path):
    """Crash-between-commits replay: the cells fold for batch N committed
    but the candidate overwrite did not (the torn state a crash between
    the two LakeTable commits leaves behind). On replay the fold must
    SKIP the non-idempotent cells addition yet STILL recompute the
    candidate table — keys seen only in batch N must become candidates
    (regression: an early return skipped both, losing them forever)."""
    import os
    import pyarrow.parquet as _pq
    import pyspark.sql.functions as F

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries.llm6 import cms_heavy_hitters
    from ecommerce_lakehouse_spark.streaming.jobs import stream_heavy_hitters

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_custkey"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    stream = (
        spark.readStream.schema("o_custkey bigint")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "hh_state")
    ckpt = str(tmp_path / "hh_ckpt")
    # batch 0: only the first half is visible
    q = stream_heavy_hitters(stream, state, ckpt)
    q.awaitTermination(120)
    app = f"hh:{state}"
    cells_t = LakeTable(spark, os.path.join(state, "cells"))
    cand_t = LakeTable(spark, os.path.join(state, "cand"))
    assert cells_t.last_txn(app) == 0 and cand_t.last_txn(app) == 0

    # second half arrives; simulate a crash AFTER the batch-1 cells fold
    # committed but BEFORE the candidate overwrite: hand-commit the cells
    # state a completed batch-1 fold would produce (= the whole-data
    # sketch, since cells are additive) with txn version 1, touch nothing
    # in cand.
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    exact = spark.read.parquet(src).groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )

    def bucket(i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("o_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    full_cells = (
        exact.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).cast("long").alias("i"), bucket(i).alias("b"))
                        for i in range(4)
                    ]
                )
            ).alias("ib"),
        )
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    cells_t.overwrite(full_cells, txn={"app_id": app, "version": 1})
    assert cells_t.last_txn(app) == 1 and cand_t.last_txn(app) == 0

    # replay batch 1: cells must not double-fold, cand must catch up
    q2 = stream_heavy_hitters(stream, state, ckpt)
    q2.awaitTermination(120)
    got_cells = {(r.i, r.b): r.cell for r in cells_t.read().collect()}
    want_cells = {(r.i, r.b): r.cell for r in full_cells.collect()}
    assert got_cells == want_cells  # no double count
    streamed = {r.o_custkey: r.est_cnt for r in cand_t.read().collect()}
    batch = {
        r.o_custkey: r.est_cnt for r in cms_heavy_hitters(spark, sf_dir).collect()
    }
    # keys whose weight lives in the second half must now be candidates
    # with estimates identical to the batch sketch
    for k, est in batch.items():
        assert streamed.get(k) == est


def test_stream_kll_quantiles_matches_batch_sketch(spark, sf_dir, tmp_path):
    """History independence is the claim: streaming the events table in
    two micro-batches must leave the KLL state BIT-IDENTICAL to one
    sketch built over the whole table in batch, and a restart with the
    same checkpoint must add nothing."""
    import os
    import pyarrow.parquet as _pq
    import pyspark.sql.functions as F

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.operators.sketch import (
        kll_level_sketch,
        md5_hash60,
    )
    from ecommerce_lakehouse_spark.streaming.jobs import stream_kll_quantiles

    src = os.path.join(sf_dir, "events.parquet")
    t = _pq.read_table(src, columns=["event_id", "value"])
    spool = tmp_path / "events_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "kll_state")
    ckpt = str(tmp_path / "kll_ckpt")
    q = stream_kll_quantiles(stream, state, ckpt)
    q.awaitTermination(120)

    batch_src = spark.read.parquet(src).select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        md5_hash60(F.col("event_id")).alias("h"),
    )
    want = kll_level_sketch(batch_src, "cents", "h").collect()[0]
    sk_t = LakeTable(spark, os.path.join(state, "sketch"))
    got = sk_t.read().collect()[0]
    assert (got.n, got.level) == (want.n, want.level)
    assert [(i.v, i.h) for i in got.items] == [(i.v, i.h) for i in want.items]
    # exactly-once: restart with the same checkpoint adds nothing
    v_before = sk_t.current_version()
    q2 = stream_kll_quantiles(stream, state, ckpt)
    q2.awaitTermination(60)
    assert sk_t.current_version() == v_before


def test_stream_spike_monitor_matches_batch_flags(spark, sf_dir, tmp_path):
    """Streamed==batch: folding the order stream in two micro-batches
    and recomputing flags from the daily state must reproduce the batch
    daily_revenue_spike_flags rows exactly; a checkpoint restart adds
    nothing to either state table."""
    import os
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries import REGISTRY
    from ecommerce_lakehouse_spark.streaming.jobs import stream_spike_monitor

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_orderdate", "o_totalprice"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        # o_orderdate ships as TIMESTAMP(MICROS) → TIMESTAMP_NTZ, the
        # same dtype the batch load() sees (tables.py encoding notes)
        spark.readStream.schema("o_orderdate timestamp_ntz, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "spike_state")
    ckpt = str(tmp_path / "spike_ckpt")
    q = stream_spike_monitor(stream, state, ckpt)
    q.awaitTermination(120)

    want = sorted(
        map(tuple, REGISTRY["daily_revenue_spike_flags"](spark, sf_dir).collect())
    )
    flags_t = LakeTable(spark, os.path.join(state, "flags"))
    got = sorted(map(tuple, flags_t.read().collect()))
    assert got == want
    # exactly-once: restart with the same checkpoint adds nothing
    daily_t = LakeTable(spark, os.path.join(state, "daily"))
    v_daily, v_flags = daily_t.current_version(), flags_t.current_version()
    q2 = stream_spike_monitor(stream, state, ckpt)
    q2.awaitTermination(60)
    assert daily_t.current_version() == v_daily
    assert flags_t.current_version() == v_flags


def test_stream_spike_monitor_batch_zero_replay(spark, sf_dir, tmp_path):
    """Regression (round-7 ADVICE): replay of batch_id 0 must not
    re-fold its cents into the daily state. The old guard used
    `(last_txn or -1) >= batch_id`, and Python's `0 or -1` is -1 —
    so a crash-replay of the FIRST micro-batch silently double-counted
    and rebuilt flags from the corrupted state. Simulated here by
    wiping the checkpoint after batch 0 commits (Spark re-delivers the
    file as a fresh batch 0 against the surviving state tables)."""
    import os
    import shutil
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_spike_monitor

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_orderdate", "o_totalprice"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    _pq.write_table(t, str(spool / "a.parquet"))
    stream = (
        spark.readStream.schema("o_orderdate timestamp_ntz, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "spike_state")
    ckpt = str(tmp_path / "spike_ckpt")
    q = stream_spike_monitor(stream, state, ckpt)
    q.awaitTermination(120)
    daily_t = LakeTable(spark, os.path.join(state, "daily"))
    assert daily_t.last_txn(f"spike:{state}") == 0
    want = sorted(map(tuple, daily_t.read().collect()))

    # wipe the checkpoint → the same file replays as batch 0 against
    # the existing state; the txn guard is the only double-count shield
    shutil.rmtree(ckpt)
    q2 = stream_spike_monitor(stream, state, ckpt)
    q2.awaitTermination(120)
    got = sorted(map(tuple, daily_t.read().collect()))
    assert got == want  # cents not double-folded


def test_stream_kll_batch_zero_replay(spark, sf_dir, tmp_path):
    """Same batch-0 replay regression for the KLL fold: `0 or -1`
    evaluated to -1, so a replayed first micro-batch re-merged its
    items into the sketch (n doubled)."""
    import os
    import shutil
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_kll_quantiles

    src = os.path.join(sf_dir, "events.parquet")
    t = _pq.read_table(src, columns=["event_id", "value"])
    spool = tmp_path / "events_spool"
    spool.mkdir()
    _pq.write_table(t, str(spool / "a.parquet"))
    stream = (
        spark.readStream.schema("event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "kll_state")
    ckpt = str(tmp_path / "kll_ckpt")
    q = stream_kll_quantiles(stream, state, ckpt)
    q.awaitTermination(120)
    sk_t = LakeTable(spark, os.path.join(state, "sketch"))
    n_before = sk_t.read().collect()[0].n

    shutil.rmtree(ckpt)
    q2 = stream_kll_quantiles(stream, state, ckpt)
    q2.awaitTermination(120)
    assert sk_t.read().collect()[0].n == n_before  # not re-folded


def test_stream_grouped_quantiles_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Grouped history independence: streaming the events table in two
    micro-batches must leave the PER-TYPE KLL state bit-identical to
    one grouped sketch built over the whole table in batch; a restart
    with the same checkpoint adds nothing; and a checkpoint-wipe replay
    of batch 0 must not re-fold (the round-7 `or -1` regression,
    grouped flavor)."""
    import os
    import shutil
    import pyarrow.parquet as _pq
    import pyspark.sql.functions as F

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.operators.sketch import (
        kll_level_sketch,
        md5_hash60,
    )
    from ecommerce_lakehouse_spark.streaming.jobs import stream_grouped_quantiles

    src = os.path.join(sf_dir, "events.parquet")
    t = _pq.read_table(src, columns=["event_id", "event_type", "value"])
    spool = tmp_path / "events_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "gkll_state")
    ckpt = str(tmp_path / "gkll_ckpt")
    q = stream_grouped_quantiles(stream, state, ckpt)
    q.awaitTermination(120)

    batch_src = spark.read.parquet(src).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        md5_hash60(F.col("event_id")).alias("h"),
    )
    want = {
        r.event_type: r
        for r in kll_level_sketch(
            batch_src, "cents", "h", k=256, group_cols=["event_type"]
        ).collect()
    }
    sk_t = LakeTable(spark, os.path.join(state, "sketch"))
    got = {r.event_type: r for r in sk_t.read().collect()}
    assert set(got) == set(want)
    for et, w in want.items():
        g = got[et]
        assert (g.n, g.level) == (w.n, w.level), et
        assert [(i.v, i.h) for i in g.items] == [(i.v, i.h) for i in w.items], et

    # exactly-once: restart with the same checkpoint adds nothing
    v_before = sk_t.current_version()
    q2 = stream_grouped_quantiles(stream, state, ckpt)
    q2.awaitTermination(60)
    assert sk_t.current_version() == v_before

    # batch-0 replay: wipe the checkpoint — the txn guard alone must
    # prevent a double fold of the replayed batches
    per_type_n = {et: g.n for et, g in got.items()}
    shutil.rmtree(ckpt)
    q3 = stream_grouped_quantiles(stream, state, ckpt)
    q3.awaitTermination(120)
    after = {r.event_type: r.n for r in sk_t.read().collect()}
    assert after == per_type_n


def test_stream_page_hinkley_matches_batch(spark, sf_dir, tmp_path):
    """Streamed==batch for the sequential PH monitor: folding the order
    stream in two micro-batches and recomputing the summary from daily
    state must reproduce the batch page_hinkley_drift row exactly; a
    restart adds nothing."""
    import os
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries import REGISTRY
    from ecommerce_lakehouse_spark.streaming.jobs import stream_page_hinkley

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_orderdate", "o_totalprice"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("o_orderdate timestamp_ntz, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "ph_state")
    ckpt = str(tmp_path / "ph_ckpt")
    q = stream_page_hinkley(stream, state, ckpt)
    q.awaitTermination(120)

    want = sorted(map(tuple, REGISTRY["page_hinkley_drift"](spark, sf_dir).collect()))
    sum_t = LakeTable(spark, os.path.join(state, "summary"))
    got = sorted(map(tuple, sum_t.read().collect()))
    assert got == want
    v_before = sum_t.current_version()
    q2 = stream_page_hinkley(stream, state, ckpt)
    q2.awaitTermination(60)
    assert sum_t.current_version() == v_before


def test_stream_holt_winters_matches_batch(spark, sf_dir, tmp_path):
    """Streamed==batch for the Holt-Winters twin: folding the order
    stream in two micro-batches and recomputing the fit from the
    monthly-cents state must reproduce the batch holt_winters_seasonal
    rows bit-exactly; a checkpoint restart adds nothing."""
    import os
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries import REGISTRY
    from ecommerce_lakehouse_spark.streaming.jobs import stream_holt_winters

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_orderdate", "o_totalprice"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    half = t.num_rows // 2
    _pq.write_table(t.slice(0, half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("o_orderdate timestamp_ntz, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "hw_state")
    ckpt = str(tmp_path / "hw_ckpt")
    q = stream_holt_winters(stream, state, ckpt)
    q.awaitTermination(120)

    want = sorted(
        map(tuple, REGISTRY["holt_winters_seasonal"](spark, sf_dir).collect())
    )
    fc_t = LakeTable(spark, os.path.join(state, "forecast"))
    got = sorted(map(tuple, fc_t.read().collect()))
    assert got == want
    monthly_t = LakeTable(spark, os.path.join(state, "monthly"))
    v_m, v_f = monthly_t.current_version(), fc_t.current_version()
    q2 = stream_holt_winters(stream, state, ckpt)
    q2.awaitTermination(60)
    assert monthly_t.current_version() == v_m
    assert fc_t.current_version() == v_f


def test_stream_holt_winters_batch_zero_replay(spark, sf_dir, tmp_path):
    """Batch-0 replay (checkpoint wiped after the first commit) must
    not re-fold cents into the monthly state."""
    import os
    import shutil
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_holt_winters

    src = os.path.join(sf_dir, "orders.parquet")
    t = _pq.read_table(src, columns=["o_orderdate", "o_totalprice"])
    spool = tmp_path / "orders_spool"
    spool.mkdir()
    _pq.write_table(t, str(spool / "a.parquet"))
    stream = (
        spark.readStream.schema("o_orderdate timestamp_ntz, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "hw_state")
    ckpt = str(tmp_path / "hw_ckpt")
    q = stream_holt_winters(stream, state, ckpt)
    q.awaitTermination(120)
    monthly_t = LakeTable(spark, os.path.join(state, "monthly"))
    assert monthly_t.last_txn(f"hw:{state}") == 0
    want = sorted(map(tuple, monthly_t.read().collect()))

    shutil.rmtree(ckpt)
    q2 = stream_holt_winters(stream, state, ckpt)
    q2.awaitTermination(120)
    got = sorted(map(tuple, monthly_t.read().collect()))
    assert got == want  # cents not double-folded


def test_stream_mixture_shift_matches_batch(spark, sf_dir, tmp_path):
    """Streamed==batch for the dedup-mixture-shift twin: the split is
    by doc_id parity so cross-batch duplicates exist (the canonical
    min-doc_id survivor must resolve ACROSS batches); the recomputed
    summary must equal the batch dedup_mixture_shift bit-exactly."""
    import os
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.queries import REGISTRY
    from ecommerce_lakehouse_spark.streaming.jobs import stream_mixture_shift

    src = os.path.join(sf_dir, "documents.parquet")
    t = _pq.read_table(src, columns=["doc_id", "source", "text"])
    spool = tmp_path / "docs_spool"
    spool.mkdir()
    # later half (higher doc_ids) FIRST: the keep must migrate to the
    # earlier doc when its batch arrives second
    half = t.num_rows // 2
    _pq.write_table(t.slice(half), str(spool / "a.parquet"))
    _pq.write_table(t.slice(0, half), str(spool / "b.parquet"))
    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "mix_state")
    ckpt = str(tmp_path / "mix_ckpt")
    q = stream_mixture_shift(stream, state, ckpt)
    q.awaitTermination(120)

    want = sorted(
        map(tuple, REGISTRY["dedup_mixture_shift"](spark, sf_dir).collect())
    )
    sum_t = LakeTable(spark, os.path.join(state, "summary"))
    got = sorted(map(tuple, sum_t.read().collect()))
    assert got == want
    raw_t = LakeTable(spark, os.path.join(state, "raw_counts"))
    v_r, v_s = raw_t.current_version(), sum_t.current_version()
    q2 = stream_mixture_shift(stream, state, ckpt)
    q2.awaitTermination(60)
    assert raw_t.current_version() == v_r
    assert sum_t.current_version() == v_s


def test_stream_mixture_shift_batch_zero_replay(spark, sf_dir, tmp_path):
    """Batch-0 replay must not double the raw per-source counters (the
    non-idempotent fold; the hash min-merge is idempotent by shape)."""
    import os
    import shutil
    import pyarrow.parquet as _pq

    from ecommerce_lakehouse_spark.lake import LakeTable
    from ecommerce_lakehouse_spark.streaming.jobs import stream_mixture_shift

    src = os.path.join(sf_dir, "documents.parquet")
    t = _pq.read_table(src, columns=["doc_id", "source", "text"])
    spool = tmp_path / "docs_spool"
    spool.mkdir()
    _pq.write_table(t, str(spool / "a.parquet"))
    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(spool))
    )
    state = str(tmp_path / "mix_state")
    ckpt = str(tmp_path / "mix_ckpt")
    q = stream_mixture_shift(stream, state, ckpt)
    q.awaitTermination(120)
    raw_t = LakeTable(spark, os.path.join(state, "raw_counts"))
    assert raw_t.last_txn(f"mix:{state}") == 0
    want = sorted(map(tuple, raw_t.read().collect()))

    shutil.rmtree(ckpt)
    q2 = stream_mixture_shift(stream, state, ckpt)
    q2.awaitTermination(120)
    got = sorted(map(tuple, raw_t.read().collect()))
    assert got == want  # counters not double-folded
