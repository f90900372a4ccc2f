"""LakeTable as a streaming SOURCE (Python Data Source API) — the
Delta-streaming-source analogue: version offsets, append tailing,
exactly-once restart from the checkpoint, ignoreChanges for rewrites."""

import os

import pytest

from ecommerce_lakehouse_spark.lake.stream_source import (
    LakeTableStreamReader,
    register_lake_source,
)
from ecommerce_lakehouse_spark.lake.table import LakeTable

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow



def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, k string, v double")


def _drain(spark, root, sink, checkpoint, **opts):
    reader = spark.readStream.format("laketable").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(r.id for r in spark.sql(f"select id from {sink}").collect())


def test_stream_source_tails_appends_exactly_once(spark, tmp_path):
    register_lake_source(spark)
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 10.0), (2, "b", 20.0)]))
    t.append(_df(spark, [(3, "a", 30.0)]))

    def drain_to_files():
        q = (
            spark.readStream.format("laketable")
            .option("path", root)
            .option("startingVersion", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    # earliest: the creating commit counts as initial data
    assert drain_to_files() == [1, 2, 3]

    # restart from the SAME checkpoint after two more appends: the sink
    # accumulates exactly the new commits, nothing replayed (version
    # offsets persisted exactly-once)
    t.append(_df(spark, [(4, "b", 40.0)]))
    t.append(_df(spark, [(5, "a", 50.0)]))
    assert drain_to_files() == [1, 2, 3, 4, 5]


def test_stream_source_partitioned_hive_values(spark, tmp_path):
    register_lake_source(spark)
    root = str(tmp_path / "p")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 10.0), (2, "b", 20.0)]), partition_by=["k"])
    t.append(_df(spark, [(3, "a", 30.0)]), partition_by=["k"])
    df = (
        spark.readStream.format("laketable")
        .option("path", root)
        .option("startingVersion", "earliest")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("sp")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id: r.k for r in spark.sql("select id, k from sp").collect()}
    # partition column restored from the hive paths, row-correct
    assert got == {1: "a", 2: "b", 3: "a"}


def test_stream_source_rejects_rewrites_unless_ignore_changes(spark, tmp_path):
    register_lake_source(spark)
    root = str(tmp_path / "r")
    t = LakeTable(spark, root)
    # one file for both rows so the delete's rewrite re-emits the survivor
    # (file-pruned deletes carry untouched files, which are NOT re-emitted)
    t.overwrite(_df(spark, [(1, "a", 10.0), (2, "b", 20.0)]).coalesce(1))
    t.delete("id = 1")  # data rewrite

    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, root, "sr1", str(tmp_path / "c1"), startingVersion="earliest")

    # with ignoreChanges the rewritten rows are re-emitted (Delta
    # contract: downstream dedups) — id=2 appears from v1 AND the rewrite
    got = _drain(
        spark,
        root,
        "sr2",
        str(tmp_path / "c2"),
        startingVersion="earliest",
        ignoreChanges="true",
    )
    assert got == [1, 2, 2]


def test_stream_source_skips_compaction_and_latest_default(spark, tmp_path):
    register_lake_source(spark)
    root = str(tmp_path / "c")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 10.0)]))
    t.compact()  # physical-only: dataChange=false analogue

    # default startingVersion=latest: nothing emitted for past commits
    assert _drain(spark, root, "sc1", str(tmp_path / "k1")) == []
    # compaction between offsets emits nothing even from earliest
    assert (
        _drain(spark, root, "sc2", str(tmp_path / "k2"), startingVersion="earliest")
        == [1]
    )


def test_stream_source_read_change_feed(spark, tmp_path):
    """readChangeFeed=true: Delta's streaming CDF shape — rows carry
    _change_type='insert' and the commit version; rewrites raise."""
    register_lake_source(spark)
    root = str(tmp_path / "cdf")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0)]))  # v1
    t.append(_df(spark, [(2, "b", 2.0)]))  # v2

    df = (
        spark.readStream.format("laketable")
        .option("path", root)
        .option("startingVersion", "earliest")
        .option("readChangeFeed", "true")
        .load()
    )
    assert "_change_type" in df.columns and "_commit_version" in df.columns
    q = (
        df.writeStream.format("memory")
        .queryName("scdf")
        .option("checkpointLocation", str(tmp_path / "k"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in spark.sql("select * from scdf").collect()
    )
    assert got == [(1, "insert", 1), (2, "insert", 2)]

    # a rewrite is not expressible in the source: error names the batch API
    t.delete("id = 1")
    with pytest.raises(Exception, match="changes()"):
        _drain(
            spark,
            root,
            "scdf2",
            str(tmp_path / "k2"),
            startingVersion="earliest",
            readChangeFeed="true",
        )


def test_stream_source_offsets_are_manifest_only_and_vacuum_is_loud(tmp_path, spark):
    """Offset bookkeeping (initial/latest) reads ONLY the manifests; file
    planning lists names but never opens data, and a vacuumed commit
    raises instead of silently emitting an empty microbatch."""
    import shutil

    root = str(tmp_path / "m")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    from pyspark.sql.pandas.types import from_arrow_schema

    from ecommerce_lakehouse_spark.lake.stream_source import _snapshot_arrow_schema

    schema = from_arrow_schema(_snapshot_arrow_schema(root))
    reader = LakeTableStreamReader({"path": root, "startingversion": "earliest"}, schema)
    assert reader.initialOffset() == {"version": 0}
    assert reader.latestOffset() == {"version": 2}
    parts = reader.partitions({"version": 0}, {"version": 2})
    assert len(parts) >= 2 and all(os.path.isabs(p.path) for p in parts)
    # empty range → empty plan (API contract)
    assert reader.partitions({"version": 2}, {"version": 2}) == []

    # data dirs gone (vacuum/external deletion): offsets still work —
    # they are manifest-only — but planning the reclaimed commit raises
    shutil.rmtree(str(tmp_path / "m" / "data"))
    assert reader.latestOffset() == {"version": 2}
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        reader.partitions({"version": 0}, {"version": 2})


def test_stream_source_honors_masks_and_skips_zorder(spark, tmp_path):
    """A shallow clone's v1 carries exclusion masks / live_files from the
    source's DML history — the stream must emit what the table READS,
    not raw dir contents; and optimize-zorder is physical-only."""
    register_lake_source(spark)
    src = LakeTable(spark, str(tmp_path / "src"))
    src.overwrite(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]),
        partition_by=["k"],
    )
    src.delete("k = 'a'")  # v2: prior dir carried behind exclude mask
    clone = src.clone_to(str(tmp_path / "clone"))
    assert sorted(r.id for r in clone.read().collect()) == [2]

    got = _drain(
        spark, str(tmp_path / "clone"), "smask", str(tmp_path / "c1"),
        startingVersion="earliest",
    )
    assert got == [2]  # masked k='a' rows never reach the sink

    # optimize-zorder between offsets: dataChange=false, nothing emitted
    flat = LakeTable(spark, str(tmp_path / "z"))
    flat.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    flat.optimize(zorder_by=["id"], target_partitions=1)
    got = _drain(
        spark, str(tmp_path / "z"), "szord", str(tmp_path / "c2"),
        startingVersion="earliest",
    )
    assert got == [1, 2]  # v1 only; the zorder rewrite adds nothing


def test_stream_source_mask_only_delete_is_loud(spark, tmp_path):
    """ADVICE r03 (medium): a partitioned DELETE that empties every
    touched partition produces a MASK-ONLY commit — exclude list grows,
    no new data dir. That commit must raise (the module contract:
    non-append data commits are loud), not silently vanish from the
    stream; ignoreChanges=true doubles as Delta's ignoreDeletes and
    skips it; readChangeFeed stays loud regardless. A mask-only RESTORE
    (rows re-exposed with no new files) is equally invisible-by-files
    and must also raise."""
    from pyspark.sql.pandas.types import from_arrow_schema

    from ecommerce_lakehouse_spark.lake.stream_source import _snapshot_arrow_schema

    root = str(tmp_path / "md")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), partition_by=["k"])
    t.delete("k = 'a'")  # v2: exclude mask grows, new_dir omitted
    schema = from_arrow_schema(_snapshot_arrow_schema(root))
    reader = LakeTableStreamReader(
        {"path": root, "startingversion": "earliest"}, schema
    )
    with pytest.raises(ValueError, match="row visibility"):
        reader.partitions({"version": 1}, {"version": 2})
    relaxed = LakeTableStreamReader(
        {"path": root, "startingversion": "earliest", "ignorechanges": "true"},
        schema,
    )
    assert relaxed.partitions({"version": 1}, {"version": 2}) == []
    cdf = LakeTableStreamReader(
        {"path": root, "ignorechanges": "true", "readchangefeed": "true"}, schema
    )
    with pytest.raises(ValueError, match="row visibility"):
        cdf.partitions({"version": 1}, {"version": 2})
    # mask-only RESTORE: same invisibility, same loudness
    t.restore(1)
    with pytest.raises(ValueError, match="row visibility"):
        reader.partitions({"version": 2}, {"version": 3})


def test_stream_source_schema_after_full_delete(spark, tmp_path):
    """ADVICE r03 (low): schema() on a snapshot with zero data dirs (a
    DELETE removed every row) must fall back to the most recent version
    that still had data — not die inside pa.unify_schemas([])."""
    from ecommerce_lakehouse_spark.lake.stream_source import _snapshot_arrow_schema

    root = str(tmp_path / "fd")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0)]).coalesce(1))
    t.delete("id = 1")  # every row gone
    assert t.read().count() == 0
    sch = _snapshot_arrow_schema(root)
    assert {"id", "k", "v"} <= set(sch.names)


def test_stream_source_max_commits_per_trigger(spark, tmp_path):
    """Rate limiting (Delta maxFilesPerTrigger analogue at commit
    granularity): each trigger advances at most N commits. An
    availableNow drain with cap 1 therefore takes exactly one commit per
    invocation and resumes from the checkpoint — three drains walk three
    appends one by one, exactly-once."""
    register_lake_source(spark)
    root = str(tmp_path / "rl")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    t.append(_df(spark, [(3, "c", 3.0)]))
    ckpt = str(tmp_path / "ck")

    out = str(tmp_path / "out")

    def drain_once():
        q = (
            spark.readStream.format("laketable")
            .option("path", root)
            .option("startingVersion", "earliest")
            .option("maxCommitsPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    # each drain adds exactly one commit's rows; union is complete, no dups
    assert [drain_once() for _ in range(3)] == [[1], [1, 2], [1, 2, 3]]

    # unit: latestOffset is clamped to start+N until partitions() advances
    from pyspark.sql.pandas.types import from_arrow_schema

    from ecommerce_lakehouse_spark.lake.stream_source import _snapshot_arrow_schema

    schema = from_arrow_schema(_snapshot_arrow_schema(root))
    r = LakeTableStreamReader(
        {"path": root, "startingversion": "earliest", "maxcommitspertrigger": "2"},
        schema,
    )
    assert r.latestOffset() == {"version": 2}
    r.partitions({"version": 0}, {"version": 2})
    assert r.latestOffset() == {"version": 3}
