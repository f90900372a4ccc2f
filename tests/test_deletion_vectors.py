"""Deletion vectors — Delta merge-on-read DELETE: no data file rewritten;
scans anti-join a (file, row_index) sidecar; compact() materializes."""

import glob
import hashlib

import pytest

from ecommerce_lakehouse_spark.lake.table import LakeTable

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, k string, v double")


def _file_hashes(root):
    out = {}
    for f in sorted(glob.glob(str(root) + "/data/**/*.parquet", recursive=True)):
        with open(f, "rb") as fh:
            out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_dv_delete_rewrites_nothing_and_stacks(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    before = _file_hashes(tmp_path / "t")

    t.delete("id = 1", mode="merge-on-read")  # v2
    assert sorted(r.id for r in t.read().collect()) == [2, 3]
    # merge-on-read: every data file byte-identical, DV sidecar appeared
    assert _file_hashes(tmp_path / "t") == before
    assert glob.glob(str(tmp_path / "t/_dv/*/*.parquet"))

    t.delete("id = 3", mode="merge-on-read")  # v3 stacks on v2
    assert sorted(r.id for r in t.read().collect()) == [2]
    assert _file_hashes(tmp_path / "t") == before
    # time travel sees through the vectors version by version
    assert sorted(r.id for r in t.read(version=1).collect()) == [1, 2, 3]
    assert sorted(r.id for r in t.read(version=2).collect()) == [2, 3]
    # no-op DV delete commits nothing
    v = t.current_version()
    t.delete("id = 99", mode="merge-on-read")
    assert t.current_version() == v


def test_dv_append_carries_and_cow_dml_guarded(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "g"))
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.delete("id = 1", mode="merge-on-read")
    t.append(_df(spark, [(3, "c", 3.0)]))  # appends ride over DVs
    assert sorted(r.id for r in t.read().collect()) == [2, 3]

    # copy-on-write DML would read files directly and resurrect the row
    with pytest.raises(ValueError, match="deletion vectors"):
        t.delete("id = 2")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.update("id = 2", {"v": "20.0"})
    with pytest.raises(ValueError, match="deletion vectors"):
        t.merge(_df(spark, [(2, "b", 20.0)]), keys=["id"])

    # compact() materializes (Delta PURGE): same rows, DVs gone, DML flows
    t.compact()
    assert t._manifest(t.current_version())["deletion_vectors"] == []
    assert sorted(r.id for r in t.read().collect()) == [2, 3]
    t.update("id = 2", {"v": "20.0"})
    assert {r.id: r.v for r in t.read().collect()} == {2: 20.0, 3: 3.0}


def test_dv_change_feed_and_restore(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "f"))
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.delete("id = 1", mode="merge-on-read")  # v2

    feed = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in t.changes(2, 2).collect()
    )
    assert feed == [(2, "delete", 1)]

    t.restore(1)  # v3: the un-delete comes back through the feed
    feed = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in t.changes(3, 3).collect()
    )
    assert feed == [(3, "insert", 1)]
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_dv_partitioned_and_read_skipping_exact(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "p"))
    t.overwrite(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]),
        partition_by=["k"],
    )
    t.delete("v >= 3.0", mode="merge-on-read")
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    # partition column survives into the feed's deleted rows
    feed = {(r.id, r.k) for r in t.changes(2, 2).collect()}
    assert feed == {(3, "a")}
    # read_skipping stays exact (falls back to the DV-filtered read)
    got = t.read_skipping({"v": (1.5, None)})
    assert sorted(r.id for r in got.collect()) == [2]


def test_dv_vacuum_and_stream_source_contract(spark, tmp_path):
    from ecommerce_lakehouse_spark.lake.stream_source import register_lake_source

    register_lake_source(spark)
    root = str(tmp_path / "s")
    t = LakeTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.delete("id = 1", mode="merge-on-read")  # v2

    # a stream cannot retract rows: DV commits raise...
    df = (
        spark.readStream.format("laketable")
        .option("path", root)
        .option("startingVersion", "earliest")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("dv1")
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="deletion vectors|retract"):
        q.awaitTermination(120)
        q.processAllAvailable()

    # ...unless ignoreChanges (ignoreDeletes posture) skips them
    df2 = (
        spark.readStream.format("laketable")
        .option("path", root)
        .option("startingVersion", "earliest")
        .option("ignoreChanges", "true")
        .load()
    )
    q2 = (
        df2.writeStream.format("memory")
        .queryName("dv2")
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(r.id for r in spark.sql("select id from dv2").collect()) == [1, 2]

    # DV sidecars age out with their manifests
    t.compact()  # v3 resets DVs
    t.append(_df(spark, [(4, "d", 4.0)]))  # v4
    removed = t.vacuum(keep_last=2)  # keeps v3, v4 — v2's DV is dead
    assert any("/_dv/" in p for p in removed)
    assert sorted(r.id for r in t.read().collect()) == [2, 4]


def test_dv_clone_v1_feed_and_compact_all_deleted(spark, tmp_path):
    """Two review-fix regressions: (a) a shallow clone of a DV-active
    source reports only inserts of VISIBLE rows at v1 — never spurious
    deletes of rows that predate the clone; (b) compact() on a table
    whose vectors deleted every row leaves a readable empty table."""
    src = LakeTable(spark, str(tmp_path / "src"))
    src.overwrite(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    src.delete("id = 1", mode="merge-on-read")
    clone = src.clone_to(str(tmp_path / "clone"))
    feed = sorted((r._change_type, r.id) for r in clone.changes(1, 1).collect())
    assert feed == [("insert", 2)]  # id=1 never existed in clone history

    t = LakeTable(spark, str(tmp_path / "all"))
    t.overwrite(_df(spark, [(1, "a", 1.0)]).coalesce(1))
    t.delete("id >= 0", mode="merge-on-read")
    t.compact()  # materializes into... nothing
    got = t.read()
    assert got.count() == 0 and "id" in got.columns
    # and the empty table still takes writes
    t.append(_df(spark, [(9, "z", 9.0)]))
    assert sorted(r.id for r in t.read().collect()) == [9]
