"""Unit tests for custom operators on tiny in-memory frames."""

import datetime

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.operators import asof_join, dedup_by_key


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00")), (1, ts("2024-01-01T12:00:00")), (2, ts("2024-01-01T09:00:00"))],
        "uid bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:30:00"), 100),
            (1, ts("2024-01-01T11:00:00"), 200),
            (2, ts("2024-01-01T09:00:00"), 300),  # equal ts → inclusive match
            (3, ts("2024-01-01T00:00:00"), 400),
        ],
        "uid bigint, rts timestamp, payload int",
    )
    out = asof_join(left, right, "uid", "uid", "ts", "rts", ["payload"])
    got = {(r.uid, r.ts.isoformat(), r.payload) for r in out.collect()}
    assert got == {
        (1, "2024-01-01T10:00:00", 100),
        (1, "2024-01-01T12:00:00", 200),
        (2, "2024-01-01T09:00:00", 300),
    }


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame([(9, ts("2024-01-01T00:00:00"))], "uid bigint, ts timestamp")
    right = spark.createDataFrame(
        [(9, ts("2024-06-01T00:00:00"), 1)], "uid bigint, rts timestamp, payload int"
    )
    out = asof_join(left, right, "uid", "uid", "ts", "rts", ["payload"]).collect()
    assert len(out) == 1 and out[0].payload is None


def test_dedup_by_key_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 1), (2, "z", 9)], "k int, s string, n int"
    )
    out = dedup_by_key(df, ["k"], [F.asc("s")]).collect()
    got = {(r.k, r.s) for r in out}
    assert got == {(1, "a"), (2, "z")}


def test_resize_images_plumbing(spark, sf_dir):
    from ecommerce_lakehouse_spark.operators.multimodal import resize_images, with_binary_payload
    from ecommerce_lakehouse_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    out = resize_images(with_binary_payload(docs), 224, 224)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_sample_frames_fanout(spark, sf_dir):
    from ecommerce_lakehouse_spark.operators.multimodal import sample_frames, with_binary_payload
    from ecommerce_lakehouse_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(10)
    out = sample_frames(with_binary_payload(docs), every_n=3, frame_size=50)
    pdf = out.toPandas()
    assert set(pdf["doc_id"].unique()) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    # every_n sampling: frame indices are multiples of 3
    assert (pdf["frame_idx"] % 3 == 0).all()
    assert (pdf["frame_bytes"] > 0).all()


def test_decode_stubs_raise(spark):
    import pytest as _pytest

    from ecommerce_lakehouse_spark.operators.multimodal import decode_audio, decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"xx")
    with _pytest.raises(NotImplementedError):
        decode_audio(b"xx")
