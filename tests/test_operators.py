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


def _test_image(doc_id: int, w: int = 8, h: int = 6):
    import numpy as np

    ys, xs = np.mgrid[0:h, 0:w]
    r = (doc_id * 7 + 3 * xs + 5 * ys) % 256
    g = (doc_id * 11 + 2 * xs + ys) % 256
    b = (doc_id * 13 + xs + 4 * ys) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_resize_images_real_decode(spark):
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import decode_image, encode_ppm
    from ecommerce_lakehouse_spark.operators.multimodal import resize_images

    rows = [(i, bytearray(encode_ppm(_test_image(i, 16, 12)))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = resize_images(df, 224, 224).collect()
    assert len(out) == 20
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    # output payloads are decodable PPMs with the target geometry
    img = decode_image(bytes(out[0]["payload"]))
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8


def test_sample_frames_real_video(spark):
    from ecommerce_lakehouse_spark.operators.media import encode_ppm
    from ecommerce_lakehouse_spark.operators.multimodal import sample_frames

    # 10 docs, each a 9-frame concatenated-PPM "video"
    rows = [
        (i, bytearray(b"".join(encode_ppm(_test_image(i * 100 + f)) for f in range(9))))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    pdf = sample_frames(df, every_n=3).toPandas()
    assert set(pdf["doc_id"].unique()) == set(range(10))
    assert (pdf["frame_idx"] % 3 == 0).all()
    assert sorted(pdf[pdf.doc_id == 0]["frame_idx"]) == [0, 3, 6]
    assert (pdf["width"] == 8).all() and (pdf["height"] == 6).all()
    assert (pdf["frame_bytes"] > 0).all() and (pdf["mean_lum"] > 0).all()


def test_decode_compressed_formats_raise():
    import pytest as _pytest

    from ecommerce_lakehouse_spark.operators.media import decode_audio, decode_image

    # PNG and JPEG decode for real now (round 3) — truncated payloads are
    # parse errors, not missing-codec errors
    with _pytest.raises(ValueError, match="IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with _pytest.raises(ValueError, match="marker"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with _pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04" + b"\x00" * 16)
    with _pytest.raises(ValueError):
        decode_image(b"xx")
    with _pytest.raises(ValueError):
        decode_audio(b"xx")
