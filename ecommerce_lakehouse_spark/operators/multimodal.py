"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the one place Python touches the hot path, amortized per
batch, never per row.

Decoding is REAL for uncompressed formats (PPM/PGM/BMP images, WAV PCM
audio, concatenated-PPM video) via ``operators/media.py`` — pure
numpy/stdlib, no native codecs. Compressed formats (JPEG/PNG/MP3) raise
``NotImplementedError`` after magic-byte sniffing; a production deployment
drops PIL/ffmpeg into those two functions and every operator here is
unchanged. The decode→feature/resize/frame-sample pipelines are
oracle-tested end-to-end (image_decode_features / audio_decode_features:
deterministic payloads generated, encoded, decoded, and featurized
Spark-side, matched against closed-form DuckDB SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ecommerce_lakehouse_spark.operators.media import (  # noqa: F401
    audio_features,
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    resize_bilinear,
    sniff_mime,
    split_ppm_frames,
)

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, last_byte int, checksum int"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as a binary payload + typed metadata struct — the
    storage shape multimodal tables use (payload column stays opaque to
    the engine; metadata is columnar and prunable)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("media_meta"),
    )


def featurize_binary(df: DataFrame) -> DataFrame:
    """Deterministic byte-level featurization via mapInPandas: stands in
    for decode→feature-extract. One Arrow batch in, one out; runs fully
    parallel per input partition (no shuffle)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else None),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else None),
                    "checksum": payloads.map(lambda b: sum(b) % 256),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, n_bytes int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int"


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Decode→resize plumbing (stubbed decode): emits the target geometry
    plus payload size per document. With media libs installed, the loop
    body becomes decode_image(payload).resize((width, height)) — the
    mapInPandas signature, output schema, and per-partition parallelism
    are exactly what the production operator keeps."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, frame_size: int = 64) -> DataFrame:
    """Frame-sampling plumbing (stubbed decode): chunks the payload into
    fixed-size pseudo-frames and emits every n-th — the 1→many fan-out
    shape (one output row per sampled frame) a real video sampler
    produces. Row explosion happens inside the Arrow batch, not via a
    join; output partitioning follows the input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [payload[i : i + frame_size] for i in range(0, len(payload), frame_size)]
                for idx in range(0, len(frames), every_n):
                    out["doc_id"].append(doc)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frames[idx]))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
