"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the one place Python touches the hot path, amortized per
batch, never per row.

The actual media decoders (PIL/librosa/ffmpeg) are NOT installed in this
environment; ``decode_image``/``decode_audio`` are explicit stubs. The
Spark-side plumbing — schema, batch iteration, deterministic featurization
of the raw bytes — is real and oracle-tested (multimodal_features query).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, last_byte int, checksum int"


def decode_image(payload: bytes) -> "object":
    """Stub: real implementation decodes to HxWxC array via PIL/libjpeg.
    Kept as a hard failure so nothing silently fake-decodes media."""
    raise NotImplementedError("image decoding requires PIL — not available in this environment")


def decode_audio(payload: bytes) -> "object":
    raise NotImplementedError("audio decoding requires librosa/ffmpeg — not available here")


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
