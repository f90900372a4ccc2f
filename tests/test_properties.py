"""Property-based tests (hypothesis) for the operator algebra.

The reference ships no property tests (SURVEY §5); these are our addition:
each core operator has an algebraic law that must hold for ARBITRARY
inputs, not just the fixtures — merge is idempotent, aggregate-merge is
associative, dedup is a deterministic one-per-key choice, salting never
changes join results, tolerant casting is total (never throws).

Examples are kept small (Spark job latency dominates); the laws, not the
data volume, carry the coverage.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ecommerce_lakehouse_spark.lake.merge import merge_aggregate, merge_upsert
from ecommerce_lakehouse_spark.operators.relational import dedup_by_key
from ecommerce_lakehouse_spark.operators.scale import salted_join
from ecommerce_lakehouse_spark.sources.readers import cast_to_schema

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-100, max_value=100)
rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=12)


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


@given(target=rows, updates=rows)
@settings(**SETTINGS)
def test_merge_upsert_idempotent_and_key_complete(spark, target, updates):
    """merge(merge(T, U), U) == merge(T, U); result keys == keys(T) ∪ keys(U);
    every key present in U carries U's (deduped) value."""
    t = spark.createDataFrame(target, "k int, v int")
    # merge precondition: updates unique per key (deterministic survivor)
    udedup = {}
    for k, v in updates:
        udedup[k] = v
    u = spark.createDataFrame(list(udedup.items()) or [], "k int, v int")
    once = merge_upsert(t, u, ["k"])
    twice = merge_upsert(once, u, ["k"])
    got_once, got_twice = _collect(once), _collect(twice)
    assert got_once == got_twice
    # key completeness + update-wins
    expected_keys = {k for k, _ in target} | set(udedup)
    by_key = {}
    for k, v in got_once:
        by_key.setdefault(k, []).append(v)
    assert set(by_key) == expected_keys
    for k, v in udedup.items():
        assert v in by_key[k]


@given(a=rows, b=rows, c=rows)
@settings(**SETTINGS)
def test_merge_aggregate_associative(spark, a, b, c):
    """Folding deltas one at a time equals folding their pre-combined sum:
    merge_agg(merge_agg(A, B), C) == merge_agg(A, B ⊎ C) where ⊎ is
    key-wise sum — the law that makes incremental rollup refresh correct
    under any batching."""

    def mk(rws):
        agg = {}
        for k, v in rws:
            agg[k] = agg.get(k, 0) + v
        return spark.createDataFrame(list(agg.items()) or [], "k int, s int")

    A, B, C = mk(a), mk(b), mk(c)
    stepwise = merge_aggregate(merge_aggregate(A, B, ["k"], ["s"]), C, ["k"], ["s"])
    bc = {}
    for k, v in b + c:
        bc[k] = bc.get(k, 0) + v
    BC = spark.createDataFrame(list(bc.items()) or [], "k int, s int")
    combined = merge_aggregate(A, BC, ["k"], ["s"])
    assert _collect(stepwise) == _collect(combined)


@given(data=st.lists(st.tuples(keys, vals, vals), min_size=0, max_size=15))
@settings(**SETTINGS)
def test_dedup_by_key_deterministic_minimum(spark, data):
    """dedup_by_key keeps exactly one row per key — the orderBy-minimal
    one — and only rows that existed in the input."""
    df = spark.createDataFrame(data, "k int, a int, b int")
    out = _collect(dedup_by_key(df, ["k"], [F.asc("a"), F.asc("b")]))
    expected = {}
    for k, a, b in data:
        if k not in expected or (a, b) < expected[k]:
            expected[k] = (a, b)
    assert out == sorted((k, a, b) for k, (a, b) in expected.items())


@given(left=rows, right=st.lists(st.tuples(keys, vals), min_size=0, max_size=6))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right):
    """Salting is invisible in the result: salted_join == plain inner join
    as a multiset, for arbitrary (including duplicate-keyed) inputs."""
    l = spark.createDataFrame(left, "k int, lv int")
    r = spark.createDataFrame(right, "k int, rv int")
    plain = _collect(l.join(r, "k").select("k", "lv", "rv"))
    salted = _collect(salted_join(l, r, "k", n_salts=4).select("k", "lv", "rv"))
    assert salted == plain


# digit-free garbage alphabet: avoids ambiguity over exotic numeric forms
# (unicode digits, "5.7") where Python's int() and Spark's try_cast disagree
_garbage = st.text(
    alphabet="abcxyz !@#_-.",
    max_size=8,
)


@given(
    raw=st.lists(
        st.tuples(
            st.one_of(
                st.integers(min_value=-10**9, max_value=10**9).map(str),
                _garbage,
                st.none(),
            ),
            _garbage,
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_cast_to_schema_total_and_tolerant(spark, raw):
    """Tolerant cast never throws: parseable ints survive exactly, garbage
    becomes NULL (P11 semantics, reference src/etl_utils.py:334-349), row
    count is preserved."""
    import re

    df = spark.createDataFrame(raw, "n string, s string")
    schema = StructType(
        [StructField("n", IntegerType()), StructField("s", StringType())]
    )
    out = cast_to_schema(df, schema).collect()
    assert len(out) == len(raw)
    got = sorted(((r.n, r.s) for r in out), key=str)
    want = []
    for n_raw, s_raw in raw:
        n = None
        if n_raw is not None and re.fullmatch(r"[+-]?\d+", n_raw.strip()):
            v = int(n_raw)
            if -(2**31) <= v < 2**31:
                n = v
        want.append((n, s_raw))
    assert got == sorted(want, key=str)


# ---------------------------------------------------------------------------
# media codec laws (pure functions — no Spark session needed)
# ---------------------------------------------------------------------------


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_ppm_roundtrip_law(h, w, seed):
    """decode(encode(img)) == img for every geometry and pixel content."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import decode_image, encode_ppm

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


@given(
    n=st.integers(1, 500),
    channels=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_law(n, channels, seed):
    """WAV 16-bit PCM roundtrip: dyadic samples (k/1024) survive encode+
    decode bit-exactly; arbitrary floats survive within 1 LSB."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import decode_audio, encode_wav

    rng = np.random.RandomState(seed)
    k = rng.randint(-1024, 1025, size=(n, channels))
    samples = k / 1024.0
    out, rate = decode_audio(encode_wav(samples, 8000))
    assert rate == 8000 and out.shape == (n, channels)
    # k/1024 quantizes to trunc(k*32767/1024); re-scaling is within 1 LSB
    assert np.max(np.abs(out - samples)) <= 1.0 / 32767


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    th=st.integers(1, 12),
    tw=st.integers(1, 12),
    v=st.integers(0, 255),
)
@settings(max_examples=30, deadline=None)
def test_resize_preserves_constant_images(h, w, th, tw, v):
    """Bilinear resize of a constant image is constant (no boundary
    bleed), for every source/target geometry."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import resize_bilinear

    img = np.full((h, w, 3), v, dtype=np.uint8)
    out = resize_bilinear(img, tw, th)
    assert out.shape == (th, tw, 3)
    assert (out == v).all()


@given(
    n_frames=st.integers(1, 6),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_ppm_container_split_law(n_frames, h, w, seed):
    """split(concat(frames)) recovers every frame bit-exactly."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import (
        decode_image,
        encode_ppm,
        split_ppm_frames,
    )

    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    parts = split_ppm_frames(b"".join(encode_ppm(f) for f in frames))
    assert len(parts) == n_frames
    for raw, src in zip(parts, frames):
        assert np.array_equal(decode_image(raw), src)


@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_mulaw_codec_laws(n, seed):
    """For arbitrary int16 signals: (a) companding error is bounded by the
    local step size (|err| <= max(4, |x|/8 + 36)), (b) re-encoding the
    decoded signal is a fixed point (quantize twice == quantize once),
    (c) the WAV container round-trips the codewords byte-exactly."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        decode_wav_any,
        encode_wav_mulaw,
        mulaw_decode,
        mulaw_encode,
    )

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    once = mulaw_decode(mulaw_encode(x))
    err = once.astype(np.int32) - x.astype(np.int32)
    bound = np.maximum(4, np.abs(x.astype(np.int32)) // 8 + 36)
    assert (np.abs(err) <= bound).all()
    assert (mulaw_decode(mulaw_encode(once)) == once).all()  # fixed point
    samples, rate = decode_wav_any(encode_wav_mulaw(once, 8000))
    assert rate == 8000
    assert (np.round(samples[:, 0] * 32768.0).astype(np.int16) == once).all()


@given(
    n=st.integers(min_value=2, max_value=1200),
    amp=st.integers(min_value=100, max_value=30000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_ima_adpcm_tracks_bounded_step_signals(n, amp, seed):
    """ADPCM is adaptive-delta: for signals whose per-sample step is
    within the quantizer's reach the decode must track the input (error
    bounded by a fraction of the step budget), and sample count must
    survive the WAV fact-chunk round trip for ANY length (odd nibble
    counts, partial final blocks)."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        decode_wav_any,
        encode_wav_ima_adpcm,
    )

    rng = np.random.default_rng(seed)
    # smooth random walk: steps well inside the adaptive range
    steps = rng.integers(-200, 201, size=n)
    sig = np.clip(np.cumsum(steps) + rng.integers(-amp // 2, amp // 2 + 1), -32768, 32767).astype(np.int16)
    samples, rate = decode_wav_any(encode_wav_ima_adpcm(sig, 8000))
    dec = np.round(samples[:, 0] * 32768.0).astype(np.int32)
    assert rate == 8000 and len(dec) == n  # fact chunk trims block padding
    err = np.abs(dec - sig.astype(np.int32))
    assert err.max() <= 2048, err.max()  # tracks within quantizer reach


@given(
    frames=st.lists(
        st.binary(min_size=0, max_size=64), min_size=1, max_size=12
    ),
    fps=st.integers(min_value=1, max_value=60),
)
@settings(**SETTINGS)
def test_avi_container_roundtrip_law(frames, fps):
    """For ANY frame payload list (odd/even sizes, empty frames): the AVI
    container must return exactly the same payloads in order, and the
    header metadata must reflect the inputs."""
    from ecommerce_lakehouse_spark.operators.avi import decode_avi, encode_mjpeg_avi

    out, meta = decode_avi(encode_mjpeg_avi(frames, 32, 24, fps=fps))
    assert out == frames
    assert meta["n_frames"] == len(frames)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["fps"] == fps


@given(
    h=st.integers(min_value=1, max_value=48),
    w=st.integers(min_value=1, max_value=48),
    color=st.booleans(),
    coarse=st.booleans(),
    sub=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_progressive_jpeg_equals_baseline_law(h, w, color, coarse, sub, seed):
    """For ANY image/geometry/quantization: decoding the progressive
    stream (SOF2, spectral selection + successive approximation) must
    produce the IDENTICAL pixels to decoding the baseline stream of the
    same quantized coefficients — progressive is a reordering of the
    same data, so any inequality is a codec bug by construction."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    q = None
    if coarse:
        q = np.full((8, 8), 24, dtype=np.int64)
        q[0, 0] = 8
    sub = sub and color  # 4:2:0 only applies to color images
    base = decode_jpeg(encode_jpeg(img, qtable=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, qtable=q, subsample=sub))
    assert (base == prog).all()
    # per-component (non-interleaved) DC scans: same law, different
    # scan geometry — pins the decoder's non-MCU DC block raster
    prog2 = decode_jpeg(
        encode_jpeg_progressive(img, qtable=q, subsample=sub, dc_per_component=True)
    )
    assert (base == prog2).all()


@given(
    kind=st.integers(min_value=0, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_decoder_error_contract_under_fuzz(kind, seed):
    """Corrupt/truncated/random payloads must raise ValueError or
    NotImplementedError from every media decoder — never IndexError/
    KeyError/struct.error from parser internals. A bad asset in a 100 TB
    corpus must surface as a catchable per-record error, not a crash."""
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        decode_wav_any,
        encode_wav_mulaw,
        mulaw_decode,
    )
    from ecommerce_lakehouse_spark.operators.avi import decode_avi, encode_mjpeg_avi
    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg
    from ecommerce_lakehouse_spark.operators.media import (
        decode_audio,
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    base = [
        encode_png(rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)),
        encode_jpeg(rng.integers(0, 256, (16, 16), dtype=np.uint8)),
        encode_mjpeg_avi([b"\xff\xd8test"], 8, 8),
        b"P6\n4 4\n255\n" + bytes(48),
        encode_wav_mulaw(
            mulaw_decode(rng.integers(0, 256, 64).astype(np.uint8)), 8000
        ),
    ]
    if kind == 0:  # random bytes
        payload = bytes(rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8))
    elif kind == 1:  # truncation of a valid payload
        p = base[int(rng.integers(0, len(base)))]
        payload = p[: int(rng.integers(0, len(p)))]
    else:  # byte corruption of a valid payload
        p = bytearray(base[int(rng.integers(0, len(base)))])
        for _ in range(int(rng.integers(1, 6))):
            p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
        payload = bytes(p)
    for dec in (decode_image, decode_audio, decode_avi, decode_wav_any):
        try:
            dec(payload)
        except (ValueError, NotImplementedError):
            pass  # the contract


@given(
    vs=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=1,
        max_size=25,
    ),
    buckets=st.sampled_from([1, 2, 8]),
)
@settings(**SETTINGS)
def test_bucketed_global_rank_law(spark, vs, buckets):
    """bucketed_global_row_number == row_number over a global window for
    ANY input (ties, point masses, negatives, single bucket) and any
    bucket count — the law that makes the distributed rewrite safe."""
    from pyspark.sql import Window

    from ecommerce_lakehouse_spark.operators.scale import bucketed_global_row_number

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vs)], "id int, v double"
    )
    got = bucketed_global_row_number(
        df, sort_value=F.col("v"), order_cols=[F.asc("v"), F.asc("id")],
        buckets=buckets,
    )
    exp = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id")))
    )
    assert {(r.id, r.rn) for r in got.collect()} == {
        (r.id, r.rn) for r in exp.collect()
    }


@given(
    n=st.integers(min_value=1, max_value=10),
    edges1=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=8
    ),
    edges2=st.lists(
        st.tuples(st.integers(0, 9), st.integers(10, 14)), min_size=0, max_size=6
    ),
    extra=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_incremental_components_equals_full(spark, n, edges1, edges2, extra):
    """incremental_components law: seeding from batch-1's labeling and
    re-propagating only adjacent components yields EXACTLY the labels of
    a from-scratch recompute over the union graph — for arbitrary
    batch-1 graphs and arbitrary new edges (every new edge touches a new
    node, the pipeline's invariant)."""
    from ecommerce_lakehouse_spark.operators.graph import (
        incremental_components,
        min_label_propagation,
    )

    ids1 = list(range(n))
    e1 = [(a, b) for a, b in edges1 if a < n and b < n and a != b]
    new_nodes = list(range(10, 10 + max(1, extra)))
    e2 = [(a, b) for a, b in e1[:0]] + [
        (a, b) for a, b in edges2 if a < n and b in new_nodes
    ]
    ids_all = ids1 + new_nodes
    df_ids1 = spark.createDataFrame([(i,) for i in ids1], "doc_id int")
    df_e1 = spark.createDataFrame(e1, "doc_a int, doc_b int") if e1 else (
        spark.createDataFrame([], "doc_a int, doc_b int")
    )
    prev = min_label_propagation(df_ids1, df_e1)
    df_ids = spark.createDataFrame([(i,) for i in ids_all], "doc_id int")
    all_e = e1 + e2
    df_e = spark.createDataFrame(all_e, "doc_a int, doc_b int") if all_e else (
        spark.createDataFrame([], "doc_a int, doc_b int")
    )
    full = {
        (r.doc_id, r.cluster_id)
        for r in min_label_propagation(df_ids, df_e).collect()
    }
    sub_labels, _ = incremental_components(prev, df_ids, df_e)
    merged = {
        (r.doc_id, r.cluster_id) for r in sub_labels.collect()
    }
    untouched = {t for t in ((r.doc_id, r.cluster_id) for r in prev.collect())
                 if t[0] not in {d for d, _ in merged}}
    assert untouched | merged == full


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8
        ),
        min_size=0,
        max_size=8,
    ),
    data=st.data(),
)
@settings(**SETTINGS)
def test_prefix_similarity_join_equals_bruteforce(spark, tmp_path_factory, docs, data):
    """The AllPairs prefix-filter lemma must lose NOTHING: for arbitrary
    small corpora over a colliding vocabulary, shingle_similarity_join's
    row set equals literal all-pairs Jaccard enumeration (after the
    exact-text collapse)."""
    import itertools
    import os

    rows = [
        (i, " ".join(words), "en", "s0", 0) for i, words in enumerate(docs)
    ]
    d = str(tmp_path_factory.mktemp("simprop"))
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    canon = {}
    for i, words in enumerate(docs):
        canon.setdefault(" ".join(words), i)
    sh = {}
    for t, i in canon.items():
        toks = t.strip().split()
        if len(toks) >= 3:
            sh[i] = {" ".join(toks[k : k + 3]) for k in range(len(toks) - 2)}
    expected = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        c = len(sh[a] & sh[b])
        u = len(sh[a] | sh[b])
        if u and c / u >= 0.5:
            expected.add((a, b, c, u))

    from ecommerce_lakehouse_spark.queries.llm7 import shingle_similarity_join

    got = {
        (r.doc_a, r.doc_b, r.n_common, r.n_union)
        for r in shingle_similarity_join(spark, d).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# KLL level sketch: history independence over arbitrary partitionings
# ---------------------------------------------------------------------------

from ecommerce_lakehouse_spark.operators.sketch import (  # noqa: E402
    kll_level_sketch,
    kll_merge,
    md5_hash60,
)

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow


sk_vals = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), st.integers(0, 2)),
    min_size=1,
    max_size=40,
)


@given(items=sk_vals, seed=st.integers(0, 3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_kll_sketch_partition_invariant(spark, items, seed):
    """The sketch law: for ANY input multiset and ANY disjoint grouping,
    merge(per-group sketches) is bit-identical to the whole-data sketch
    (history independence — the property that makes checkpoint-and-merge
    at 100 TB safe). Group assignment varies with the hypothesis seed so
    the law is exercised across partitionings, k small enough (8) that
    compaction levels actually engage."""
    rows = [(i, v, (i * 7 + v + seed) % 3) for i, (v, _) in enumerate(items)]
    df = spark.createDataFrame(rows, "rid long, v long, p long").select(
        "p", F.col("v").alias("cents"), md5_hash60(F.col("rid")).alias("h")
    )
    whole = kll_level_sketch(df, "cents", "h", k=8).collect()
    per = kll_level_sketch(df, "cents", "h", k=8, group_cols=["p"]).drop("p")
    merged = kll_merge(per, k=8).collect()
    # degenerate case: every partition sketch may be empty only if df is
    # empty, which min_size=1 rules out — both sides must be one row
    assert len(whole) == 1 and len(merged) == 1
    w, m = whole[0], merged[0]
    assert (w.n, w.level) == (m.n, m.level)
    assert [(i.v, i.h) for i in w.items] == [(i.v, i.h) for i in m.items]
