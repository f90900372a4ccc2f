"""Pure-numpy/stdlib media codecs: PPM/PGM/BMP image decode, WAV PCM
audio decode, bilinear resize, concatenated-PPM frame splitting."""

import struct

import numpy as np
import pytest

from ecommerce_lakehouse_spark.operators.media import (
    audio_features,
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    resize_bilinear,
    sniff_mime,
    split_ppm_frames,
)


def _img(h=6, w=8, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_bit_exact():
    img = _img()
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_ascii_p3():
    img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # 1x2
    payload = b"P3\n# comment\n2 1\n255\n1 2 3 4 5 6\n"
    assert np.array_equal(decode_image(payload), img)


def test_pgm_binary_p5():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5\n4 3\n255\n" + gray.tobytes()
    out = decode_image(payload)
    assert out.shape == (3, 4, 1) and np.array_equal(out[:, :, 0], gray)


def _encode_bmp24(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP writer (test-side reference encoder)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pixel_data = b""
    for row in img[::-1]:  # bottom-up
        bgr = row[:, ::-1].tobytes()
        pixel_data += bgr + b"\x00" * (stride - len(bgr))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def test_bmp_decode_matches_source():
    img = _img(5, 7)
    assert np.array_equal(decode_image(_encode_bmp24(img)), img)


def test_bmp_odd_width_padding():
    img = _img(3, 3)  # stride 9 -> padded to 12
    assert np.array_equal(decode_image(_encode_bmp24(img)), img)


def test_sniff_mime():
    assert sniff_mime(encode_ppm(_img())) == "image/x-portable-pixmap"
    assert sniff_mime(b"\x89PNG\r\n") == "image/png"
    assert sniff_mime(b"RIFFxxxxWAVE") == "audio/wav"
    assert sniff_mime(b"RIFFxxxxAVI ") == "application/octet-stream"
    assert sniff_mime(b"garbage") == "application/octet-stream"


def test_resize_bilinear_identity_and_constant():
    img = _img(8, 8)
    assert np.array_equal(resize_bilinear(img, 8, 8), img)
    const = np.full((4, 4, 3), 77, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(const, 9, 5), np.full((5, 9, 3), 77, np.uint8))


def test_resize_bilinear_downsample_2x_is_block_mean():
    # exact 2x downsample with align_corners=False samples at pixel centers
    # of each 2x2 block -> bilinear = block mean
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    img[:2, :2, 0] = 100
    out = resize_bilinear(img, 2, 2)
    assert out[0, 0, 0] == 100 and out[1, 1, 0] == 0


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(1600)
    mono = ((t % 64) - 32) / 32.0  # sawtooth, dyadic values
    payload = encode_wav(mono, rate)
    assert sniff_mime(payload) == "audio/wav"
    samples, got_rate = decode_audio(payload)
    assert got_rate == rate and samples.shape == (1600, 1)
    f = audio_features(samples, got_rate)
    assert f["n_frames"] == 1600 and f["duration_s"] == 0.2
    assert f["zero_crossing_rate"] > 0 and f["rms"] > 0.3


def test_wav_stereo():
    rate = 4000
    left = np.linspace(-0.5, 0.5, 400)
    right = -left
    payload = encode_wav(np.stack([left, right], axis=1), rate)
    samples, _ = decode_audio(payload)
    assert samples.shape == (400, 2)
    assert abs(samples[:, 0].mean()) < 0.01


def test_split_ppm_frames():
    frames = [_img(seed=i) for i in range(5)]
    blob = b"".join(encode_ppm(f) for f in frames)
    parts = split_ppm_frames(blob)
    assert len(parts) == 5
    for raw, src in zip(parts, frames):
        assert np.array_equal(decode_image(raw), src)


def test_split_ppm_frames_rejects_garbage():
    with pytest.raises(ValueError):
        split_ppm_frames(b"NOTAPPM")


# ---------- PNG (round-3: pure-stdlib zlib + numpy unfilter) ----------


def _rng_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


def test_png_roundtrip_all_color_types():
    """gray / gray+alpha / RGB / RGBA, with >=5 rows so every filter type
    (None/Sub/Up/Average/Paeth) is exercised by the cycling encoder."""
    from ecommerce_lakehouse_spark.operators.media import encode_png

    for c in (1, 2, 3, 4):
        src = _rng_img(9, 7, c, seed=c)
        payload = encode_png(src)
        assert sniff_mime(payload) == "image/png"
        out = decode_image(payload)
        want = src[:, :, None] if src.ndim == 2 else src
        assert out.shape == want.shape
        assert np.array_equal(out, want), f"PNG round-trip mismatch c={c}"


def test_png_single_filter_rows():
    """Force each filter type on its own by slicing rows so the first row
    uses filter y%5 — checks reconstruction is per-row independent of the
    cycle phase."""
    from ecommerce_lakehouse_spark.operators.media import encode_png

    src = _rng_img(5, 4, 3, seed=42)
    assert np.array_equal(decode_image(encode_png(src)), src)
    # gradient image (worst case for Sub/Paeth deltas)
    grad = np.arange(8 * 6 * 3, dtype=np.uint32).reshape(8, 6, 3) % 256
    grad = grad.astype(np.uint8)
    assert np.array_equal(decode_image(encode_png(grad)), grad)


def test_png_unsupported_variants_raise():
    import struct as _struct
    import zlib as _zlib

    from ecommerce_lakehouse_spark.operators.media import _png_chunk

    # sub-byte depth header (1/2/4-bit packing is genuinely unsupported)
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=4"):
        decode_image(payload)


def test_jpeg_garbage_is_parse_error():
    # JPEG decodes for real now (round 3) — truncated garbage is a parse
    # error, not a missing-codec error
    with pytest.raises(ValueError, match="marker"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


# ---------- GIF (round-3: pure-Python LZW) + palette PNG ----------


def test_gif_roundtrip():
    from ecommerce_lakehouse_spark.operators.media import encode_gif

    rng = np.random.default_rng(3)
    # <=256 distinct colors: random picks from a 200-color palette
    palette = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, size=(23, 17))
    src = palette[idx]
    payload = encode_gif(src)
    assert sniff_mime(payload) == "image/gif"
    out = decode_image(payload)
    assert out.shape == src.shape
    assert np.array_equal(out, src)


def test_gif_long_stream_dictionary_growth():
    """Image large enough that the LZW dictionary grows past several code
    widths (and possibly emits a mid-stream clear)."""
    from ecommerce_lakehouse_spark.operators.media import encode_gif

    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(120, 90))
    src = palette[idx]
    assert np.array_equal(decode_image(encode_gif(src)), src)


def test_gif_interlaced():
    """Set the interlace flag on a stream whose rows were pre-weaved into
    GIF pass order — the decoder's de-weave must restore the original."""
    from ecommerce_lakehouse_spark.operators.media import encode_gif

    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    h, w = 11, 7
    src = palette[rng.integers(0, 16, size=(h, w))]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    weaved = src[order]  # stream order
    payload = bytearray(encode_gif(weaved))
    # image descriptor: 6 (header) + 7 (LSD) + 3*palsize, then 0x2C + 9
    palsize = 2 << (payload[10] & 7)
    desc = 13 + 3 * palsize
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40  # set interlace flag
    out = decode_image(bytes(payload))
    assert np.array_equal(out, src)


def test_png_palette():
    """Color-type-3 PNG: indices + PLTE lookup -> RGB."""
    import struct as _struct
    import zlib as _zlib

    from ecommerce_lakehouse_spark.operators.media import _png_chunk

    rng = np.random.default_rng(11)
    plte = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, size=(9, 5), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(9))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 5, 9, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_image(payload)
    assert np.array_equal(out, plte[idx])


# ---------- JPEG (round-3: baseline codec, numpy DCT + generic Huffman) ----


def test_jpeg_block_constant_bit_exact():
    """Constant 8x8 blocks are DC-only; with unit quantization the
    round-trip is bit-exact — the property the oracle query relies on."""
    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    bvals = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(bvals, 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (24, 32, 1)
    assert np.array_equal(out[:, :, 0], img)
    # partial edge blocks (non-multiple-of-8 geometry) stay exact
    img2 = img[:19, :27]
    out2 = decode_jpeg(encode_jpeg(img2))
    assert out2.shape == (19, 27, 1)
    assert np.array_equal(out2[:, :, 0], img2)


def test_jpeg_lossy_error_bounds():
    """Unit quantization leaves only DCT float rounding: gray within ±1,
    RGB within ±2 (extra YCbCr rounding)."""
    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(gray))[:, :, 0]
    assert np.abs(got.astype(int) - gray.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    got3 = decode_jpeg(encode_jpeg(rgb))
    assert np.abs(got3.astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_quantized_coarse():
    """A real (non-unit) quantization table still decodes with bounded
    error — exercises dequantization and larger coefficient categories."""
    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    # smooth gradient: coarse quantization error stays small
    ys, xs = np.mgrid[0:32, 0:40]
    img = ((xs * 3 + ys * 2) % 256).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, qtable=q))[:, :, 0]
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 24


def test_jpeg_via_decode_image_and_sniff():
    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg

    payload = encode_jpeg(np.full((8, 8), 77, dtype=np.uint8))
    assert sniff_mime(payload) == "image/jpeg"
    assert decode_image(payload)[0, 0, 0] == 77


def test_jpeg_progressive_raises():
    """A progressive (SOF2) header must raise, not mis-decode."""
    import struct as _struct

    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    # progressive (SOF2) now decodes for real; lossless (SOF3) still
    # raises from the header instead of mis-decoding
    payload = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="0xffc3"):
        decode_jpeg(bytes(payload))


def test_jpeg_420_subsampled():
    """4:2:0 (the real-world default layout): encoder pools chroma 2x2,
    decoder handles multi-block MCUs + nearest-neighbor upsampling.
    Color constant per 16x16 block makes pooling lossless -> exact."""
    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    cvals = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(cvals, 16, axis=0), 16, axis=1)
    out = decode_jpeg(encode_jpeg(big, subsample=True))
    assert out.shape == big.shape
    assert np.array_equal(out, big)
    # odd geometry: crop back to exact size, bounded error on a gradient
    ys, xs = np.mgrid[0:33, 0:41]
    smooth = np.stack(
        [(xs * 2 + ys) % 256, (xs + ys * 3) % 256, (xs * 4) % 256], axis=2
    ).astype(np.uint8)
    out2 = decode_jpeg(encode_jpeg(smooth, subsample=True))
    assert out2.shape == smooth.shape
    assert np.abs(out2.astype(int) - smooth.astype(int)).mean() < 4


# ---------------------------------------------------------------- AVI


def test_avi_roundtrip_and_meta():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.avi import decode_avi, encode_mjpeg_avi
    from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg

    frames = [
        encode_jpeg(np.full((16, 16), (11 + 40 * f) % 256, dtype=np.uint8))
        for f in range(4)
    ]
    avi = encode_mjpeg_avi(frames, 16, 16, fps=25)
    out, meta = decode_avi(avi)
    assert out == frames  # byte-identical frame payloads
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_frames"] == 4 and meta["fps"] == 25
    assert meta["handler"] == "MJPG" and meta["stream_type"] == "vids"
    for f, payload in enumerate(out):
        assert (decode_jpeg(payload) == (11 + 40 * f) % 256).all()


def test_avi_odd_sized_frames_word_aligned():
    # JPEG payloads are frequently odd-length; chunk padding must keep
    # the walker aligned and must not leak the pad byte into the frame.
    from ecommerce_lakehouse_spark.operators.avi import decode_avi, encode_mjpeg_avi

    frames = [b"\xff\xd8" + bytes(range(n)) for n in (1, 2, 3, 4, 5)]
    out, _ = decode_avi(encode_mjpeg_avi(frames, 8, 8))
    assert out == frames


def test_avi_rejects_non_avi_and_truncated():
    import pytest

    from ecommerce_lakehouse_spark.operators.avi import decode_avi, encode_mjpeg_avi

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    avi = encode_mjpeg_avi([b"\xff\xd8frame"], 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(avi[:-6] + avi[-2:])  # declared size now overruns


# ------------------------------------------------- compressed audio


def test_mulaw_lattice_roundtrip_exact():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        mulaw_decode,
        mulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    pcm = mulaw_decode(codes)
    # decoded values re-encode to codewords that decode identically (the
    # lattice is stable), and the curve is symmetric around zero
    assert (mulaw_decode(mulaw_encode(pcm)) == pcm).all()
    assert pcm.max() == 32124 and pcm.min() == -32124
    assert mulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0


def test_mulaw_encode_quantizes_toward_curve():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        mulaw_decode,
        mulaw_encode,
    )

    x = np.linspace(-32000, 32000, 1001).astype(np.int16)
    err = mulaw_decode(mulaw_encode(x)).astype(np.int32) - x.astype(np.int32)
    # companding error is bounded by the local step (coarsest ~ 1/8 of
    # magnitude near full scale)
    assert np.abs(err).max() < 2048
    small = np.arange(-100, 101).astype(np.int16)
    err_small = mulaw_decode(mulaw_encode(small)).astype(np.int32) - small
    assert np.abs(err_small).max() <= 4  # fine steps near zero


def test_mulaw_wav_through_production_decode_path():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        encode_wav_mulaw,
        mulaw_decode,
    )
    from ecommerce_lakehouse_spark.operators.media import decode_audio

    pcm = mulaw_decode(np.arange(256, dtype=np.uint8))
    samples, rate = decode_audio(encode_wav_mulaw(pcm, 8000))
    assert rate == 8000 and samples.shape == (256, 1)
    assert (np.round(samples[:, 0] * 32768.0).astype(np.int16) == pcm).all()


def test_ima_adpcm_block_and_wav_roundtrip():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        encode_wav_ima_adpcm,
        ima_adpcm_decode_block,
        ima_adpcm_encode_block,
    )
    from ecommerce_lakehouse_spark.operators.media import decode_audio

    t = np.arange(2000)
    sig = (np.sin(t / 15) * 18000).astype(np.int16)
    # block-level: header sample is exact, tail tracks the signal
    blk = ima_adpcm_decode_block(ima_adpcm_encode_block(sig[:505]))
    assert blk[0] == sig[0]
    # WAV-level through the production path: fact chunk trims padding,
    # adaptive quantizer reaches > 25 dB SNR on a smooth signal
    samples, rate = decode_audio(encode_wav_ima_adpcm(sig, 8000))
    dec = np.round(samples[:, 0] * 32768.0).astype(np.int32)
    assert rate == 8000 and len(dec) == len(sig)
    err = dec - sig.astype(np.int32)
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err.astype(np.float64) ** 2).mean())
    assert snr > 25, snr


def test_wav_unknown_format_tag_raises():
    import struct

    import pytest

    from ecommerce_lakehouse_spark.operators.audio_codecs import decode_wav_any
    from ecommerce_lakehouse_spark.operators.avi import _chunk

    fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 8000, 1, 0)  # MP3-in-WAV
    wav = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", b"\x00\x00"))
    with pytest.raises(NotImplementedError, match="0x0055"):
        decode_wav_any(wav)


# ------------------------------------------------- progressive JPEG


def test_progressive_jpeg_matches_baseline_decode():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    qt = np.full((8, 8), 16, dtype=np.int64)
    qt[0, 0] = 8
    for shape in [(8, 8), (24, 40), (21, 17), (33, 9, 3), (16, 16, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (None, qt):
            base = decode_jpeg(encode_jpeg(img, qtable=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, qtable=q))
            assert (base == prog).all(), (shape, q is not None)


def test_progressive_jpeg_is_sof2_and_multiscan():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive

    img = np.zeros((16, 16), dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in payload  # SOF2 frame marker
    assert payload.count(b"\xff\xda") == 6  # DC first/refine + 2x2 AC scans


def test_progressive_decode_through_decode_image():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive
    from ecommerce_lakehouse_spark.operators.media import decode_image, sniff_mime

    # constant gray: DC-only, unit quant -> bit-exact through the
    # production decode_image dispatch (magic sniff -> jpeg decoder)
    img = np.full((16, 24), 77, dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    assert sniff_mime(payload) == "image/jpeg"
    out = decode_image(payload)
    assert out.shape == (16, 24, 1) and (out == 77).all()


def test_png_adam7_interlace_roundtrip():
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import decode_image, encode_png

    rng = np.random.default_rng(11)
    for shape in [(1, 1), (7, 3), (8, 8), (21, 17, 3), (9, 25, 4), (6, 2, 2)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_image(encode_png(img, interlace=True))
        want = img[:, :, None] if img.ndim == 2 else img
        assert out.shape == want.shape and (out == want).all(), shape
    # interlaced and straight-laced encodings decode identically
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    a = decode_image(encode_png(img, interlace=True))
    b = decode_image(encode_png(img))
    assert (a == b).all()


def test_png_16bit_high_byte_decode():
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import _png_chunk, decode_image

    h, w = 4, 5
    rng = np.random.default_rng(2)
    px16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    lines = bytearray()
    for y in range(h):
        lines.append(0)
        lines += px16[y].byteswap().tobytes()  # 16-bit samples are big-endian
    ihdr = _struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_image(png)
    assert (out[:, :, 0] == (px16 >> 8).astype(np.uint8)).all()


def test_wav_24bit_and_32bit_pcm_decode():
    import struct as _struct

    import numpy as np

    from ecommerce_lakehouse_spark.operators.audio_codecs import decode_wav_any
    from ecommerce_lakehouse_spark.operators.avi import _chunk

    vals = np.array([0, 1, -1, 8388607, -8388608, 123456], dtype=np.int64)
    data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    wav = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data))
    s, r = decode_wav_any(wav)
    assert r == 8000
    assert (np.round(s[:, 0].astype(np.float64) * (1 << 23)).astype(np.int64) == vals).all()

    v32 = np.array([0, 1, -1, (1 << 31) - 1, -(1 << 31)], dtype="<i4")
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 4, 4, 32)
    wav = _chunk(b"RIFF", b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", v32.tobytes()))
    s, r = decode_wav_any(wav)
    got = np.round(s[:, 0].astype(np.float64) * (1 << 31)).astype(np.int64)
    # float32 rounding at full scale: within 256 of the int32 value
    assert np.abs(got - v32.astype(np.int64)).max() <= 256


def test_rgba_features_gray_alpha_channel_semantics(spark):
    # PNG color type 4 (gray+alpha): channel 2 is ALPHA, not a color —
    # mean_r/g/b must all be the gray mean, mean_a the alpha mean.
    import numpy as np

    from ecommerce_lakehouse_spark.operators.media import encode_png
    from ecommerce_lakehouse_spark.operators.multimodal import image_feature_extract_rgba

    ga = np.zeros((4, 4, 2), dtype=np.uint8)
    ga[:, :, 0] = 10  # gray
    ga[:, :, 1] = 200  # alpha
    df = spark.createDataFrame([(1, bytearray(encode_png(ga)))], "doc_id bigint, payload binary")
    row = image_feature_extract_rgba(df).collect()[0]
    assert row.mean_r == row.mean_g == row.mean_b == 10.0
    assert row.mean_a == 200.0


def test_progressive_noninterleaved_dc_and_baseline_multiscan_raise():
    import struct as _struct

    import numpy as np
    import pytest

    from ecommerce_lakehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    # the adversarial geometry: 4:2:0, h not a multiple of 16 -> the
    # full-res Y plane's own raster (3 block rows) differs from the
    # MCU-padded grid (4); per-component DC scans must still be exact
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample=True))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, subsample=True, dc_per_component=True)
    )
    assert (base == prog).all()

    # baseline multi-scan (Ns < Nf) raises honestly instead of IndexError
    payload = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = payload.index(b"\xff\xda")
    (seglen,) = _struct.unpack_from(">H", payload, i + 2)
    # rewrite SOS: 1 component instead of 3 (shrink the segment)
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    payload[i + 2 : i + 2 + seglen] = _struct.pack(">H", 2 + len(sos)) + sos
    with pytest.raises(NotImplementedError, match="multi-scan baseline"):
        decode_jpeg(bytes(payload))


def test_mp3_walker_matches_builder():
    """Header walk over a built stream recovers exactly the frame plan:
    counts, rate, VBR flag, lead-in, per-frame byte accounting."""
    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        MP3_BITRATES_KBPS,
        build_mp3_stream,
        mp3_frame_length,
        mp3_stream_features,
    )

    idxs, pads = [3, 9, 9, 14, 1], [1, 0, 1, 0, 1]
    p = build_mp3_stream(idxs, 1, pads, id3_size=33, junk=4, trailing=9)
    f = mp3_stream_features(p)
    assert f["n_frames"] == 5
    assert f["sample_rate"] == 48000
    assert f["lead_in_bytes"] == 10 + 33 + 4
    assert f["bitrate_kbps_sum"] == sum(MP3_BITRATES_KBPS[i] for i in idxs)
    assert f["n_distinct_bitrates"] == 4 and f["is_vbr"]
    assert f["channel_mode"] == 3
    assert f["stream_bytes"] == sum(
        mp3_frame_length(MP3_BITRATES_KBPS[i], 48000, pd_)
        for i, pd_ in zip(idxs, pads)
    )
    assert f["duration_s"] == 5 * 1152 / 48000

    # CBR stream: single bitrate, not VBR
    c = mp3_stream_features(build_mp3_stream([8] * 7, 2))
    assert (c["n_frames"], c["is_vbr"], c["n_distinct_bitrates"]) == (7, False, 1)
    assert c["lead_in_bytes"] == 0  # no ID3, frames start at byte 0


def test_mp3_walker_total_on_garbage_and_truncation():
    """The walk must terminate and stay sane on arbitrary bytes, resync
    past corruption, and ignore a truncated trailing frame."""
    import random

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        build_mp3_stream,
        mp3_stream_features,
    )

    rng = random.Random(7)
    for _ in range(300):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
        f = mp3_stream_features(b)
        assert f["n_frames"] >= 0 and f["stream_bytes"] <= len(b)

    # corruption between frames: walker resyncs and still finds frame 2
    good = build_mp3_stream([5], 0) + b"\xff\x00\x13" + build_mp3_stream([5], 0)
    assert mp3_stream_features(good)["n_frames"] == 2
    # truncated second frame: only the complete one counts
    whole = build_mp3_stream([5, 5], 0)
    cut = whole[: len(whole) - 10]
    assert mp3_stream_features(cut)["n_frames"] == 1
    # rate switch mid-stream: frames at a different rate than the first
    # are not counted (consistency rule)
    mixed = build_mp3_stream([5], 0) + build_mp3_stream([5], 1)
    assert mp3_stream_features(mixed)["n_frames"] == 1


def test_ogg_walker_matches_builder_and_verifies_crc():
    """Page walk recovers the page plan exactly; a flipped payload byte
    fails the real RFC 3533 CRC and drops that page; the CRC matches an
    independent bitwise implementation."""
    import random

    from ecommerce_lakehouse_spark.operators.audio_codecs import (
        build_ogg_page,
        ogg_crc,
        ogg_stream_features,
    )

    def crc_ref(data):  # independent bitwise form (no table)
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
                crc &= 0xFFFFFFFF
        return crc

    rng = random.Random(11)
    for _ in range(30):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        assert ogg_crc(b) == crc_ref(b)

    p1 = build_ogg_page(9, 0, 500, [100, 255, 255, 30], header_type=2)
    p2 = build_ogg_page(9, 1, 900, [10, 0], header_type=4)
    other = build_ogg_page(8, 0, 1, [5])  # different serial: skipped
    f = ogg_stream_features(b"xx" + p1 + other + p2 + b"yy")
    assert f == {
        "n_pages": 2, "n_packets": 4, "n_continued": 2,
        "stream_bytes": len(p1) + len(p2), "last_granule": 900,
        "serial": 9, "bos_seen": True, "eos_seen": True,
    }
    bad = bytearray(p1)
    bad[-1] ^= 0x5A
    assert ogg_stream_features(bytes(bad))["n_pages"] == 0
    # fuzz: total on arbitrary bytes
    for _ in range(200):
        g = ogg_stream_features(
            bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        )
        assert g["stream_bytes"] <= 300
