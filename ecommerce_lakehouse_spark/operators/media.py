"""Real media decoders — pure numpy/stdlib, no external media libraries
required.

Covers the formats decodable without native codecs:

- **PPM/PGM** (P6/P5 binary, P3/P2 ASCII) — the canonical uncompressed
  image interchange format.
- **BMP** (Windows DIB, 24/32-bit uncompressed) — header offsets per the
  public BITMAPINFOHEADER layout.
- **PNG** (8-bit gray / gray+alpha / RGB / RGBA / palette, interlace 0
  AND Adam7) — full
  spec-conformant decode: chunk walk, zlib inflate of concatenated IDATs,
  per-scanline unfilter for all five filter types (None/Sub/Up/Average/
  Paeth). Plus a matching encoder that cycles filter types per row, so
  round-trip tests exercise every unfilter path.
- **GIF** (87a/89a, pure-Python LZW, interlace de-weave).
- **JPEG** (baseline + progressive, any integer subsampling) —
  operators/jpeg.py.
- **WAV** (PCM 8/16-bit, G.711 mu-law, IMA ADPCM) — one RIFF fmt-tag
  dispatcher, operators/audio_codecs.py.
- **MJPEG-AVI video** — operators/avi.py RIFF container walker.

Formats that genuinely need a native codec (MP3/OGG; arithmetic/12-bit
JPEG) are sniffed by magic bytes/headers and raise
``NotImplementedError`` — nothing silently fake-decodes media; a
production deployment drops in PIL/ffmpeg behind the same function
signatures and the Spark-side operators in ``operators/multimodal.py``
are unchanged.

All decoders are plain ``bytes -> numpy`` functions so they vectorize
inside Arrow ``mapInPandas`` batches (the only Python boundary).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# magic-byte sniffing
# ---------------------------------------------------------------------------

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"P6", "image/x-portable-pixmap"),
    (b"P5", "image/x-portable-graymap"),
    (b"P3", "image/x-portable-pixmap-ascii"),
    (b"P2", "image/x-portable-graymap-ascii"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),  # refined below (RIFF....WAVE)
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
]


def sniff_mime(payload: bytes) -> str:
    """Identify a payload by magic bytes (never by trusting metadata)."""
    for magic, mime in _MAGIC:
        if payload[: len(magic)] == magic:
            if mime == "audio/wav" and payload[8:12] != b"WAVE":
                return "application/octet-stream"
            return mime
    return "application/octet-stream"


# ---------------------------------------------------------------------------
# image decode
# ---------------------------------------------------------------------------


def _decode_pnm(payload: bytes) -> np.ndarray:
    """PPM/PGM (P2/P3 ASCII, P5/P6 binary) -> HxWxC uint8 array."""
    # header tokens: magic, width, height, maxval — whitespace/comment-separated
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    magic = payload[:2]
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    channels = 3 if magic in (b"P6", b"P3") else 1
    n = w * h * channels
    if magic in (b"P6", b"P5"):
        arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        arr = np.array(payload[pos:].split()[:n], dtype=np.uint8)
    return arr.reshape(h, w, channels)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> HxWx3 uint8 (BGR -> RGB, bottom-up)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} not supported")
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3  # rows pad to 4-byte boundaries
    rows = []
    for r in range(h):
        off = data_offset + r * row_stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * bytes_pp, offset=off)
        rows.append(row.reshape(w, bytes_pp)[:, :3][:, ::-1])  # BGR(A) -> RGB
    img = np.stack(rows)
    return img if top_down else img[::-1]


# PNG color types -> channel count (bit depth 8, non-interlaced only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec section 9 'Filtering'):
    each scanline is prefixed by a filter-type byte; reconstruction uses
    the left neighbor (a), the above neighbor (b), and the upper-left
    neighbor (c). Sub is a per-byte-lane cumulative sum (vectorized);
    Average/Paeth carry a left-to-right dependency, done per pixel."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: recon[i] = line[i] + recon[i-bpp] — cumsum per lane
            cur = line.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} on scanline {y}")
        out[y] = cur.astype(np.uint8)
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """Spec-conformant PNG decode for 8-bit gray/GA/RGB/RGBA/palette,
    interlace 0: walk chunks, parse IHDR (+PLTE for color type 3),
    inflate the concatenated IDAT stream with stdlib zlib, unfilter
    scanlines, and for palette images look indices up into PLTE.
    16-bit/interlaced images raise (honestly) — rare in training corpora
    and needing only more table-work, not a native codec."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or interlace not in (0, 1) or color not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace} "
            "not supported (8/16-bit gray/GA/RGB/RGBA/palette only)"
        )
    if depth == 16 and color == 3:
        raise ValueError("PNG palette images cannot be 16-bit")
    ch = 1 if color == 3 else _PNG_CHANNELS[color]
    nbytes = depth // 8
    raw = zlib.decompress(bytes(idat))
    if interlace:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the output grid by each pass's start/step geometry
        img = np.zeros((h, w * ch * nbytes), dtype=np.uint8).reshape(h, w, ch * nbytes)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            stride = wp * ch * nbytes
            n = hp * (stride + 1)
            sub = _png_unfilter(raw[pos : pos + n], hp, stride, ch * nbytes)
            pos += n
            img[y0::dy, x0::dx] = sub.reshape(hp, wp, ch * nbytes)
        if pos != len(raw):
            raise ValueError("PNG interlaced pixel data length mismatch")
    else:
        stride = w * ch * nbytes
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        img = _png_unfilter(raw, h, stride, ch * nbytes).reshape(h, w, ch * nbytes)
    if depth == 16:
        # network byte order: take the high byte (the standard 8-bit
        # downconversion every viewer applies)
        img = img.reshape(h, w, ch, 2)[:, :, :, 0]
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        img = plte[img[:, :, 0]]  # index lookup -> HxWx3 RGB
    return img


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# Adam7 interlace passes: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(img: np.ndarray) -> bytes:
    """Filter an (h, w, ch) sub-image into PNG scanlines, cycling filter
    types None/Sub/Up/Average/Paeth by row index so every decoder
    unfilter path is exercised by round-trip data."""
    h, w, ch = img.shape
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        ft = y % 5
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - left) & 0xFF
        elif ft == 2:  # Up
            filt = (cur - prev) & 0xFF
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = (cur - pred) & 0xFF
        lines.append(ft)
        lines += filt.astype(np.uint8).tobytes()
        prev = cur
    return bytes(lines)


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """HxWxC uint8 (C in 1/2/3/4) -> PNG bytes; ``interlace=True`` emits
    Adam7 (each pass an independently filtered sub-image, per spec
    section 8.2). Output stays a fully valid PNG any tool can open."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    img = img.astype(np.uint8)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _png_filter_rows(sub)
        data = bytes(lines)
    else:
        data = _png_filter_rows(img)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(data))
        + _png_chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bit packing, clear/end codes, code width
    grows 3..12 bits as the dictionary fills (GIF89a spec appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader state over the concatenated sub-block data
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return end  # truncated stream: treat as end
        byte0 = bitpos >> 3
        val = int.from_bytes(data[byte0 : byte0 + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset_dict():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset_dict()
    prev: bytes | None = None
    next_code = end + 1
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset_dict()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a first frame -> HxWx3 uint8 RGB: logical screen
    descriptor, global/local color tables, full LZW decompression
    (variable-width codes, clear/end, KwKwK), interlace de-weaving.
    Animated GIFs yield frame 0 (frame iteration belongs to the video
    sampler, not the still decoder)."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                ct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(data), min_code_size, w * h).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                deweave = np.empty_like(idx)
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deweave[order] = idx
                idx = deweave
            return ct[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x} at {pos - 1}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (<= 256 distinct colors) -> single-frame GIF89a with a
    REAL LZW encoder (dictionary growth, clear/end codes, 255-byte
    sub-block framing) — round-trips exercise the decoder's full code
    path, and the output opens in any image viewer."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors (no quantizer here)")
    # palette size = power of two >= max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, bits)
    clear, end = 1 << min_code, (1 << min_code) + 1

    # LZW encode the index stream
    codes: list[tuple[int, int]] = [(clear, min_code + 1)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = end + 1
    width = min_code + 1
    cur = b""
    for v in idx.astype(np.uint8).tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        codes.append((table[cur], width))
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = end + 1
            width = min_code + 1
        cur = bytes([v])
    if cur:
        codes.append((table[cur], width))
    codes.append((end, width))

    # pack LSB-first
    acc = n_bits = 0
    packed = bytearray()
    for code, cwidth in codes:
        acc |= code << n_bits
        n_bits += cwidth
        while n_bits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        packed.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    Every mainstream still-image format decodes for real with no native
    codec: PPM/PGM/BMP (raw), PNG (stdlib zlib inflate + numpy
    unfilter), GIF (pure-Python LZW), and JPEG — baseline AND
    progressive, any integer subsampling (numpy DCT + generic Huffman,
    operators/jpeg.py; arithmetic/12-bit raise with the reason).

    Error contract (fuzz-tested): corrupt/truncated payloads raise
    ValueError (or NotImplementedError for honest format gaps) — never
    IndexError/KeyError/struct.error from parser internals, so a bad
    asset in a 100 TB corpus surfaces as a catchable per-record error,
    not an opaque crash."""
    try:
        return _decode_image_dispatch(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError, zlib.error) as e:
        raise ValueError(
            f"corrupt {sniff_mime(payload)} payload: {type(e).__name__}: {e}"
        ) from e


def _decode_image_dispatch(payload: bytes) -> np.ndarray:
    mime = sniff_mime(payload)
    if mime.startswith("image/x-portable"):
        return _decode_pnm(payload)
    if mime == "image/bmp":
        return _decode_bmp(payload)
    if mime == "image/png":
        return _decode_png(payload)
    if mime == "image/gif":
        return _decode_gif(payload)
    if mime == "image/jpeg":
        from ecommerce_lakehouse_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"not an image payload (sniffed {mime})")


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6) bytes — the re-encode side of a
    decode→transform→encode pipeline."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Pure-numpy bilinear resize (align_corners=False convention, the
    same sampling grid as torchvision/PIL default)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# audio decode
# ---------------------------------------------------------------------------


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> (samples float32 in [-1, 1] shaped
    [n_frames, n_channels], sample_rate). MP3/OGG raise. Same fuzz-tested
    error contract as decode_image: corrupt payloads raise ValueError."""
    try:
        return _decode_audio_dispatch(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(
            f"corrupt audio payload: {type(e).__name__}: {e}"
        ) from e


def _decode_audio_dispatch(payload: bytes) -> tuple[np.ndarray, int]:
    mime = sniff_mime(payload)
    if mime == "audio/mpeg" or mime == "audio/ogg":
        raise NotImplementedError(f"{mime} requires ffmpeg — not available here")
    if mime != "audio/wav":
        raise ValueError(f"not an audio payload (sniffed {mime})")
    # one RIFF parser for every supported format tag: PCM 8/16-bit,
    # G.711 mu-law, IMA ADPCM (operators/audio_codecs.py)
    from ecommerce_lakehouse_spark.operators.audio_codecs import decode_wav_any

    return decode_wav_any(payload)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """[n_frames, n_channels] float32 in [-1, 1] -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Codec-free audio descriptors: duration, RMS energy, zero-crossing
    rate (all computed on the mono mix)."""
    mono = samples.mean(axis=1)
    zc = int(np.count_nonzero(np.diff(np.signbit(mono)))) if len(mono) > 1 else 0
    return {
        "n_frames": int(samples.shape[0]),
        "n_channels": int(samples.shape[1]),
        "sample_rate": int(rate),
        "duration_s": float(samples.shape[0] / rate) if rate else 0.0,
        "rms": float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,
        "zero_crossing_rate": float(zc / max(len(mono) - 1, 1)),
    }


# ---------------------------------------------------------------------------
# video (concatenated-PPM container)
# ---------------------------------------------------------------------------


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream into per-frame payloads — a minimal
    uncompressed 'video' container (what a real deployment does with
    ffmpeg's rawvideo demuxer). Frame boundaries come from each header's
    declared geometry, never from scanning pixel bytes for magic."""
    frames, pos = [], 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame header at offset {pos}")
        # parse this frame's header to learn its pixel-data length
        m = payload[pos:]
        img = _decode_pnm(m)  # validates header
        h, w, c = img.shape
        # header length = bytes before pixel data
        hdr_end = _pnm_data_offset(m)
        frame_len = hdr_end + h * w * c
        frames.append(m[:frame_len])
        pos += frame_len
    return frames


def _pnm_data_offset(payload: bytes) -> int:
    pos, found = 2, 0
    while found < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        while not payload[pos : pos + 1].isspace():
            pos += 1
        found += 1
    return pos + 1
