"""Compressed-audio WAV codecs in pure numpy/stdlib: G.711 mu-law
(wFormatTag 7) and IMA ADPCM (wFormatTag 0x11).

The stdlib ``wave`` module only reads WAVE_FORMAT_PCM, so these parse the
RIFF chunks directly (reusing the walker from operators/avi.py — WAV and
AVI share the RIFF container). Both algorithms are published standards
(ITU-T G.711; IMA ADPCM from the Interactive Multimedia Association
reference, the ubiquitous ``ima4``/dvi format): mu-law is a stateless
per-byte companding curve with an exact closed form — which is what makes
the decode oracle SQL-expressible — while IMA ADPCM carries
predictor/step-index state across samples and is verified by round-trip
tests instead.

MP3/OGG audio SYNTHESIS remains honestly out of scope
(operators/media.py raises for them): psychoacoustic codecs need either
ffmpeg or thousands of lines of spec tables. mu-law + ADPCM cover the
telephony/game/embedded corpus formats that appear in real multimodal
crawls alongside plain PCM. MP3 CONTAINER parsing, though, is pure
header arithmetic and is implemented below (``mp3_stream_features``):
an ISO/IEC 11172-3 frame-header walk — ID3v2 skip, sync scan, bitrate/
sample-rate validation, frame stepping — yielding the duration/bitrate/
frame accounting a crawler indexes audio by without decoding a sample.
"""

from __future__ import annotations

import struct

import numpy as np

from ecommerce_lakehouse_spark.operators.avi import _chunk, _walk

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011

_BIAS = 0x84  # 132
_CLIP = 32635


# --------------------------------------------------------------- G.711 mu-law


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 -> mu-law codeword (uint8), ITU-T G.711 encoding curve."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = position of the highest set bit above bit 7
    exponent = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exponent = np.clip(exponent, 0, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """mu-law codeword (uint8) -> int16. Exact closed form (the one the
    DuckDB oracle mirrors with bit operators):

        u = ~code & 0xFF
        t = (((u & 15) << 3) + 132) << ((u >> 4) & 7)
        pcm = (t - 132) * (-1 if u & 0x80 else +1)
    """
    u = (~code.astype(np.int32)) & 0xFF
    t = (((u & 0x0F) << 3) + _BIAS) << ((u >> 4) & 0x07)
    mag = t - _BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


# --------------------------------------------------------------- IMA ADPCM

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: returns (new_predictor, new_index)."""
    step = int(_IMA_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX_TABLE[nibble])))
    return predictor, index


def ima_adpcm_decode_block(block: bytes) -> np.ndarray:
    """Decode one mono IMA ADPCM block (4-byte header + 4-bit nibbles,
    low nibble first) -> int16 samples including the header sample."""
    predictor, index = struct.unpack_from("<hBx", block, 0)
    index = max(0, min(88, index))
    out = [predictor]
    for byte in block[4:]:
        for nibble in (byte & 0x0F, byte >> 4):
            predictor, index = _ima_step(predictor, index, nibble)
            out.append(predictor)
    return np.array(out, dtype=np.int16)


def ima_adpcm_encode_block(pcm: np.ndarray, index: int = 0) -> bytes:
    """Encode mono int16 samples as one IMA ADPCM block. The first sample
    becomes the block-header predictor; each following sample is coded as
    the 4-bit nibble whose decode lands nearest (standard greedy coder)."""
    predictor = int(pcm[0])
    header = struct.pack("<hBx", predictor, index)
    nibbles = []
    for s in pcm[1:]:
        target = int(s)
        step = int(_IMA_STEP_TABLE[index])
        diff = target - predictor
        nibble = 0
        if diff < 0:
            nibble = 8
            diff = -diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        predictor, index = _ima_step(predictor, index, nibble)
        nibbles.append(nibble)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return header + packed


# --------------------------------------------------------------- WAV framing


def encode_wav_mulaw(pcm: np.ndarray, rate: int) -> bytes:
    """Mono int16 -> mu-law WAV (wFormatTag 7, one byte per sample)."""
    data = mulaw_encode(np.asarray(pcm, dtype=np.int16)).tobytes()
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_MULAW, 1, rate, rate, 1, 8, 0)
    fact = struct.pack("<I", len(data))
    return _chunk(
        b"RIFF",
        b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"fact", fact) + _chunk(b"data", data),
    )


def encode_wav_ima_adpcm(pcm: np.ndarray, rate: int, block_frames: int = 505) -> bytes:
    """Mono int16 -> IMA ADPCM WAV. ``block_frames`` samples per block
    (header sample + nibbles); block_align = 4 + (block_frames-1+1)//2."""
    pcm = np.asarray(pcm, dtype=np.int16)
    nib = block_frames - 1
    block_align = 4 + (nib + 1) // 2
    blocks = []
    for start in range(0, len(pcm), block_frames):
        chunk = pcm[start : start + block_frames]
        blk = ima_adpcm_encode_block(chunk)
        blocks.append(blk.ljust(block_align, b"\x00"))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        1,
        rate,
        rate * block_align // block_frames,
        block_align,
        4,
        2,  # cbSize
        block_frames,  # wSamplesPerBlock
    )
    fact = struct.pack("<I", len(pcm))
    return _chunk(
        b"RIFF",
        b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"fact", fact) + _chunk(b"data", data),
    )


def decode_wav_any(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE parser handling PCM, mu-law, and IMA ADPCM. Returns
    (float32 samples in [-1, 1] shaped [n_frames, n_channels], rate) —
    the same contract as operators/media.py::decode_audio, including the
    fuzz-tested error contract: corrupt payloads raise ValueError."""
    try:
        return _decode_wav_inner(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt WAV payload: {type(e).__name__}: {e}") from e


def _decode_wav_inner(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))
    fmt = None
    data = None
    n_samples = None
    for fourcc, start, size in _walk(payload, 12, end):
        if fourcc == b"fmt ":
            fmt = payload[start : start + size]
        elif fourcc == b"data":
            data = payload[start : start + size]
        elif fourcc == b"fact":
            (n_samples,) = struct.unpack_from("<I", payload, start)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)

    if tag == WAVE_FORMAT_PCM:
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 8:
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend
            arr = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit PCM not supported")
        return arr.reshape(-1, n_ch), rate
    if tag == WAVE_FORMAT_MULAW:
        if n_ch != 1:
            raise NotImplementedError("multi-channel mu-law not supported")
        pcm = mulaw_decode(np.frombuffer(data, dtype=np.uint8))
        if n_samples is not None:
            pcm = pcm[:n_samples]
        return (pcm.astype(np.float32) / 32768.0).reshape(-1, 1), rate
    if tag == WAVE_FORMAT_IMA_ADPCM:
        if n_ch != 1:
            raise NotImplementedError("multi-channel IMA ADPCM not supported")
        out = []
        for start in range(0, len(data), block_align):
            out.append(ima_adpcm_decode_block(data[start : start + block_align]))
        pcm = np.concatenate(out)
        if n_samples is not None:
            pcm = pcm[:n_samples]
        return (pcm.astype(np.float32) / 32768.0).reshape(-1, 1), rate
    raise NotImplementedError(f"WAV format tag 0x{tag:04x} not supported")


# ------------------------------------------------- MPEG-1 Layer III headers

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free format and
# 15 = invalid are both rejected by the walker (ISO/IEC 11172-3 table).
MP3_BITRATES_KBPS = {
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96, 8: 112,
    9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
# sample-rate index for MPEG-1 (index 3 = reserved)
MP3_SAMPLE_RATES = {0: 44100, 1: 48000, 2: 32000}
MP3_SAMPLES_PER_FRAME = 1152


def mp3_frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """MPEG-1 Layer III frame size in bytes: 144 * bitrate / sample_rate
    (+1 padding byte) — 1152 samples/frame over 8 bits/byte = 144."""
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def build_mp3_stream(
    bitrate_indices: list[int],
    rate_idx: int,
    paddings: list[int] | None = None,
    id3_size: int = 0,
    junk: int = 0,
    trailing: int = 0,
) -> bytes:
    """Synthesize a structurally-valid MPEG-1 Layer III stream (headers +
    filler payload, no psychoacoustic audio): optional ID3v2 tag
    (syncsafe size), ``junk`` non-sync lead-in bytes, one frame per
    bitrate index (mono, no CRC), ``trailing`` non-sync tail bytes.
    The frame PAYLOAD is 0x55 filler — this is a header-walk fixture
    generator, not an encoder; the walker never inspects payload."""
    rate = MP3_SAMPLE_RATES[rate_idx]
    out = bytearray()
    if id3_size or junk:
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += b"\x00" * id3_size
        out += b"\x00" * junk
    for j, idx in enumerate(bitrate_indices):
        pad = paddings[j] if paddings is not None else 0
        flen = mp3_frame_length(MP3_BITRATES_KBPS[idx], rate, pad)
        out += bytes([0xFF, 0xFB, (idx << 4) | (rate_idx << 2) | (pad << 1), 0xC0])
        out += b"\x55" * (flen - 4)
    out += b"\xaa" * trailing
    return bytes(out)


def mp3_stream_features(payload: bytes) -> dict:
    """MPEG-1 Layer III frame-header WALK (no audio synthesis — the
    codec itself stays out of scope, see module docstring): skip an
    ID3v2 tag if present (syncsafe size), byte-scan to the first valid
    sync, then step frame-to-frame by the computed frame length,
    validating every header (MPEG-1, Layer III, bitrate index 1-14,
    sample-rate index 0-2, rate consistent with the first frame) and
    resynchronizing on anything invalid. A frame counts only if it fits
    entirely in the buffer — truncated tails are ignored, so the walk
    is total on arbitrary bytes (fuzz-tested).

    Returns the stream accounting a crawler indexes media by:
    frame/byte counts, sample rate, exact duration, bitrate sum +
    distinct count (CBR/VBR detection), channel mode, lead-in bytes."""
    n = len(payload)
    pos = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = (
            ((payload[6] & 0x7F) << 21)
            | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7)
            | (payload[9] & 0x7F)
        )
        pos = min(10 + size, n)
    frames = 0
    br_sum = 0
    br_seen: set[int] = set()
    rate = 0
    mode = -1
    lead_in = -1
    stream_bytes = 0
    while pos + 4 <= n:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            version = (b1 >> 3) & 3
            layer = (b1 >> 1) & 3
            bridx = (b2 >> 4) & 15
            sridx = (b2 >> 2) & 3
            pad = (b2 >> 1) & 1
            if version == 3 and layer == 1 and 1 <= bridx <= 14 and sridx < 3:
                sr = MP3_SAMPLE_RATES[sridx]
                if rate == 0 or sr == rate:
                    flen = mp3_frame_length(MP3_BITRATES_KBPS[bridx], sr, pad)
                    if pos + flen <= n:
                        if rate == 0:
                            rate = sr
                            mode = (b3 >> 6) & 3
                            lead_in = pos
                        frames += 1
                        br_sum += MP3_BITRATES_KBPS[bridx]
                        br_seen.add(bridx)
                        stream_bytes += flen
                        pos += flen
                        continue
        pos += 1  # resync scan
    return {
        "n_frames": frames,
        "sample_rate": rate,
        "duration_s": (frames * MP3_SAMPLES_PER_FRAME) / rate if rate else 0.0,
        "bitrate_kbps_sum": br_sum,
        "n_distinct_bitrates": len(br_seen),
        "is_vbr": len(br_seen) > 1,
        "channel_mode": mode,
        "lead_in_bytes": lead_in,
        "stream_bytes": stream_bytes,
    }


# ------------------------------------------------------- Ogg page container

# Ogg CRC32: polynomial 0x04c11db7, init 0, not reflected, no final xor
# (RFC 3533 §6) — NOT the zlib/binascii CRC (which is reflected).
_OGG_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _OGG_CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


def build_ogg_page(
    serial: int,
    seq: int,
    granule: int,
    lacing: list[int],
    header_type: int = 0,
) -> bytes:
    """One RFC 3533 Ogg page: 27-byte header + segment table + payload
    (deterministic 0x11 filler sized by the lacing values), with the
    REAL Ogg CRC computed over the whole page (CRC field zeroed)."""
    head = bytearray(b"OggS")
    head += bytes([0, header_type])
    head += granule.to_bytes(8, "little")
    head += serial.to_bytes(4, "little")
    head += seq.to_bytes(4, "little")
    head += b"\x00\x00\x00\x00"  # CRC placeholder
    head += bytes([len(lacing)])
    head += bytes(lacing)
    payload = b"\x11" * sum(lacing)
    page = bytes(head) + payload
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def ogg_stream_features(payload: bytes) -> dict:
    """RFC 3533 Ogg page WALK (container accounting, no codec decode):
    scan for the ``OggS`` capture pattern, validate version 0, CHECK THE
    PAGE CRC (poly 0x04c11db7 over the page with a zeroed CRC field —
    a corrupted page never counts), step page-to-page by the computed
    length, resync on anything invalid. Total on arbitrary bytes.

    Returns: page/packet/byte counts, last granule position, BOS/EOS
    flags, continued-lacing count, and the first stream serial (pages
    of other serials are skipped — single-stream accounting, like the
    MP3 walker's rate-consistency rule)."""
    n = len(payload)
    pos = 0
    pages = 0
    packets = 0
    continued = 0
    stream_bytes = 0
    last_granule = 0
    serial = None
    bos = False
    eos = False
    while pos + 27 <= n:
        if payload[pos : pos + 4] == b"OggS" and payload[pos + 4] == 0:
            nsegs = payload[pos + 26]
            hlen = 27 + nsegs
            if pos + hlen <= n:
                lacing = payload[pos + 27 : pos + hlen]
                plen = hlen + sum(lacing)
                if pos + plen <= n:
                    page = payload[pos : pos + plen]
                    stored = int.from_bytes(page[22:26], "little")
                    if ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) == stored:
                        sid = int.from_bytes(page[14:18], "little")
                        if serial is None:
                            serial = sid
                        if sid == serial:
                            htype = page[5]
                            pages += 1
                            bos = bos or bool(htype & 0x02)
                            eos = eos or bool(htype & 0x04)
                            packets += sum(1 for v in lacing if v < 255)
                            continued += sum(1 for v in lacing if v == 255)
                            last_granule = int.from_bytes(
                                page[6:14], "little", signed=True
                            )
                            stream_bytes += plen
                        pos += plen
                        continue
        pos += 1  # resync scan
    return {
        "n_pages": pages,
        "n_packets": packets,
        "n_continued": continued,
        "stream_bytes": stream_bytes,
        "last_granule": last_granule,
        "serial": serial if serial is not None else -1,
        "bos_seen": bos,
        "eos_seen": eos,
    }
