"""Minimal RIFF AVI container codec (MJPEG), pure stdlib.

Closes the video modality for real: the reference lakehouse has no media
pipeline, and this repo's video path previously used a concatenated-PPM
stand-in container. AVI is the simplest real-world container whose frames
are independently-decodable stills (Motion JPEG), which composes with the
pure-numpy baseline JPEG codec (operators/jpeg.py) into an end-to-end
video decode with no native library.

Writer emits a spec-shaped file (RIFF/AVI LIST hdrl with avih+strl,
LIST movi with 00dc chunks, idx1 index); the reader is a general RIFF
chunk walker that tolerates unknown chunks, optional idx1, and both
``00dc``/``00db`` frame ids — so real MJPEG files with the standard
layout parse too, not only our own output. Out-of-scope features
(multiple streams, audio interleave, OpenDML extensions) raise with the
reason rather than mis-parsing.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + size + payload, word-aligned (pad byte is not
    counted in the declared size)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack independently-encoded JPEG frames into an AVI (MJPEG vids
    stream): LIST hdrl (avih + strl{strh,strf}), LIST movi (00dc chunks),
    idx1. Offsets in idx1 are relative to the 'movi' fourcc per the
    original AVI convention."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    usec_per_frame = 1_000_000 // fps
    max_frame = max(len(f) for f in frames)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame,
            max_frame * fps,  # dwMaxBytesPerSec (upper bound)
            0,  # dwPaddingGranularity
            _AVIF_HASINDEX,
            len(frames),
            0,  # dwInitialFrames
            1,  # dwStreams
            max_frame,
            width,
            height,
            0, 0, 0, 0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate -> fps
            0,  # dwStart
            len(frames),
            max_frame,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable, one frame per chunk)
            0, 0, width, height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            width * height * 3,  # biSizeImage (decoded bound)
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = b"movi"
    idx_entries = []
    for f in frames:
        # offset of this chunk's fourcc relative to the 'movi' fourcc
        idx_entries.append((len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)

    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    buf[pos:end], honoring word alignment."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError(f"truncated AVI chunk {fourcc!r} at {pos}")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def decode_avi(payload: bytes) -> tuple[list[bytes], dict]:
    """Extract the stream-0 video frames and container metadata from an
    AVI. Returns (frames, meta) where frames are the raw per-frame
    payloads (JPEG bytes for MJPEG) and meta carries width/height/
    n_frames/fps/handler from the headers.

    Same fuzz-tested error contract as the other decoders: corrupt
    payloads raise ValueError, never parser-internal exceptions."""
    try:
        return _decode_avi_inner(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt AVI payload: {type(e).__name__}: {e}") from e


def _decode_avi_inner(payload: bytes) -> tuple[list[bytes], dict]:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    meta: dict = {}
    frames: list[bytes] = []
    for fourcc, start, size in _walk(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[start : start + 4]
        if list_type == b"hdrl":
            _parse_hdrl(payload, start + 4, start + size, meta)
        elif list_type == b"movi":
            for cid, cstart, csize in _walk(payload, start + 4, start + size):
                # 'NNdc' compressed / 'NNdb' uncompressed frame of stream NN
                if cid[2:4] in (b"dc", b"db"):
                    if cid[:2] != b"00":
                        raise ValueError(
                            f"multi-stream AVI not supported (chunk {cid!r})"
                        )
                    frames.append(payload[cstart : cstart + csize])
    if meta.get("n_streams", 1) != 1:
        raise ValueError(f"only single-stream AVI supported, got {meta['n_streams']}")
    meta.setdefault("n_frames", len(frames))
    return frames, meta


def _parse_hdrl(buf: bytes, pos: int, end: int, meta: dict) -> None:
    for fourcc, start, size in _walk(buf, pos, end):
        if fourcc == b"avih":
            (usec, _, _, _, total, _, streams, _, w, h) = struct.unpack_from(
                "<10I", buf, start
            )
            meta.update(
                width=w,
                height=h,
                n_frames=total,
                n_streams=streams,
                fps=round(1_000_000 / usec) if usec else None,
            )
        elif fourcc == b"LIST" and buf[start : start + 4] == b"strl":
            for cid, cstart, csize in _walk(buf, start + 4, start + size):
                if cid == b"strh":
                    meta["stream_type"] = buf[cstart : cstart + 4].decode("ascii")
                    meta["handler"] = buf[cstart + 4 : cstart + 8].decode("ascii")
