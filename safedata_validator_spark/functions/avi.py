"""Pure-stdlib AVI (RIFF) container parser — the MJPEG video branch for
``multimodal.decode_frames``.

AVI is the one mainstream *video* container whose frame payloads this
repo can decode without external libraries: an MJPEG AVI is RIFF chunk
framing (``struct``-parseable) around per-frame baseline JPEG streams,
which ``functions.jpeg`` already decodes.  Together with ``functions.gif``
this gives ``sample_frames(codec='real')`` two genuinely decodable video
containers in any environment; mp4/webm still need ffmpeg and raise
through the same one-function seam.

Layout handled (OpenDML extensions ignored, single video stream):

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf ...) ...)
                LIST('movi' 00dc|00db ...) [idx1])

Frame timing comes from the video stream header's ``dwScale``/``dwRate``
pair (fps = rate/scale); timestamps are ``i * 1000 * scale // rate`` ms —
integer arithmetic, so container parsing is exactly reproducible by an
arithmetic oracle.  ``encode_avi`` writes the same minimal layout for
fixtures and round-trip tests.

Reference parity note: the reference validator (safedata_validator) has no
media handling at all — this module belongs to the engine's multimodal
extension surface (SURVEY.md §2.10), not to reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["AVIError", "is_avi", "avi_meta", "avi_frames", "encode_avi", "decode_avi"]


class AVIError(ValueError):
    pass


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _u32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise AVIError("truncated dword")
    return struct.unpack_from("<I", data, pos)[0]


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for each chunk in [start, end).
    Chunk bodies pad to even length per RIFF."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        length = _u32(data, pos + 4)
        body = pos + 8
        if body + length > end:
            raise AVIError(f"truncated chunk {tag!r}")
        yield tag, body, length
        pos = body + length + (length & 1)
    if pos != end:
        raise AVIError("trailing bytes inside list")


def avi_meta(data: bytes) -> dict:
    """Parse headers only: width/height, fps scale/rate, frame count."""
    if not is_avi(data):
        raise AVIError("not a RIFF/AVI signature")
    riff_len = _u32(data, 4)
    end = min(8 + riff_len, len(data))
    meta: dict = {}
    for tag, body, length in _chunks(data, 12, end):
        if tag != b"LIST" or data[body : body + 4] != b"hdrl":
            continue
        for t2, b2, l2 in _chunks(data, body + 4, body + length):
            if t2 == b"avih":
                if l2 < 40:
                    raise AVIError("short avih")
                meta["total_frames"] = _u32(data, b2 + 16)
                meta["width"] = _u32(data, b2 + 32)
                meta["height"] = _u32(data, b2 + 36)
            elif t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                fcc_type = fcc_handler = None
                scale = rate = None
                for t3, b3, l3 in _chunks(data, b2 + 4, b2 + l2):
                    if t3 == b"strh":
                        if l3 < 40:
                            raise AVIError("short strh")
                        fcc_type = data[b3 : b3 + 4]
                        fcc_handler = data[b3 + 4 : b3 + 8]
                        scale = _u32(data, b3 + 20)
                        rate = _u32(data, b3 + 24)
                if fcc_type == b"vids" and "scale" not in meta:
                    meta["scale"] = scale or 1
                    meta["rate"] = rate or 25
                    meta["handler"] = (fcc_handler or b"").decode("ascii", "replace")
    if "scale" not in meta:
        raise AVIError("no video stream header (strl/strh vids)")
    return meta


def avi_frames(data: bytes) -> tuple[dict, list[tuple[int, bytes]]]:
    """Parse the container: return (meta, [(t_ms, frame_bytes), ...]) for
    the FIRST video stream (chunk ids ``00dc``/``00db``).  ``frame_bytes``
    are the raw codec payloads (JPEG streams for MJPEG); decoding them is
    the codec's business, not the container's."""
    meta = avi_meta(data)
    riff_len = _u32(data, 4)
    end = min(8 + riff_len, len(data))
    frames: list[tuple[int, bytes]] = []
    scale, rate = meta["scale"], meta["rate"]
    for tag, body, length in _chunks(data, 12, end):
        if tag != b"LIST" or data[body : body + 4] != b"movi":
            continue
        i = 0
        for t2, b2, l2 in _chunks(data, body + 4, body + length):
            if t2 in (b"00dc", b"00db"):
                t_ms = i * 1000 * scale // rate
                frames.append((t_ms, bytes(data[b2 : b2 + l2])))
                i += 1
    if not frames:
        raise AVIError("no video frames (movi list empty or missing)")
    return meta, frames


def decode_avi(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode an MJPEG AVI to ``[(t_ms, HxWx3 uint8 frame), ...]`` using the
    built-in baseline JPEG codec."""
    from safedata_validator_spark.functions import jpeg as _jpeg

    meta, raw = avi_frames(data)
    out = []
    for t_ms, payload in raw:
        if not _jpeg.is_jpeg(payload):
            raise AVIError(
                f"frame codec {meta.get('handler', '?')!r} is not MJPEG "
                "(frame payload lacks a JPEG signature)"
            )
        out.append((t_ms, np.ascontiguousarray(_jpeg.to_rgb(_jpeg.decode_jpeg(payload)))))
    return out


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Write a minimal single-stream MJPEG AVI around pre-encoded JPEG
    frame payloads (fixtures / round-trip tests; dwScale=1, dwRate=fps)."""
    if not frames:
        raise AVIError("no frames to encode")
    if fps <= 0:
        raise AVIError("fps must be positive")
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_len * fps,     # dwMaxBytesPerSec (upper bound)
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1, max_len, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_len, 0xFFFFFFFF, 0, 0, 0, width & 0xFFFF, height & 0xFFFF)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: offsets are relative to the start of the movi list's body fourcc
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
