"""Pure-stdlib WAV/PCM codec — the built-in AUDIO branch of the multimodal
operators, closing the same environment gap ``functions.png`` /
``functions.jpeg`` closed for images: audio payloads decode for REAL in
this container instead of being environment-gated on torchaudio/soundfile.

WAV (RIFF/WAVE, the canonical uncompressed interchange format) is
stdlib-decodable: the container is plain ``struct`` framing and the sample
data is raw PCM that numpy reinterprets in one ``frombuffer`` call — no
entropy coding at all.  Supported on decode: PCM integer 8 (unsigned) /
16 / 24 / 32-bit, IEEE float 32/64 (format tags 1 and 3, plus
WAVE_FORMAT_EXTENSIBLE wrapping either), any channel count, any sample
rate.  ``encode_wav`` writes 8/16/24/32-bit PCM and float32 for fixtures
and round-trip tests.

The feature math (``audio_features``) is vectorized numpy over the whole
clip: RMS / peak on the [-1, 1]-normalized signal, zero-crossing count on
channel 0, spectral centroid via one rfft.  It runs inside Arrow-batched
``mapInPandas`` stages (see ``multimodal.extract_audio_features``); per-row
cost is one memcpy-shaped decode + a few numpy passes.  A 100-TB audio
corpus would swap a SIMD resampler/codec into the same one-function seam —
the Spark-side plan (partition-preserving mapInPandas, typed schema) is
already the production shape.

Reference parity note: the reference validator (safedata_validator) has no
audio handling at all — this module is part of the training-data-pipeline
extension surface, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

#: format tags we understand (WAVE_FORMAT_EXTENSIBLE unwraps to one of these)
_PCM, _FLOAT, _EXTENSIBLE = 1, 3, 0xFFFE


class WAVError(ValueError):
    """Malformed or unsupported WAV payload."""


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _chunks(data: bytes):
    """Yield (tag, body) over the RIFF chunk sequence (word-aligned)."""
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise WAVError(f"truncated {tag!r} chunk")
        yield tag, body
        pos += 8 + length + (length & 1)  # chunks are 2-byte aligned


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a WAV payload → ``(sample_rate, samples)`` with ``samples``
    float64 of shape (n_frames, n_channels), normalized to [-1, 1]:

    * 8-bit PCM is unsigned → ``(x - 128) / 128``
    * 16/24/32-bit PCM are signed little-endian → ``x / 2^(bits-1)``
    * float32/float64 pass through unscaled (already nominal [-1, 1])

    Raises :class:`WAVError` on framing errors or unsupported encodings
    (e.g. ADPCM / mu-law, which are compression formats out of scope for
    the built-in codec)."""
    if not is_wav(payload or b""):
        raise WAVError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for tag, body in _chunks(payload):
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
            if fmt is not None:
                break
    if fmt is None or len(fmt) < 16:
        raise WAVError("missing fmt chunk")
    if data is None:
        raise WAVError("missing data chunk")
    tag_, channels, rate, _byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag_ == _EXTENSIBLE:
        # first 2 bytes of the 16-byte SubFormat GUID carry the real tag
        if len(fmt) < 26:
            raise WAVError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (tag_,) = struct.unpack("<H", fmt[24:26])
    if channels < 1 or rate < 1:
        raise WAVError(f"bad fmt: channels={channels} rate={rate}")
    if tag_ == _PCM:
        if bits == 8:
            raw = np.frombuffer(data, dtype=np.uint8)
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
            samples = raw.astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
            b = b.reshape(-1, 3).astype(np.uint32)
            u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            signed = u.astype(np.int32)
            signed[signed >= 1 << 23] -= 1 << 24
            samples = signed.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
            samples = raw.astype(np.float64) / float(1 << 31)
        else:
            raise WAVError(f"unsupported PCM bit depth {bits}")
    elif tag_ == _FLOAT:
        if bits == 32:
            samples = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(
                np.float64
            )
        elif bits == 64:
            samples = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8").astype(
                np.float64
            )
        else:
            raise WAVError(f"unsupported float bit depth {bits}")
    else:
        raise WAVError(
            f"unsupported format tag {tag_} (compressed WAV is out of scope "
            "for the built-in codec)"
        )
    n_frames = len(samples) // channels
    return rate, samples[: n_frames * channels].reshape(n_frames, channels)


def encode_wav(
    samples: np.ndarray, rate: int, bits: int = 16
) -> bytes:
    """Encode samples → WAV bytes for fixtures and round-trip tests.

    ``samples``: int array (interpreted as raw sample values at the target
    depth — 8-bit expects unsigned 0..255, wider depths signed) or float
    array in [-1, 1] when ``bits`` is 32 with a float dtype input.  Shape
    (n,) for mono or (n_frames, n_channels)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    is_float = np.issubdtype(arr.dtype, np.floating)
    if is_float:
        if bits != 32:
            raise WAVError("float encode supports bits=32 only")
        tag_, data = _FLOAT, arr.astype("<f4").tobytes()
    elif bits == 8:
        tag_, data = _PCM, arr.astype(np.uint8).tobytes()
    elif bits == 16:
        tag_, data = _PCM, arr.astype("<i2").tobytes()
    elif bits == 24:
        tag_ = _PCM
        i = arr.astype(np.int32)
        u = np.where(i < 0, i + (1 << 24), i).astype(np.uint32)
        b = np.empty((u.size, 3), dtype=np.uint8)
        flat = u.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
    elif bits == 32:
        tag_, data = _PCM, arr.astype("<i4").tobytes()
    else:
        raise WAVError(f"unsupported encode bit depth {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag_, channels, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(rate: int, samples: np.ndarray) -> dict:
    """Clip-level features over normalized (n_frames, n_channels) samples:

    * ``rms`` / ``peak`` — over ALL channels;
    * ``zero_crossings`` — strict sign flips on channel 0 (zeros break a
      run: +,0,+ is no crossing, +,0,- crosses once at the 0→- step);
    * ``spectral_centroid_hz`` — amplitude-weighted mean frequency of the
      channel-0 rfft magnitude spectrum (0.0 for silent clips).

    All values are plain Python floats/ints so the dict drops straight into
    an Arrow batch column."""
    n_frames, _ = samples.shape
    dur_ms = int(round(n_frames * 1000.0 / rate)) if rate else 0
    if n_frames == 0:
        return {
            "n_frames": 0, "duration_ms": 0, "rms": 0.0, "peak": 0.0,
            "zero_crossings": 0, "spectral_centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(samples * samples)))
    peak = float(np.max(np.abs(samples)))
    ch0 = samples[:, 0]
    signs = np.sign(ch0)
    nz = signs[signs != 0]
    crossings = int(np.count_nonzero(np.diff(nz))) if nz.size > 1 else 0
    mag = np.abs(np.fft.rfft(ch0))
    total = float(mag.sum())
    if total > 0.0:
        freqs = np.fft.rfftfreq(n_frames, d=1.0 / rate)
        centroid = float((freqs * mag).sum() / total)
    else:
        centroid = 0.0
    return {
        "n_frames": int(n_frames),
        "duration_ms": dur_ms,
        "rms": rms,
        "peak": peak,
        "zero_crossings": crossings,
        "spectral_centroid_hz": centroid,
    }
