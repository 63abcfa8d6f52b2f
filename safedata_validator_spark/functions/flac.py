"""Built-in FLAC codec — pure stdlib + numpy, no audio libraries.

First-principles implementation of the PUBLIC format (xiph.org FLAC
specification / RFC 9639): the encoder writes fixed-blocksize streams with
CONSTANT / VERBATIM / FIXED-predictor subframes (orders 0-4, i.e. the
successive-difference predictors) and single-partition rice-coded
residuals with optimal parameter selection; the decoder additionally reads
LPC subframes, all four channel assignments (independent, left/side,
right/side, mid/side), wasted-bits shifts, multi-partition residuals with
both 4- and 5-bit rice parameters and raw-escape partitions, and verifies
the frame CRC-8/CRC-16 and the STREAMINFO MD5 of the decoded stream.

Like ``functions.wav``, this exists so the multimodal pipeline decodes
audio FOR REAL everywhere: external decoders (when installed) are parity
oracles, not dependencies. Entropy coding is per-sample Python inside a
frame, but all predictor math (residual = n-th difference on encode,
cumulative-sum restoration on decode) is vectorized numpy over whole
subframes.

Reference parity note: the reference repo contains no media handling —
this is engine-addition surface for the LLM-data pipeline (SURVEY.md
§2.10 multimodal).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FLACError(ValueError):
    """Malformed or unsupported FLAC payload."""


def is_flac(payload: bytes) -> bool:
    return len(payload) >= 4 and payload[:4] == b"fLaC"


# --------------------------------------------------------------------------
# CRCs (polynomials from the spec: CRC-8 x^8+x^2+x+1, CRC-16 x^16+x^15+x^2+1)
# --------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        tbl.append(crc & mask)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TBL[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TBL[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --------------------------------------------------------------------------
# bit I/O (MSB-first, as everywhere in FLAC)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self._acc = (self._acc << n) | (v & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self.buf.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte offset of the next unread byte
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise FLACError("truncated FLAC frame")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self._n == 0:
                if self.pos >= len(self.data):
                    raise FLACError("truncated FLAC frame")
                self._acc = self.data[self.pos]
                self.pos += 1
                self._n = 8
            chunk = self._acc & ((1 << self._n) - 1)
            if chunk == 0:
                q += self._n
                self._n = 0
                self._acc = 0
                continue
            top = chunk.bit_length()
            q += self._n - top
            self._n = top - 1
            self._acc = chunk & ((1 << self._n) - 1)
            return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample number field)
# --------------------------------------------------------------------------


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead_mask | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            break
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise FLACError("invalid coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.bits(8)
        if b & 0xC0 != 0x80:
            raise FLACError("invalid coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------------------------
# fixed predictors: residual = order-th difference; restore = cumulative sums
# --------------------------------------------------------------------------


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    return np.diff(s, n=order) if order else s.copy()


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    out = np.empty(order + len(res), dtype=np.int64)
    out[:order] = warmup
    if order == 0:
        out[:] = res
        return out
    # integrate the order-th differences back up through each level
    level = res.astype(np.int64)
    for k in range(order, 0, -1):
        # starting value of the (k-1)-th difference at index (order-1)
        d0 = np.diff(warmup, n=k - 1)[-1] if k > 1 else warmup[-1]
        level = d0 + np.cumsum(level)
    out[order:] = level
    return out


# --------------------------------------------------------------------------
# rice coding
# --------------------------------------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return (r << 1) ^ (r >> 63)


def _best_rice_param(u: np.ndarray, max_param: int = 14) -> tuple[int, int]:
    """(param, total bits) minimizing sum(u >> p) + n * (p + 1)."""
    n = len(u)
    best_p, best_c = 0, None
    tot = int(u.sum())
    for p in range(max_param + 1):
        cost = int((u >> p).sum()) + n * (p + 1)
        best_p, best_c = (p, cost) if best_c is None or cost < best_c else (best_p, best_c)
        if tot >> p == 0 and p > 0:
            break
    return best_p, best_c


def _write_rice(bw: _BitWriter, u: np.ndarray, p: int) -> None:
    for v in u.tolist():
        bw.write_unary(v >> p)
        bw.write(v & ((1 << p) - 1), p)


def _read_rice_partition(br: _BitReader, n: int, p: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        u = (br.unary() << p) | br.bits(p)
        out[i] = (u >> 1) ^ -(u & 1)
    return out


def _read_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise FLACError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if block_size % nparts or (block_size >> porder) <= order:
        raise FLACError("invalid rice partition order")
    out: list[np.ndarray] = []
    for part in range(nparts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        p = br.bits(pbits)
        if p == escape:
            raw = br.bits(5)
            vals = np.empty(n, dtype=np.int64)
            for i in range(n):
                vals[i] = br.signed(raw) if raw else 0
            out.append(vals)
        else:
            out.append(_read_rice_partition(br, n, p))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bits: int) -> None:
    n = len(s)
    if n and (s == s[0]).all():
        bw.write(0, 1)          # pad
        bw.write(0, 6)          # CONSTANT
        bw.write(0, 1)          # no wasted bits
        bw.write_signed(int(s[0]), bits)
        return
    # pick the fixed order with the cheapest rice-coded residual
    best = None  # (total_bits, order, res, param)
    for order in range(0, min(4, n - 1) + 1):
        res = _fixed_residual(s, order)
        u = _zigzag(res)
        p, cost = _best_rice_param(u)
        total = order * bits + 6 + cost  # warmup + partition header + body
        if best is None or total < best[0]:
            best = (total, order, res, p)
    assert best is not None
    total, order, res, p = best
    if total >= n * bits:  # entropy coding loses: VERBATIM
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s.tolist():
            bw.write_signed(int(v), bits)
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)   # FIXED, order 0-4
    bw.write(0, 1)                  # no wasted bits
    for v in s[:order].tolist():    # warmup
        bw.write_signed(int(v), bits)
    bw.write(0, 2)                  # 4-bit rice parameters
    bw.write(0, 4)                  # partition order 0
    u = _zigzag(res)
    if int(u.max(initial=0)).bit_length() > 30:  # quotients would blow up
        bw.write(0xF, 4)            # escape: raw residuals
        raw = max(1, int(np.abs(res).max(initial=0)).bit_length() + 1)
        bw.write(min(raw, 31), 5)
        for v in res.tolist():
            bw.write_signed(int(v), min(raw, 31))
        return
    bw.write(p, 4)
    _write_rice(bw, u, p)


def encode_flac(
    samples: np.ndarray, rate: int, bits: int = 16, block_size: int = 4096
) -> bytes:
    """Encode signed integer samples → FLAC bytes (lossless).

    ``samples``: int array of shape (n,) mono or (n_frames, n_channels),
    values in [-2^(bits-1), 2^(bits-1)) at depth ``bits`` ∈
    {8, 12, 16, 20, 24}. Fixed-blocksize stream, independent channels,
    CONSTANT / FIXED(0-4) / VERBATIM subframes with optimal single-partition
    rice residuals — decodes to the identical integers."""
    arr = np.asarray(samples)
    if np.issubdtype(arr.dtype, np.floating):
        raise FLACError("encode_flac expects integer samples")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise FLACError("samples must be (n,) or (n_frames, n_channels)")
    n, ch = arr.shape
    if not 1 <= ch <= 8:
        raise FLACError(f"unsupported channel count {ch}")
    if bits not in _SAMPLE_SIZE_CODES:
        raise FLACError(f"unsupported bit depth {bits}")
    if rate < 1 or rate >= (1 << 20):
        raise FLACError(f"unsupported sample rate {rate}")
    arr = arr.astype(np.int64)
    lim = 1 << (bits - 1)
    if n and (arr.min() < -lim or arr.max() >= lim):
        raise FLACError(f"samples exceed {bits}-bit range")

    # MD5 over interleaved little-endian samples at bits/8... except
    # 12/20-bit depths hash ceil(bits/8)-byte samples per the spec
    nbytes = (bits + 7) // 8
    inter = arr.reshape(-1)
    if nbytes == 1:
        md5_input = (inter & 0xFF).astype(np.uint8).tobytes()
    elif nbytes == 2:
        md5_input = inter.astype("<i2").tobytes()
    else:
        u = np.where(inter < 0, inter + (1 << 24), inter).astype(np.uint32)
        b3 = np.empty((u.size, 3), dtype=np.uint8)
        b3[:, 0] = u & 0xFF
        b3[:, 1] = (u >> 8) & 0xFF
        b3[:, 2] = (u >> 16) & 0xFF
        md5_input = b3.tobytes()
    md5 = hashlib.md5(md5_input).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last metadata block): 34-byte body
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.buf) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    sample_size_code = _SAMPLE_SIZE_CODES[bits]
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = arr[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)   # reserved
        hdr.write(0, 1)   # fixed blocksize strategy
        bs_code = 0b0110 if bs <= 256 else 0b0111
        hdr.write(bs_code, 4)
        hdr.write(0, 4)   # sample rate from STREAMINFO
        hdr.write(ch - 1, 4)  # independent channels
        hdr.write(sample_size_code, 3)
        hdr.write(0, 1)   # reserved
        hdr.align()
        hdr.buf += _utf8_encode(frame_no)
        if bs_code == 0b0110:
            hdr.buf.append(bs - 1)
        else:
            hdr.buf += struct.pack(">H", bs - 1)
        hdr.buf.append(_crc8(bytes(hdr.buf)))
        fw = _BitWriter()
        fw.buf += hdr.buf
        for c in range(ch):
            _encode_subframe(fw, blk[:, c], bits)
        fw.align()
        fw.buf += struct.pack(">H", _crc16(bytes(fw.buf)))
        out += fw.buf
        frame_no += 1
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_subframe(br: _BitReader, bs: int, bits: int) -> np.ndarray:
    if br.bits(1):
        raise FLACError("subframe padding bit set")
    ftype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    eff = bits - wasted
    if eff < 1:
        raise FLACError("wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        out = np.full(bs, br.signed(eff), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.empty(bs, dtype=np.int64)
        for i in range(bs):
            out[i] = br.signed(eff)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        if order > bs:
            raise FLACError("fixed order exceeds block size")
        warmup = np.array([br.signed(eff) for _ in range(order)], dtype=np.int64)
        res = _read_residual(br, bs, order)
        out = _restore_fixed(warmup, res, order)
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 31) + 1
        if order > bs:
            raise FLACError("LPC order exceeds block size")
        warmup = [br.signed(eff) for _ in range(order)]
        prec = br.bits(4) + 1
        if prec == 16:
            raise FLACError("invalid LPC precision")
        shift = br.bits(5)
        if shift >= 16:  # the 5-bit field is signed; negatives are invalid
            raise FLACError("negative LPC shift")
        coefs = [br.signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warmup
        o = out  # per-sample recurrence (data-dependent, cannot vectorize)
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(o[i - 1 - j])
            o[i] = int(res[i - order]) + (acc >> shift)
    else:
        raise FLACError(f"reserved subframe type {ftype}")
    return out << wasted if wasted else out


def decode_flac_int(payload: bytes) -> tuple[int, np.ndarray, int]:
    """Decode FLAC → ``(sample_rate, int64 samples (n_frames, n_channels),
    bits)``. Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5."""
    if not is_flac(payload or b""):
        raise FLACError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise FLACError("truncated metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise FLACError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise FLACError("invalid metadata block type 127")
        pos += 4 + blen
    if streaminfo is None or len(streaminfo) != 34:
        raise FLACError("missing or malformed STREAMINFO")
    si = _BitReader(streaminfo)
    si.bits(16)  # min block size
    si.bits(16)  # max block size
    si.bits(24)
    si.bits(24)
    rate = si.bits(20)
    ch = si.bits(3) + 1
    bits = si.bits(5) + 1
    total = si.bits(36)
    md5_expect = streaminfo[18:34]
    if rate < 1:
        raise FLACError("invalid sample rate in STREAMINFO")

    chunks: list[np.ndarray] = []
    decoded = 0
    while pos < len(payload) and (total == 0 or decoded < total):
        hdr_start = pos
        br = _BitReader(payload, pos)
        sync = br.bits(14)
        if sync != 0b11111111111110:
            raise FLACError("lost frame sync")
        if br.bits(1):
            raise FLACError("reserved frame header bit set")
        br.bits(1)  # blocking strategy (number field semantics only)
        bs_code = br.bits(4)
        rate_code = br.bits(4)
        chan_code = br.bits(4)
        size_code = br.bits(3)
        if br.bits(1):
            raise FLACError("reserved frame header bit set")
        _utf8_decode(br)
        if bs_code == 0:
            raise FLACError("reserved block size code")
        elif bs_code == 6:
            bs = br.bits(8) + 1
        elif bs_code == 7:
            bs = br.bits(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if rate_code == 12:
            br.bits(8)
        elif rate_code in (13, 14):
            br.bits(16)
        elif rate_code == 15:
            raise FLACError("invalid sample rate code")
        elif rate_code != 0 and rate_code not in _RATES:
            raise FLACError("reserved sample rate code")
        crc8_got = br.bits(8)
        if _crc8(payload[hdr_start : br.pos - 1]) != crc8_got:
            raise FLACError("frame header CRC-8 mismatch")
        fbits = bits if size_code == 0 else _SAMPLE_SIZES.get(size_code)
        if fbits is None:
            raise FLACError("reserved sample size code")
        if chan_code < 8:
            nch = chan_code + 1
            if nch != ch:
                raise FLACError("frame channel count differs from STREAMINFO")
            subs = [_decode_subframe(br, bs, fbits) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if ch != 2:
                raise FLACError("stereo decorrelation in non-stereo stream")
            # the difference (side) channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _decode_subframe(br, bs, fbits)
                side = _decode_subframe(br, bs, fbits + 1)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(br, bs, fbits + 1)
                right = _decode_subframe(br, bs, fbits)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(br, bs, fbits)
                side = _decode_subframe(br, bs, fbits + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise FLACError("reserved channel assignment")
        br.align()
        frame_end = br.pos
        if frame_end + 2 > len(payload):
            raise FLACError("truncated frame CRC-16")
        (crc16_got,) = struct.unpack(">H", payload[frame_end : frame_end + 2])
        if _crc16(payload[hdr_start:frame_end]) != crc16_got:
            raise FLACError("frame CRC-16 mismatch")
        pos = frame_end + 2
        chunks.append(np.stack(subs, axis=1))
        decoded += bs
    if total and decoded < total:
        raise FLACError("stream ends before STREAMINFO total samples")
    samples = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.empty((0, ch), dtype=np.int64)
    )
    if total:
        samples = samples[:total]
    if md5_expect != b"\x00" * 16:
        nbytes = (bits + 7) // 8
        inter = samples.reshape(-1)
        if nbytes == 1:
            got = hashlib.md5((inter & 0xFF).astype(np.uint8).tobytes()).digest()
        elif nbytes == 2:
            got = hashlib.md5(inter.astype("<i2").tobytes()).digest()
        else:
            u = np.where(inter < 0, inter + (1 << 24), inter).astype(np.uint32)
            b3 = np.empty((u.size, 3), dtype=np.uint8)
            b3[:, 0] = u & 0xFF
            b3[:, 1] = (u >> 8) & 0xFF
            b3[:, 2] = (u >> 16) & 0xFF
            got = hashlib.md5(b3.tobytes()).digest()
        if got != md5_expect:
            raise FLACError("decoded stream MD5 mismatch")
    return rate, samples, bits


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode FLAC → ``(sample_rate, float64 (n_frames, n_channels) in
    [-1, 1])`` — same convention as ``wav.decode_wav`` so the multimodal
    ``decode_audio`` seam treats both formats identically."""
    rate, samples, bits = decode_flac_int(payload)
    return rate, samples.astype(np.float64) / float(1 << (bits - 1))
