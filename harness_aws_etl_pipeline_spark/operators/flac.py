"""FLAC decode/encode in pure Python + numpy — the feasible slice of
compressed-audio support in this container (mp3/aac need float DSP
stacks; FLAC is integer-only by design).

Implements the open spec (RFC 9639 / xiph.org/flac/format.html):

- stream layout: ``fLaC`` magic, metadata blocks (STREAMINFO parsed;
  others skipped), then frames;
- frame headers: 14-bit sync, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields, UTF-8-style
  coded frame number, CRC-8; frame trailer CRC-16 over the whole frame;
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (orders
  1-32, quantized coefficients + shift), wasted-bits unary field;
- residuals: Rice / Rice2 partitioned coding incl. the escape-to-raw
  partition form;
- stereo decorrelation: left/side, right/side, mid/side (side carries
  the +1 bit per the spec).

The decoder verifies the STREAMINFO MD5 of the decoded samples
(little-endian interleaved, the spec's audio-data digest) when
present — a spec-anchored end-to-end self-check that does not depend
on the encoder below. The encoder exists for fixtures/round-trip
oracles: CONSTANT/VERBATIM/FIXED subframe selection with one-partition
Rice residuals, optional mid/side. Like the TIFF/PNG/JPEG codecs, the
point is making the corpus-prep decode step REAL, not competing with
libFLAC.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "flac_meta"]


# ---------------------------------------------------------------- CRCs


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------- bit reader


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        if self.nacc:
            raise ValueError("unaligned bit writer")
        return bytes(self.out)


# ------------------------------------------------------ coded numbers

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _Bits) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError(f"bad coded number lead byte {first:#x}")
    v = first & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    out = []
    n = 1
    while value >= (1 << (6 * n + (6 - n))):
        n += 1
    # lead byte holds (6 - n) value bits under n+1 set bits
    for i in range(n):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    lead_bits = 6 - n
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (value >> (6 * n))
    return bytes([lead] + out[::-1])


# ----------------------------------------------------------- decoding


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                z = (q << param) | r
                out.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return out


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(resid):
            pred = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coefs)
            )
            samples.append(pred + e)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = list(warm)
        for i, e in enumerate(resid):
            acc = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coefs)
            )
            samples.append((acc >> shift) + e)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_streaminfo(data: bytes) -> dict:
    if len(data) != 34:
        raise ValueError(f"STREAMINFO must be 34 bytes, got {len(data)}")
    br = _Bits(data)
    out = {
        "min_blocksize": br.read(16),
        "max_blocksize": br.read(16),
        "min_framesize": br.read(24),
        "max_framesize": br.read(24),
        "sample_rate": br.read(20),
        "channels": br.read(3) + 1,
        "bits_per_sample": br.read(5) + 1,
        "total_samples": br.read(36),
    }
    out["md5"] = data[18:34]
    return out


def flac_meta(data: bytes) -> dict:
    """STREAMINFO fields without decoding audio (the probe face)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            info = _parse_streaminfo(body)
            info["audio_start"] = None  # filled by decode
            return info
        pos += 4 + length
        if last:
            raise ValueError("FLAC stream has no STREAMINFO block")


def decode_flac(data: bytes, verify_md5: bool = True) -> tuple["np.ndarray", int, int]:
    """FLAC bytes → ``(samples int32 array of shape (n, channels),
    sample_rate, bits_per_sample)``. Verifies frame CRC-8/CRC-16 and,
    when STREAMINFO carries a digest, the decoded-audio MD5."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    info: dict | None = None
    while True:
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            info = _parse_streaminfo(data[pos + 4 : pos + 4 + length])
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")

    channels_out: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data):
        frame_start = pos
        br = _Bits(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        if br.read(1):
            raise ValueError("reserved frame header bit set")
        br.read(1)  # blocking strategy (coded number disambiguates)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame header bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        bps = (
            info["bits_per_sample"] if ss_code == 0 else _SIZE_CODES[ss_code]
        )
        br.align()
        if _crc8(data[frame_start : br.byte]) != data[br.byte]:
            raise ValueError(f"frame header CRC-8 mismatch at {frame_start}")
        br.byte += 1  # consume the CRC-8 byte

        if ch_code < 8:
            nch = ch_code + 1
            subs = [
                _read_subframe(br, blocksize, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            nch = 2
            extra_first = 1 if ch_code in (9,) else 0
            extra_second = 1 if ch_code in (8, 10) else 0
            a = _read_subframe(br, blocksize, bps + extra_first)
            b = _read_subframe(br, blocksize, bps + extra_second)
            if ch_code == 8:  # left/side
                subs = [a, [x - s for x, s in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [[r + s for s, r in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != info["channels"]:
            raise ValueError("frame channel count != STREAMINFO")
        br.align()
        crc = struct.unpack_from(">H", data, br.byte)
        if _crc16(data[frame_start : br.byte]) != crc[0]:
            raise ValueError(f"frame CRC-16 mismatch at {frame_start}")
        pos = br.byte + 2
        for c in range(nch):
            channels_out[c].extend(subs[c])

    n = info["total_samples"] or len(channels_out[0])
    arr = np.array(channels_out, dtype=np.int64).T[:n]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        bps = info["bits_per_sample"]
        nbytes = (bps + 7) // 8
        inter = arr.reshape(-1)
        buf = bytearray()
        for v in inter.tolist():
            buf += int(v & ((1 << (8 * nbytes)) - 1)).to_bytes(
                nbytes, "little"
            )
        if hashlib.md5(bytes(buf)).digest() != info["md5"]:
            raise ValueError("decoded audio MD5 != STREAMINFO digest")
    return arr.astype(np.int32), info["sample_rate"], info["bits_per_sample"]


# ----------------------------------------------------------- encoding


def _rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid) + 1
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def _write_residual(bw: _BitWriter, resid: list[int]) -> None:
    bw.write(0, 2)  # Rice, 4-bit params
    bw.write(0, 4)  # one partition
    param = _rice_param(resid)
    bw.write(param, 4)
    for e in resid:
        z = (e << 1) if e >= 0 else ((-e << 1) - 1)  # zigzag
        bw.write_unary(z >> param)
        if param:
            bw.write(z & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    if all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    # pick the fixed order (0-2) with the smallest |residual| sum
    best_order, best_resid, best_cost = 0, samples, sum(
        abs(s) for s in samples
    )
    for order in (1, 2):
        if len(samples) <= order:
            break
        coefs = _FIXED_COEFS[order]
        resid = [
            s - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i, s in enumerate(samples)
            if i >= order
        ]
        cost = sum(abs(r) for r in resid)
        if cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    if best_order == 0 and best_cost >= len(samples) * (1 << max(bps - 2, 1)):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM — rice gains nothing on noise
        bw.write(0, 1)
        for s in samples:
            bw.write(s & ((1 << bps) - 1), bps)
        return
    bw.write(0, 1)
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)
    for s in samples[:best_order]:
        bw.write(s & ((1 << bps) - 1), bps)
    _write_residual(bw, best_resid)


def encode_flac(
    samples: "np.ndarray",
    sample_rate: int = 44100,
    bits_per_sample: int = 16,
    blocksize: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """(n, channels) int array → FLAC bytes (CONSTANT / VERBATIM /
    FIXED-order subframes, one-partition Rice residuals, optional
    mid/side for stereo). Fixture writer + round-trip oracle."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if nch > 8:
        raise ValueError(f"too many channels: {nch}")
    lim = 1 << (bits_per_sample - 1)
    if arr.min() < -lim or arr.max() >= lim:
        raise ValueError("samples exceed bits_per_sample range")

    # STREAMINFO
    last_bs = n - ((n - 1) // blocksize) * blocksize if n else blocksize
    si = _BitWriter()
    si.write(min(blocksize, last_bs), 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    nbytes = (bits_per_sample + 7) // 8
    buf = bytearray()
    for v in arr.reshape(-1).tolist():
        buf += int(v & ((1 << (8 * nbytes)) - 1)).to_bytes(nbytes, "little")
    md5 = hashlib.md5(bytes(buf)).digest()
    streaminfo = si
    out = bytearray(b"fLaC")
    body = streaminfo.bytes() + md5
    out.append(0x80)  # last block, type 0
    out += len(body).to_bytes(3, "big")
    out += body

    frame_no = 0
    for start in range(0, n, blocksize):
        block = arr[start : start + blocksize]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit field
        bw.write(0, 4)  # sample rate: from STREAMINFO
        use_ms = mid_side and nch == 2
        bw.write(10 if use_ms else nch - 1, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)
        for b in _write_coded_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])
        bw = _BitWriter()
        if use_ms:
            left = block[:, 0].tolist()
            right = block[:, 1].tolist()
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _encode_subframe(bw, mid, bits_per_sample)
            _encode_subframe(bw, side, bits_per_sample + 1)
        else:
            for c in range(nch):
                _encode_subframe(
                    bw, block[:, c].tolist(), bits_per_sample
                )
        bw.align()
        frame = header + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
