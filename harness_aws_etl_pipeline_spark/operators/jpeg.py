"""[EXT] JPEG codec (baseline + progressive) — pure numpy + stdlib.

``decode_jpeg`` handles single-scan baseline DCT JPEG (SOF0/1) AND
progressive JPEG (SOF2, spectral selection + successive approximation
in both DC and AC, EOB runs, refinement correction bits): marker
parse, DQT / DHT tables read FROM THE FILE (so compliant streams
decode, not just this module's own output), entropy-coded segment
with 0xFF00 unstuffing and DRI/RSTn restart handling, huffman DC/AC
coefficient decode, dequantize + dezigzag, orthonormal 8×8 IDCT,
generic chroma sampling factors (4:4:4 / 4:2:2 / 4:2:0 via per-
component planes + nearest upsample), YCbCr→RGB (BT.601). Grayscale
streams decode non-interleaved per spec A.2.2 (whatever sampling
factors they declare) and replicate to 3 channels. Arithmetic coding,
hierarchical/lossless frames, and partial-component multi-scan
BASELINE streams raise ``ValueError`` rather than mis-decoding.

``encode_jpeg`` writes baseline 4:4:4 with quality-scaled Annex-K-style
quant tables and fixed huffman tables embedded in the stream;
``encode_jpeg_progressive`` writes the classic 10-scan progressive
script. Both exist to produce test vectors and closed-form catalog
fixtures; a full progressive decode is bit-identical to the baseline
decode at the same quality (the scans transmit the exact quantized
coefficients), which is the round-trip tests' oracle.

Throughput note: the entropy decode is a Python bit loop — fine for
the Arrow-batched metadata/feature path this engine uses it for; a C
codec (libjpeg-turbo) drops in behind the same ``decode_image``
dispatch for bulk pixel workloads.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex-K-style base quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Huffman tables embedded by encode_jpeg (decode always uses the
# stream's own DHT segments, so these only shape our own output):
# (bits-per-length[1..16], symbol list)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

assert sum(DC_BITS) == len(DC_VALS)
assert sum(AC_BITS) == len(AC_VALS)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: forward F = M·b·Mᵀ matches
    the JPEG (1/4)C(u)C(v)Σ… definition; inverse b = Mᵀ·F·M."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by canonical huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (the pre-RST padding)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def raw(self, data: bytes) -> None:
        """Emit marker bytes verbatim (NOT entropy data — no 0xFF
        stuffing). Caller must align() first."""
        assert self.nbits == 0, "raw marker inside a partial byte"
        self.out += data

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset-bits) for a DC diff / AC value per the spec:
    negative values store ``v - 1`` in ``size`` low bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out[0], out[1]


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline 4:4:4 JPEG bytes.
    ``restart_interval > 0`` emits a DRI segment and an RSTn marker
    every that-many MCUs (byte-aligned, DC prediction reset) — the
    error-resilience layout real encoders produce, and the fixture
    that drives the decoder's restart path."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    qt_l, qt_c = _scaled_tables(quality)

    # RGB → YCbCr (BT.601), stored rounded
    rgb = a.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
    planes = [np.round(p).clip(0, 255) for p in (y, cb, cr)]

    # pad to 8-multiples by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    zz = ZIGZAG

    # 4:4:4 non-interleaved-factor MCU = one 8×8 block per component
    mcu = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.raw(
                    bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                )
                prev_dc = [0, 0, 0]
            mcu += 1
            for ci, plane in enumerate(planes):
                qt = qt_l if ci == 0 else qt_c
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = _M @ block @ _M.T
                quant = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
                seq = quant.reshape(-1)[zz]

                diff = int(seq[0]) - prev_dc[ci]
                prev_dc[ci] = int(seq[0])
                size, bits = _magnitude(diff)
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(bits, size)

                run = 0
                last_nz = int(np.max(np.nonzero(seq)[0])) if np.any(seq[1:]) else 0
                for i in range(1, 64):
                    v = int(seq[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, length = ac_codes[(run << 4) | size]
                    bw.write(code, length)
                    bw.write(bits, size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_codes[0x00]  # EOB
                    bw.write(code, length)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th] + bits + vals)

    dqt = seg(
        0xFFDB,
        b"\x00" + bytes(qt_l.reshape(-1)[ZIGZAG].tolist())
        + b"\x01" + bytes(qt_c.reshape(-1)[ZIGZAG].tolist()),
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dhts = seg(
        0xFFC4,
        dht(0, 0, DC_BITS, DC_VALS)
        + dht(1, 0, AC_BITS, AC_VALS)
        + dht(0, 1, DC_BITS, DC_VALS)
        + dht(1, 1, AC_BITS, AC_VALS),
    )
    sos = seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri + dhts + sos + bw.flush()
        + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn awareness."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy segment")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy segment")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or other marker mid-read: pad with 1s (legal —
                # trailing bits of the last byte are padding anyway)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG: expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for decode-side lookup."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy segment")


def _extend(bits: int, size: int) -> int:
    """Undo :func:`_magnitude`: category + offset bits → signed value."""
    if size == 0:
        return 0
    if bits >> (size - 1):
        return bits
    return bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB array."""
    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    scan = None

    while pos < len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack_from(">H", d, pos + 2)[0]
        body = d[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                    i += 65
                else:  # 16-bit table
                    tbl = np.frombuffer(body, ">u2", 64, i + 1).astype(np.int32)
                    i += 129
                dezz = np.zeros(64, np.int32)
                dezz[ZIGZAG] = tbl
                qts[tid] = dezz.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:  # SOF2: hand the whole stream over
            return _decode_progressive(d)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"only baseline (SOF0/1) and progressive (SOF2) JPEG "
                f"supported, got SOF marker {marker:#x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = body[1 + c * 2 : 3 + c * 2]
                scan_comps.append({"id": cs, "dc": tables >> 4, "ac": tables & 0xF})
            scan = (scan_comps, pos + 2 + length)
            break
        pos += 2 + length

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    scan_comps, data_start = scan
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if len(scan_comps) != len(comps):
        # legal in baseline (one scan per component subset) but rare;
        # decoding only the first scan would emit zeroed channels
        raise ValueError(
            "multi-scan baseline JPEG (partial-component scans) not supported"
        )
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]].update(dc_t=sc["dc"], ac_t=sc["ac"])

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks across
        c["bh"] = mcus_y * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8), np.float64)

    br = _BitReader(d, data_start)
    prev_dc = {c["id"]: 0 for c in comps}

    def _decode_block(c: dict) -> np.ndarray:
        """One 8×8 data unit for component ``c``: huffman-decode DC
        diff + AC runs, dequantize, dezigzag, IDCT, level shift."""
        qt = qts[c["tq"]]
        dc_table = huff[(0, c["dc_t"])]
        ac_table = huff[(1, c["ac_t"])]
        try:
            seq = np.zeros(64, np.int32)
            size = _read_symbol(br, dc_table)
            diff = _extend(br.read_bits(size), size)
            prev_dc[c["id"]] += diff
            seq[0] = prev_dc[c["id"]]
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_table)
                run, size = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                seq[k] = _extend(br.read_bits(size), size)
                k += 1
        except _RestartMarker:
            raise ValueError(
                "unexpected restart marker (bad DRI interval)"
            ) from None
        coef = np.zeros(64, np.float64)
        coef[ZIGZAG] = seq * qt.reshape(-1)[ZIGZAG]
        return _M.T @ coef.reshape(8, 8) @ _M + 128.0

    def _maybe_restart(unit_index: int) -> None:
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            br.sync_restart()
            for cid in prev_dc:
                prev_dc[cid] = 0

    if len(comps) == 1:
        # per spec (ISO 10918-1 A.2.2) a single-component scan is
        # NON-interleaved: data units raster over the component's own
        # block grid — ceil(w/8) × ceil(h/8), with the declared
        # sampling factors NOT forming 8·h × 8·v MCUs (a grayscale
        # stream declaring 2×2 sampling would otherwise desync)
        c = comps[0]
        bw2, bh2 = (w + 7) // 8, (h + 7) // 8
        unit = 0
        for byi in range(bh2):
            for bxi in range(bw2):
                _maybe_restart(unit)
                unit += 1
                c["plane"][byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = (
                    _decode_block(c)
                )
        # the plane was sized for the (irrelevant) declared factors;
        # treat it as unsampled for the upsample/crop step below
        c["h"] = c["v"] = 1
        max_h = max_v = 1
    else:
        mcu_index = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                _maybe_restart(mcu_index)
                mcu_index += 1
                for c in comps:
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            y0 = (my * c["v"] + vy) * 8
                            x0 = (mx * c["h"] + vx) * 8
                            c["plane"][y0 : y0 + 8, x0 : x0 + 8] = (
                                _decode_block(c)
                            )

    # upsample to full resolution (nearest) and crop
    full = []
    for c in comps:
        p = c["plane"]
        p = np.repeat(np.repeat(p, max_v // c["v"], axis=0), max_h // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1], full[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive JPEG
#
# SOF2 support: spectral selection + successive approximation, both
# directions. The decoder ports the reference algorithm of ITU T.81
# G.2 (the same control flow as libjpeg's jdphuff.c, re-derived from
# the spec): per-scan entropy decode accumulates QUANTIZED
# COEFFICIENTS per component; dequantize + IDCT happen once after the
# last scan. The encoder emits the classic 10-scan script (DC first
# at Al=1 → per-component AC bands at Al=2/1 → AC refinements → DC
# refinement) with per-scan fixed-length huffman tables (progressive
# scans need EOBn symbols that the Annex-K baseline tables lack;
# fixed-length canonical codes keep the table derivation trivial and
# dodge the all-ones-codeword reservation) — it exists to produce
# test vectors that exercise every decoder path, so the full
# round-trip (progressive decode ≡ baseline decode of the same
# quantized coefficients) is pinned by tests.


def _comp_blocks(frame: dict, c: dict) -> tuple[int, int]:
    """Non-interleaved block grid of one component: ceil over the
    component's OWN sample dims (T.81 A.1.1), not the MCU-padded
    grid."""
    max_h = max(x["h"] for x in frame["comps"])
    max_v = max(x["v"] for x in frame["comps"])
    sw = -(-frame["w"] * c["h"] // max_h)
    sh = -(-frame["h"] * c["v"] // max_v)
    return -(-sh // 8), -(-sw // 8)


def _prog_dc_scan(br, frame, scomps, coefs, ah, al, restart_interval):
    prev = {c["id"]: 0 for c in scomps}

    def one(c, byi, bxi, dc_table):
        blk = coefs[c["id"]][byi, bxi]
        if ah == 0:
            size = _read_symbol(br, dc_table)
            prev[c["id"]] += _extend(br.read_bits(size), size)
            blk[0] = prev[c["id"]] << al
        else:
            if br.read_bit():
                blk[0] = int(blk[0]) | (1 << al)

    if len(scomps) > 1:
        max_h = max(x["h"] for x in frame["comps"])
        max_v = max(x["v"] for x in frame["comps"])
        mcus_x = -(-frame["w"] // (8 * max_h))
        mcus_y = -(-frame["h"] // (8 * max_v))
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    br.sync_restart()
                    for k in prev:
                        prev[k] = 0
                unit += 1
                for c in scomps:
                    t = c.get("dc_table")
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            one(c, my * c["v"] + vy, mx * c["h"] + vx, t)
    else:
        c = scomps[0]
        ch, cw = _comp_blocks(frame, c)
        unit = 0
        for byi in range(ch):
            for bxi in range(cw):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    br.sync_restart()
                    for k in prev:
                        prev[k] = 0
                unit += 1
                one(c, byi, bxi, c.get("dc_table"))


def _prog_ac_first(br, blk, ac_table, ss, se, al, eobrun):
    """One block of an AC 'first' scan (Ah=0). Returns new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                return eobrun
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(br, blk, ac_table, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah=Al+1). Returns EOBRUN."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, ac_table)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: advance over 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and br.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(d: bytes) -> np.ndarray:
    """Progressive (SOF2) JPEG bytes → (h, w, 3) uint8 RGB."""
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    nscans = 0
    coefs: dict[int, np.ndarray] = {}

    while pos + 1 < len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        length = struct.unpack_from(">H", d, pos + 2)[0]
        body = d[pos + 4 : pos + 2 + length]
        nxt = pos + 2 + length
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                    i += 65
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i + 1).astype(np.int32)
                    i += 129
                dezz = np.zeros(64, np.int32)
                dezz[ZIGZAG] = tbl
                qts[tid] = dezz.reshape(8, 8)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC2:
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            mcus_x = (fw + 8 * max_h - 1) // (8 * max_h)
            mcus_y = (fh + 8 * max_v - 1) // (8 * max_v)
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                coefs[c["id"]] = np.zeros((c["bh"], c["bw"], 64), np.int32)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("mixed/unsupported frame in progressive stream")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            nscans += 1
            ns = body[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scomps = []
            for c in range(ns):
                cs, tables = body[1 + c * 2 : 3 + c * 2]
                sc = dict(by_id[cs])
                sc["dc_table"] = huff.get((0, tables >> 4))
                sc["ac_table"] = huff.get((1, tables & 0xF))
                scomps.append(sc)
            ss, se, a = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = a >> 4, a & 0xF
            br = _BitReader(d, nxt)
            if ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _prog_dc_scan(
                    br, frame, scomps, coefs, ah, al, restart_interval
                )
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be 1-component")
                c = scomps[0]
                ch, cw = _comp_blocks(frame, c)
                plane_coefs = coefs[c["id"]]
                eobrun = 0
                fn = _prog_ac_first if ah == 0 else _prog_ac_refine
                unit = 0
                for byi in range(ch):
                    for bxi in range(cw):
                        if (
                            restart_interval
                            and unit
                            and unit % restart_interval == 0
                        ):
                            br.sync_restart()
                            eobrun = 0
                        unit += 1
                        eobrun = fn(
                            br,
                            plane_coefs[byi, bxi],
                            c["ac_table"],
                            ss,
                            se,
                            al,
                            eobrun,
                        )
            # skip to the next marker after the entropy data
            p = br.pos
            while p + 1 < len(d) and not (
                d[p] == 0xFF and d[p + 1] != 0x00 and not (0xD0 <= d[p + 1] <= 0xD7)
            ):
                p += 1
            nxt = p
        pos = nxt

    if frame is None or nscans == 0:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    full = []
    for c in comps:
        qt_zz = qts[c["tq"]].reshape(-1)[ZIGZAG]
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), np.float64)
        blocks = coefs[c["id"]]
        for byi in range(c["bh"]):
            for bxi in range(c["bw"]):
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = blocks[byi, bxi] * qt_zz
                plane[
                    byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8
                ] = _M.T @ coef.reshape(8, 8) @ _M + 128.0
        p = np.repeat(
            np.repeat(plane, max_v // c["v"], axis=0), max_h // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1], full[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ScanOps:
    """Per-scan op recorder: huffman symbols (per table id) + raw
    bits, serialized once the per-scan table is known."""

    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self.symbols: dict[int, set[int]] = {}

    def sym(self, tid: int, symbol: int) -> None:
        self.ops.append(("s", tid, symbol))
        self.symbols.setdefault(tid, set()).add(symbol)

    def bits(self, value: int, nbits: int) -> None:
        if nbits:
            self.ops.append(("b", value, nbits))

    def rst(self, n: int) -> None:
        """Byte-align and emit RSTn (n taken mod 8)."""
        self.ops.append(("r", 0xD0 + n % 8))

    def serialize(self, codes: dict[int, dict[int, tuple[int, int]]]) -> bytes:
        bw = _BitWriter()
        for op in self.ops:
            if op[0] == "s":
                code, length = codes[op[1]][op[2]]
                bw.write(code, length)
            elif op[0] == "r":
                bw.align()
                bw.raw(bytes([0xFF, op[1]]))
            else:
                bw.write(op[1], op[2])
        return bw.flush()


def _scan_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical table over exactly these symbols: all
    codes share length L with |symbols| ≤ 2^L − 1, so the all-ones
    codeword (reserved — scan padding is 1-bits) is never assigned."""
    vals = sorted(symbols)
    n = len(vals)
    L = max(1, n.bit_length())
    bits = [0] * 16
    bits[L - 1] = n
    return bits, vals


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) 4:4:4 JPEG bytes.

    Emits the classic 10-scan script (the libjpeg default shape):
    interleaved DC first at Al=1; luma AC split into a 1–5 band and a
    6–63 band at Al=2 plus an Ah=2→Al=1 refinement; chroma AC full
    bands at Al=1; then the Al=0 refinements for everything. The
    scans transmit the exact quantized coefficients, so a full decode
    is bit-identical to decoding ``encode_jpeg`` output at the same
    quality — the round-trip test that pins every decoder path
    (DC/AC × first/refine, EOB runs, ZRL-in-refinement, buffered
    correction bits). ``restart_interval > 0`` additionally emits an
    RSTn every that-many data units in EVERY scan (EOB runs flushed at
    the boundary, DC prediction reset) — the restart path of the
    progressive decoder."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    qt_l, qt_c = _scaled_tables(quality)

    rgb = a.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
    planes = [np.round(p).clip(0, 255) for p in (y, cb, cr)]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    # quantized zigzag coefficient blocks per component, raster order
    blocks: list[list[np.ndarray]] = [[], [], []]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                qt = qt_l if ci == 0 else qt_c
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = _M @ block @ _M.T
                quant = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
                blocks[ci].append(quant.reshape(-1)[ZIGZAG])

    def dc_first(ops: _ScanOps, al: int) -> None:
        prev = [0, 0, 0]
        for bi in range(len(blocks[0])):
            if restart_interval and bi and bi % restart_interval == 0:
                ops.rst(bi // restart_interval - 1)
                prev = [0, 0, 0]
            for ci in range(3):
                tid = 0 if ci == 0 else 1
                v = int(blocks[ci][bi][0]) >> al  # arithmetic shift
                diff = v - prev[ci]
                prev[ci] = v
                size, b = _magnitude(diff)
                ops.sym(tid, size)
                ops.bits(b, size)

    def dc_refine(ops: _ScanOps, al: int) -> None:
        for bi in range(len(blocks[0])):
            if restart_interval and bi and bi % restart_interval == 0:
                ops.rst(bi // restart_interval - 1)
            for ci in range(3):
                ops.bits((int(blocks[ci][bi][0]) >> al) & 1, 1)

    def _flush_eob(ops: _ScanOps, eobrun: int, pending: list[int]) -> None:
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            ops.sym(0, nbits << 4)
            ops.bits(eobrun & ((1 << nbits) - 1), nbits)
            for bit in pending:
                ops.bits(bit, 1)
            pending.clear()

    def ac_first(ops: _ScanOps, ci: int, ss: int, se: int, al: int) -> None:
        eobrun = 0
        for bi, seq in enumerate(blocks[ci]):
            if restart_interval and bi and bi % restart_interval == 0:
                _flush_eob(ops, eobrun, [])
                eobrun = 0
                ops.rst(bi // restart_interval - 1)
            band = [int(v) for v in seq[ss : se + 1]]
            shifted = [
                (abs(v) >> al) * (1 if v >= 0 else -1) for v in band
            ]
            nz = [i for i, v in enumerate(shifted) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _flush_eob(ops, eobrun, [])
                    eobrun = 0
                continue
            _flush_eob(ops, eobrun, [])
            eobrun = 0
            r = 0
            for i in range(nz[-1] + 1):
                v = shifted[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    ops.sym(0, 0xF0)
                    r -= 16
                size, b = _magnitude(v)
                ops.sym(0, (r << 4) | size)
                ops.bits(b, size)
                r = 0
            if nz[-1] < se - ss:
                eobrun = 1
        _flush_eob(ops, eobrun, [])

    def ac_refine(ops: _ScanOps, ci: int, ss: int, se: int, al: int) -> None:
        eobrun = 0
        pending: list[int] = []  # correction bits riding the EOB run
        for bi, seq in enumerate(blocks[ci]):
            if restart_interval and bi and bi % restart_interval == 0:
                _flush_eob(ops, eobrun, pending)
                eobrun = 0
                ops.rst(bi // restart_interval - 1)
            band = [int(v) for v in seq[ss : se + 1]]
            absval = [abs(v) >> al for v in band]
            eob = 0
            for i, t in enumerate(absval):
                if t == 1:
                    eob = i
            br_bits: list[int] = []  # buffered since last symbol
            r = 0
            for i, t in enumerate(absval):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    _flush_eob(ops, eobrun, pending)
                    eobrun = 0
                    ops.sym(0, 0xF0)
                    r -= 16
                    for bit in br_bits:
                        ops.bits(bit, 1)
                    br_bits = []
                if t > 1:
                    br_bits.append(t & 1)
                    continue
                _flush_eob(ops, eobrun, pending)
                eobrun = 0
                ops.sym(0, (r << 4) | 1)
                ops.bits(1 if band[i] >= 0 else 0, 1)
                for bit in br_bits:
                    ops.bits(bit, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pending.extend(br_bits)
                if eobrun == 0x7FFF:
                    _flush_eob(ops, eobrun, pending)
                    eobrun = 0
        _flush_eob(ops, eobrun, pending)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xFFDB,
        b"\x00" + bytes(qt_l.reshape(-1)[ZIGZAG].tolist())
        + b"\x01" + bytes(qt_c.reshape(-1)[ZIGZAG].tolist()),
    )
    out += seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )

    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    # scan script: (kind, comp, Ss, Se, Ah, Al)
    script = [
        ("dc_first", None, 0, 0, 0, 1),
        ("ac_first", 0, 1, 5, 0, 2),
        ("ac_first", 2, 1, 63, 0, 1),
        ("ac_first", 1, 1, 63, 0, 1),
        ("ac_first", 0, 6, 63, 0, 2),
        ("ac_refine", 0, 1, 63, 2, 1),
        ("dc_refine", None, 0, 0, 1, 0),
        ("ac_refine", 0, 1, 63, 1, 0),
        ("ac_refine", 2, 1, 63, 1, 0),
        ("ac_refine", 1, 1, 63, 1, 0),
    ]
    for kind, ci, ss, se, ah, al in script:
        ops = _ScanOps()
        if kind == "dc_first":
            dc_first(ops, al)
        elif kind == "dc_refine":
            dc_refine(ops, al)
        elif kind == "ac_first":
            ac_first(ops, ci, ss, se, al)
        else:
            ac_refine(ops, ci, ss, se, al)
        codes: dict[int, dict[int, tuple[int, int]]] = {}
        dht_body = b""
        tclass = 0 if kind.startswith("dc") else 1
        for tid, syms in sorted(ops.symbols.items()):
            bits, vals = _scan_table(syms)
            codes[tid] = _canonical_codes(bits, vals)
            dht_body += bytes([(tclass << 4) | tid] + bits + vals)
        if dht_body:
            out += seg(0xFFC4, dht_body)
        if kind.startswith("dc") and ci is None:
            comps_spec = bytes([1, 0x00, 2, 0x10, 3, 0x10])
            ns = 3
        else:
            cid = ci + 1
            comps_spec = bytes([cid, 0x00])  # table id 0, both nibbles
            ns = 1
        out += seg(
            0xFFDA,
            bytes([ns]) + comps_spec + bytes([ss, se, (ah << 4) | al]),
        )
        out += ops.serialize(codes)
    out += b"\xff\xd9"
    return bytes(out)
