"""Baseline JPEG (JFIF) codec — pure numpy + stdlib, from the public
ITU-T T.81 / JFIF specifications. No PIL, no libjpeg.

Closes the §2.9a gap from round 1 ("JPEG gated stub"): `decode` in
functions/images.py now falls back to this decoder when PIL is absent, so
real JPEG payloads decode in this container.

Scope (baseline sequential DCT, the overwhelmingly common case):
- encoder: 8-bit RGB -> YCbCr (JFIF), 4:4:4 sampling, Annex K quantization
  tables scaled by quality, standard Annex K Huffman tables, byte
  stuffing; emits SOI/APP0/DQT/SOF0/DHT/SOS/EOI.
- decoder: marker parse, DQT/DHT/SOF0/SOS, interleaved MCU entropy decode
  (supports 4:4:4 and 4:2:0/4:2:2 sampling with box upsampling), AC/DC
  Huffman, dequantize, inverse zigzag, IDCT (matrix form), YCbCr -> RGB.
- not covered: progressive scans, arithmetic coding, restart-marker DNL
  edge cases beyond plain RSTn handling (raises cleanly).

Per-image cost is Python-loop Huffman + numpy DCT — correctness-first;
at the Spark layer images decode inside Arrow-batched mapInPandas, so a
cluster parallelizes per image. DCT math is shared with the pHash kernel.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K (T.81) example quantization tables, in natural (row-major) order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag order: index i of the natural-order coefficient at zigzag pos i
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K standard Huffman tables: (bits per length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(8)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100).astype(np.int32)
    return np.clip(q, 1, 255)


# --- bit IO -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resets DC predictors
                    raise _Restart()
                else:
                    # EOI or other marker — emit padding bits
                    self.pos -= 1
                    b = 0
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
            if self.nbits < n and self.pos >= len(self.data):
                self.acc <<= 8
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill()
            if self.nbits < 16 and self.pos >= len(self.data):
                self.acc <<= 8
                self.nbits += 8
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def skip_to_restart(self) -> None:
        self.acc, self.nbits = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _Restart(Exception):
    pass


# --- Huffman tables -----------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict[bytes, list[int]] = {}


def _build_decoder(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit peek LUT: lut[next16bits] = (symbol << 8) | code_length.
    One list index per Huffman symbol instead of bit-by-bit tree walking —
    the decoder hot path. Memoized: most files carry the Annex K tables."""
    key = bytes(bits) + bytes(vals)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = [0] * (1 << 16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            entry = (vals[k] << 8) | length
            for i in range(lo, lo + (1 << (16 - length))):
                lut[i] = entry
            code += 1
            k += 1
        code <<= 1
    if len(_LUT_CACHE) < 64:
        _LUT_CACHE[key] = lut
    return lut


def _read_huff(r: _BitReader, lut: list[int]) -> int:
    entry = lut[r.peek16()]
    length = entry & 0xFF
    if length == 0:
        raise ValueError("invalid huffman code")
    r.drop(length)
    return entry >> 8


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- encoder ------------------------------------------------------------------


def jpeg_encode(pixels: np.ndarray, quality: int = 95,
                sampling: str = "444") -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF bytes.

    sampling: "444" (no chroma subsampling, default) or "420" (2x2 box
    chroma subsampling; exercises the decoder's upsampling path and is
    what most camera JPEGs use)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    assert sampling in ("444", "420")
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if sampling == "420":
        ly, lx = 2, 2
    else:
        ly, lx = 1, 1
    mcu_h, mcu_w = 8 * ly, 8 * lx
    hp, wp = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w

    def to_blocks(chan: np.ndarray, q: np.ndarray, th: int, tw: int) -> np.ndarray:
        ch, cw = chan.shape
        padded = np.pad(chan, ((0, th - ch), (0, tw - cw)), mode="edge") - 128.0
        bl = padded.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", _D8, bl, _D8)
        return np.round(coef / q).astype(np.int32)

    y_blocks = to_blocks(y, qy, hp, wp)
    if sampling == "420":
        cbp = np.pad(cb, ((0, hp - h), (0, wp - w)), mode="edge")
        crp = np.pad(cr, ((0, hp - h), (0, wp - w)), mode="edge")
        cb_s = cbp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        cr_s = crp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        cb_blocks = to_blocks(cb_s, qc, hp // 2, wp // 2)
        cr_blocks = to_blocks(cr_s, qc, hp // 2, wp // 2)
    else:
        cb_blocks = to_blocks(cb, qc, hp, wp)
        cr_blocks = to_blocks(cr, qc, hp, wp)

    dc_l, ac_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS), _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c, ac_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS), _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()

    def emit_block(zz, pred_i, dct, act, pred):
        diff = int(zz[0]) - pred[pred_i]
        pred[pred_i] = int(zz[0])
        size, mag = _magnitude(diff)
        code, ln = dct[size]
        bw.write(code, ln)
        if size:
            bw.write(mag, size)
        run = 0
        last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, mag = _magnitude(v)
            code, ln = act[(run << 4) | size]
            bw.write(code, ln)
            bw.write(mag, size)
            run = 0
        if last_nz < 63:
            code, ln = act[0x00]  # EOB
            bw.write(code, ln)

    pred = [0, 0, 0]
    for my in range(hp // mcu_h):
        for mx in range(wp // mcu_w):
            for vy in range(ly):
                for vx in range(lx):
                    zz = y_blocks[my * ly + vy, mx * lx + vx].flatten()[ZIGZAG]
                    emit_block(zz, 0, dc_l, ac_l, pred)
            emit_block(cb_blocks[my, mx].flatten()[ZIGZAG], 1, dc_c, ac_c, pred)
            emit_block(cr_blocks[my, mx].flatten()[ZIGZAG], 2, dc_c, ac_c, pred)
    entropy = bw.flush()
    y_hv = (ly << 4) | lx

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in q.flatten()[ZIGZAG]))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, y_hv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt(0, qy) + dqt(1, qc)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sof + sos + entropy + b"\xff\xd9"
    )


# --- decoder ------------------------------------------------------------------


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB uint8 (h, w, 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_comps: list[dict] = []
    entropy_start = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += 2
        if marker in (0xFFD8, 0xFFD9):
            continue
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtables[tid] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xFFC0 or marker == 0xFFC1:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0xF, tq=tq))
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError("only baseline sequential JPEG supported")
        elif marker == 0xFFDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFFDA:
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append(dict(comp=comp, td=tt >> 4, ta=tt & 0xF))
            entropy_start = pos + length
            break
        pos += length

    if entropy_start is None:
        raise ValueError("no scan found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }

    r = _BitReader(data[entropy_start:])
    pred = {sc["comp"]["id"]: 0 for sc in scan_comps}
    # entropy pass collects plain-int zigzag vectors; dequant + IDCT then
    # run as ONE einsum per component (no per-block numpy allocations)
    comp_blocks: dict[int, list] = {sc["comp"]["id"]: [] for sc in scan_comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.skip_to_restart()
                for k in pred:
                    pred[k] = 0
            try:
                for sc in scan_comps:
                    c = sc["comp"]
                    dct = htables[(0, sc["td"])]
                    act = htables[(1, sc["ta"])]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            zz = [0] * 64
                            s = _read_huff(r, dct)
                            diff = _extend(r.bits(s), s)
                            pred[c["id"]] += diff
                            zz[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = _read_huff(r, act)
                                rr, ss = rs >> 4, rs & 0xF
                                if ss == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                zz[k] = _extend(r.bits(ss), ss)
                                k += 1
                            py = (my * c["v"] + vy) * 8
                            px = (mx * c["h"] + vx) * 8
                            comp_blocks[c["id"]].append((py, px, zz))
            except _Restart:
                for k in pred:
                    pred[k] = 0
            mcu_count += 1

    for sc in scan_comps:
        c = sc["comp"]
        entries = comp_blocks[c["id"]]
        if not entries:
            continue
        q = qtables[c["tq"]].flatten()[ZIGZAG].astype(np.float64)
        Z = np.array([e[2] for e in entries], dtype=np.float64) * q
        C = np.zeros_like(Z)
        C[:, ZIGZAG] = Z
        blocks = np.einsum(
            "ji,njk,kl->nil", _D8, C.reshape(-1, 8, 8), _D8
        ) + 128.0
        plane = planes[c["id"]]
        for (py, px, _), b in zip(entries, blocks):
            plane[py : py + 8, px : px + 8] = b

    def upsample(c: dict) -> np.ndarray:
        p = planes[c["id"]]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        return p[:h, :w]

    if len(comps) == 1:
        yv = upsample(comps[0])
        return np.clip(np.stack([yv] * 3, axis=-1), 0, 255).astype(np.uint8)
    yv, cb, cr = (upsample(c) for c in comps[:3])
    cb, cr = cb - 128.0, cr - 128.0
    r_ = yv + 1.402 * cr
    g_ = yv - 0.344136 * cb - 0.714136 * cr
    b_ = yv + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255).astype(np.uint8)
