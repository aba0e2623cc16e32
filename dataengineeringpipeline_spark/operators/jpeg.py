"""Baseline-sequential JPEG codec in pure numpy/stdlib.

Closes the most common format on the multimodal codec boundary
(reference parity target: the media ingest the reference delegates to
managed decoding services — see ``multimodal.py`` module docstring; no
reference file implements a codec, so there is nothing to copy). Scope
is ITU-T T.81 **baseline DCT sequential**, the format >99% of real-world
JFIF files use:

- decoder: 8-bit precision, 1 or 3 components, ANY sampling factors
  (index-mapped nearest-neighbor chroma upsampling — exact for divisor
  ratios, correct for non-divisor ones like 3:2), tables parsed from
  the stream's own DQT/DHT segments, restart-interval (DRI/RSTn),
  byte-stuffing, and 0xFF fill-byte handling; progressive / arithmetic
  / 12-bit / hierarchical / multi-scan non-interleaved baseline raise
  ``NotImplementedError`` (the honest remaining boundary, not silent
  misreads);
- encoder: grayscale and 4:4:4 / 4:2:0 YCbCr color with the public
  Annex K quantization + Huffman tables, edge-replicated block padding.

Exactness anchor (same trick as the μ-law codebook fixed points in
``multimodal.py``): a FLAT gray image whose value ``v`` is even has
DC = 8·(v−128) divisible by the Annex-K luma DC quantum (16) and all-
zero AC — quantization is lossless on it, so encode→decode returns the
constant exactly and a DuckDB oracle can predict the decoded mean from
``doc_id`` arithmetic without parsing a byte.

The per-payload kernels are plain Python/numpy by design: they run
inside Arrow-batched ``mapInPandas`` workers (``multimodal.py``), where
a production deployment swaps this module for libjpeg-turbo bindings
without touching any Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# -- public Annex K tables (ITU-T T.81 §K.1/K.3) ------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Zig-zag scan order: ZIGZAG[k] = raster index of the k-th scanned
#: coefficient (T.81 figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> "np.ndarray":
    """Orthonormal 8×8 DCT-II matrix M: forward 2D DCT = M·B·Mᵀ,
    inverse = Mᵀ·F·M."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_DCT_M = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes per T.81 §C.2: symbol → (length, code)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {lc: sym for sym, lc in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00 and stops at any
    real marker (RSTn handled by the caller via :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the entropy segment
                raise EOFError("marker inside entropy data")
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

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def restart(self) -> None:
        """Align to the next RSTn marker and consume it."""
        self.acc = 0
        self.nbits = 0
        while not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decoding (T.81 F.12): low ``size`` bits → signed."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# -- encoder ------------------------------------------------------------------


def _encode_block(
    block: "np.ndarray",
    quant: "np.ndarray",
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    bw: _BitWriter,
) -> int:
    """FDCT + quantize + Huffman-encode one level-shifted 8×8 block;
    returns the new DC predictor."""
    coeffs = _DCT_M @ block @ _DCT_M.T
    q = np.rint(coeffs.reshape(64) / quant.astype(np.float64)).astype(np.int64)[ZIGZAG]
    dc = int(q[0])
    diff = dc - pred
    size = _category(diff)
    length, code = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        length, code = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad_to_blocks(plane: "np.ndarray", bh: int, bw_: int) -> "np.ndarray":
    """Edge-replicate a component plane up to a (bh, bw) multiple."""
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw_ - w % bw_) % bw_
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    pixels: "np.ndarray",
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``H×W`` uint8 grayscale or ``H×W×3`` uint8 RGB array as
    a baseline-sequential JFIF byte string (Annex K tables). ``subsample``
    is the chroma subsampling factor pair — ``(1, 1)`` = 4:4:4,
    ``(2, 2)`` = 4:2:0 (2×2 chroma box averaging); grayscale ignores it.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the resync points a parallel 100 TB decode splits
    scans at).
    """
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    sv, sh = subsample if not gray else (1, 1)
    if (sv, sh) not in ((1, 1), (2, 2)):
        raise NotImplementedError("subsample must be (1,1) or (2,2)")

    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [y, cb, cr]
        if (sv, sh) == (2, 2):
            for i in (1, 2):
                p = _pad_to_blocks(planes[i], 2, 2)
                planes[i] = (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
                )

    # header segments -------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, table: "np.ndarray") -> bytes:
        # DQT carries the table in zig-zag order: entry k = raster ZIGZAG[k]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in table[ZIGZAG]
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dqt(0, QUANT_LUMA)
    if not gray:
        out += dqt(1, QUANT_CHROMA)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded scan -----------------------------------------------------
    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    samps = [(1, 1)] if gray else [(sh, sv), (1, 1), (1, 1)]
    padded = [
        _pad_to_blocks(p - 128.0, 8 * (sv if i == 0 and not gray else 1),
                       8 * (sh if i == 0 and not gray else 1))
        for i, p in enumerate(planes)
    ]
    # every plane padded at least to its own 8-multiple
    padded = [_pad_to_blocks(p, 8, 8) for p in padded]
    mcus_x = padded[0].shape[1] // (8 * samps[0][0])
    mcus_y = padded[0].shape[0] // (8 * samps[0][1])
    bw = _BitWriter()
    preds = [0] * ncomp
    tables = [(dc_l, ac_l, QUANT_LUMA)] + [(dc_c, ac_c, QUANT_CHROMA)] * (ncomp - 1)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                n_rst = (mcu_index // restart_interval - 1) % 8
                out += bytes([0xFF, 0xD0 + n_rst])
                preds = [0] * ncomp
            mcu_index += 1
            for ci in range(ncomp):
                ch, cv = samps[ci]
                dc_t, ac_t, qt = tables[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(block, qt, dc_t, ac_t, preds[ci], bw)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Decode a baseline-sequential JPEG into ``H×W×3 uint8`` RGB
    (grayscale replicates into all three channels). Progressive /
    arithmetic-coded / 12-bit streams raise ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qts: dict[int, "np.ndarray"] = {}
    dec: dict[tuple[int, int], dict] = {}
    frame = None
    dri = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        # spec-legal 0xFF fill bytes may pad before any marker code
        # (B.1.1.2): skip the run, the marker is the first non-FF byte
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        m = payload[pos + 1]
        if m == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quantization tables")
                # stored in zig-zag (scan) order — exactly the order the
                # dequant multiply below consumes, so keep as-is
                qts[tid] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                dec[(cls, tid)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (fh, fw, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG supported")
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS: entropy data follows the header
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F) for c in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise NotImplementedError("JPEG stream missing SOF0/SOS")
    fh, fw, comps = frame
    if len(scan) < len(comps):
        # non-interleaved baseline (one scan per component) is spec-legal;
        # decoding it as one interleaved scan would misread the MCU layout
        # — honest boundary instead of a silent misdecode
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = {}
    for cid, ch, cv, _qid in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    by_id = {cid: (ch, cv, qid) for cid, ch, cv, qid in comps}

    br = _BitReader(payload, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                br.restart()
                preds = {cid: 0 for cid, *_ in comps}
            mcu_index += 1
            for cid, dc_id, ac_id in scan:
                ch, cv, qid = by_id[cid]
                dc_t = dec[(0, dc_id)]
                ac_t = dec[(1, ac_id)]
                quant = qts[qid].astype(np.float64)
                for by in range(cv):
                    for bx in range(ch):
                        q = np.zeros(64, dtype=np.float64)
                        size = br.read_symbol(dc_t)
                        diff = _extend(br.read_bits(size), size)
                        preds[cid] += diff
                        q[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_t)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0x0F
                            q[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = q * quant
                        block = _DCT_M.T @ coeffs.reshape(8, 8) @ _DCT_M
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block

    full = []
    th, tw = mcus_y * vmax * 8, mcus_x * hmax * 8
    for cid, ch, cv, _qid in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            # index-mapped nearest-neighbor upsample: target pixel t reads
            # source pixel (t·c)//max — exact for divisor ratios (reduces
            # to np.repeat) and correct for non-divisor sampling factors
            # (e.g. 3:2), where integer-factor repeat would misalign or
            # crash on shape mismatch
            rows = (np.arange(th) * cv) // vmax
            cols = (np.arange(tw) * ch) // hmax
            p = p[rows[:, None], cols]
        full.append(p[:fh, :fw] + 128.0)
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
