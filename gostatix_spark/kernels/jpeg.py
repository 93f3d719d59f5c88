"""Pure-python baseline JPEG (ITU-T T.81) — grayscale encoder/decoder.

Retires one leg of the multimodal codec stub without native deps: the
container ships no PIL/libjpeg, so this implements the actual format —
JFIF markers, DQT/DHT/SOF0/SOS parsing, Huffman entropy coding, FDCT/
IDCT, byte stuffing — for 8-bit single-component (grayscale) baseline
images. The Huffman tables are the T.81 Annex K.3 typical luminance
tables (published spec constants).

Scope (declared): baseline sequential DCT, one component, no
subsampling, no restart markers, 8-bit precision. Color, progressive,
and restart-interval streams raise loudly.

Losslessness note for the byte-oracle: JPEG is lossy in general, but
an image whose 8×8 blocks are each CONSTANT has integer DCT
coefficients (DC = 8·(v−128), all AC = 0), so with a unit quant table
the encode→decode roundtrip is bit-exact (`constant_block_image` /
`image_to_bytes` below build on this). The decoder itself is general:
it handles arbitrary AC coefficients, ZRL runs, and any 8-bit quant
table — exercised by the non-constant-block tests.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_gray", "decode_gray", "bytes_to_image",
           "image_to_bytes"]

# zigzag order: index z -> (row, col) of the 8x8 coefficient matrix
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# T.81 Annex K.3.1: typical Huffman tables for 8-bit luminance.
# BITS[i] = number of codes of length i+1; VALS = symbols in code order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal DCT-II matrix: FDCT of block B is M @ B @ M.T (after the
# -128 level shift), IDCT is M.T @ C @ M — T.81 A.3.3 with the 1/4·C(u)
# scaling folded into M's rows
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _build_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): returns
    {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_lut(bits, vals):
    """16-bit-window decode LUT: peek[0:16] → (symbol, code length).
    65536-entry arrays make each symbol decode one indexed load."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    __slots__ = ("acc", "n")

    def __init__(self):
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length

    def tobytes(self) -> bytes:
        pad = (-self.n) % 8
        acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s (F.1.2.3)
        raw = acc.to_bytes((self.n + pad) // 8, "big") if self.n else b""
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def encode_gray(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a 2-D uint8 array as a baseline JFIF/JPEG grayscale file.

    ``quant``: 64-entry uint8 quantization table in zigzag order
    (default all-ones — maximum fidelity; constant 8×8 blocks then
    roundtrip bit-exactly, see module docstring). General images
    encode with the usual DCT-rounding loss."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gray needs a 2-D uint8 array")
    h, w = img.shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"image dims {h}x{w} out of JPEG range")
    if quant is None:
        quant = np.ones(64, dtype=np.uint8)
    quant = np.asarray(quant, dtype=np.uint8).ravel()
    if quant.size != 64 or quant.min() < 1:
        raise ValueError("quant must be 64 entries >= 1 (zigzag order)")
    bh, bw = -(-h // 8), -(-w // 8)
    # edge padding replicates the last row/col (the common choice; any
    # padding decodes consistently since dims in SOF0 crop it away)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (padded.reshape(bh, 8, bw, 8).swapaxes(1, 2)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    # FDCT all blocks in one einsum, quantize, zigzag
    coefs = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
    qmat = quant[np.argsort(_ZIGZAG)].reshape(8, 8).astype(np.float64)
    q = np.round(coefs / qmat).astype(np.int64)
    zz = q.reshape(-1, 64)[:, _ZIGZAG]

    wtr = _BitWriter()
    prev_dc = 0
    for blk in zz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        cat = _category(diff)
        code, ln = _DC_CODES[cat]
        wtr.put(code, ln)
        if cat:
            wtr.put(diff if diff >= 0 else diff - 1 + (1 << cat), cat)
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = _AC_CODES[0xF0]  # ZRL: 16 zeros
                wtr.put(zc, zl)
                run -= 16
            cat = _category(v)
            code, ln = _AC_CODES[(run << 4) | cat]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v - 1 + (1 << cat), cat)
            run = 0
        if last < 63:
            code, ln = _AC_CODES[0x00]  # EOB
            wtr.put(code, ln)

    out = [b"\xff\xd8",                                       # SOI
           b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00",
           b"\xff\xdb\x00\x43\x00" + quant.tobytes(),          # DQT id 0
           b"\xff\xc0\x00\x0b\x08"                             # SOF0
           + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + b"\x01\x01\x11\x00",                              # 1 comp, 1x1, q0
           b"\xff\xc4" + (2 + 17 + len(_DC_VALS)).to_bytes(2, "big")
           + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS),      # DHT DC 0
           b"\xff\xc4" + (2 + 17 + len(_AC_VALS)).to_bytes(2, "big")
           + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),      # DHT AC 0
           b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00",        # SOS
           wtr.tobytes(),
           b"\xff\xd9"]                                        # EOI
    return b"".join(out)


class _BitReader:
    """MSB-first reader over the destuffed entropy segment, buffered in
    a python int (fast shifts, no numpy per-symbol overhead)."""

    __slots__ = ("data", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            # past the end, feed 0 bits — a well-formed stream never
            # consumes them as data (padding is 1s, EOI follows)
            b = self.data[self.i] if self.i < len(self.data) else 0
            self.i += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: value bits → signed coefficient."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG into a 2-D uint8 array.

    General baseline decoder: any 8-bit quant tables, any Huffman
    tables carried in DHT, full AC run-length/ZRL/EOB handling.
    Raises on color, progressive (SOF2), restart intervals, or
    truncated/corrupt streams."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    h = w = None
    comp_q = dc_id = ac_id = None
    i = 2
    scan_start = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = int.from_bytes(data[i + 2:i + 4], "big")
        seg = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:                                     # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tid] = np.frombuffer(seg[p + 1:p + 65],
                                             dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:                                   # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _build_lut(bits, vals)
                p += 17 + n
        elif marker == 0xC0:                                   # SOF0
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp != 1:
                raise ValueError(
                    f"only single-component (grayscale) baseline JPEG"
                    f" supported, got {ncomp} components")
            if seg[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker ff{marker:02x}"
                             " (baseline sequential only)")
        elif marker == 0xDD:                                   # DRI
            if int.from_bytes(seg, "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:                                   # SOS
            if seg[0] != 1:
                raise ValueError("single-component scan expected")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 15
            scan_start = i + 2 + seglen
            break
        # APPn/COM/etc: skip
        i += 2 + seglen
    if scan_start is None or h is None:
        raise ValueError("no SOS/SOF0 in stream")
    if comp_q not in qtables:
        raise ValueError(f"quant table {comp_q} not defined")
    if (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("huffman tables for scan not defined")

    end = data.find(b"\xff\xd9", scan_start)
    if end < 0:
        raise ValueError("no EOI")
    raw = data[scan_start:end]
    # inside the scan, FF is either stuffed data (FF 00) or a marker —
    # the only in-scan markers are RSTn, which this decoder rejects
    j = raw.find(b"\xff")
    while j != -1:
        if j + 1 >= len(raw) or raw[j + 1] != 0x00:
            raise ValueError(
                f"unexpected marker ff{raw[j + 1]:02x} in entropy stream"
                " (restart markers unsupported)" if j + 1 < len(raw)
                else "truncated entropy stream")
        j = raw.find(b"\xff", j + 2)
    entropy = raw.replace(b"\xff\x00", b"\xff")
    dc_sym, dc_len = huff[(0, dc_id)]
    ac_sym, ac_len = huff[(1, ac_id)]
    qt = qtables[comp_q]

    bh, bw = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw
    zz = np.zeros((n_blocks, 64), dtype=np.int64)
    rdr = _BitReader(entropy)
    prev_dc = 0
    for b in range(n_blocks):
        p16 = rdr.peek16()
        cat = int(dc_sym[p16])
        ln = int(dc_len[p16])
        if ln == 0:
            raise ValueError("invalid DC huffman code")
        rdr.skip(ln)
        diff = _extend(rdr.read(cat), cat) if cat else 0
        prev_dc += diff
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            p16 = rdr.peek16()
            rs = int(ac_sym[p16])
            ln = int(ac_len[p16])
            if ln == 0:
                raise ValueError("invalid AC huffman code")
            rdr.skip(ln)
            if rs == 0x00:      # EOB
                break
            if rs == 0xF0:      # ZRL
                k += 16
                continue
            k += rs >> 4
            cat = rs & 15
            if k > 63:
                raise ValueError("AC run past block end")
            zz[b, k] = _extend(rdr.read(cat), cat)
            k += 1

    deq = (zz * qt[None, :])
    mats = np.zeros((n_blocks, 64), dtype=np.float64)
    mats[:, _ZIGZAG] = deq
    mats = mats.reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _M, mats, _M)  # Mᵀ·C·M per block
    pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
    full = (pix.reshape(bh, bw, 8, 8).swapaxes(1, 2)
            .reshape(bh * 8, bw * 8))
    return full[:h, :w]


# ---------------------------------------------------------------------------
# lossless byte transport: one byte per constant 8x8 block
# ---------------------------------------------------------------------------


def bytes_to_image(payload: bytes) -> tuple[np.ndarray, int]:
    """Spread bytes into constant 8×8 blocks on a near-square grid —
    the losslessly JPEG-codable representation (DC-only integer
    coefficients). Returns (uint8 image, n_bytes). Empty payloads get
    one zero block (JPEG needs ≥1 MCU); n_bytes disambiguates."""
    n = len(payload)
    vals = np.frombuffer(payload, dtype=np.uint8) if n else \
        np.zeros(1, dtype=np.uint8)
    bw = max(1, int(np.ceil(np.sqrt(len(vals)))))
    bh = -(-len(vals) // bw)
    grid = np.zeros(bh * bw, dtype=np.uint8)
    grid[:len(vals)] = vals
    img = np.repeat(np.repeat(grid.reshape(bh, bw), 8, axis=0), 8, axis=1)
    return img, n


def image_to_bytes(img: np.ndarray, n_bytes: int) -> bytes:
    """Inverse of :func:`bytes_to_image`: sample each block's top-left
    pixel (exact for the DC-only construction) and truncate the pad."""
    if img.shape[0] % 8 or img.shape[1] % 8:
        raise ValueError(f"block-transport image dims {img.shape}"
                         " must be multiples of 8")
    vals = img[::8, ::8].ravel()
    if n_bytes > vals.size:
        raise ValueError(f"n_bytes {n_bytes} exceeds {vals.size} blocks")
    return vals[:n_bytes].tobytes()
