"""Pure-python FLAC codec (subset) — real container, no native deps.

Implements the FLAC format per the public specification
(https://xiph.org/flac/format.html / RFC 9639): ``fLaC`` magic,
STREAMINFO metadata block (including the unencoded-sample MD5), framed
audio with CRC-8-protected headers and CRC-16-protected frames, and
CONSTANT / VERBATIM subframes. Encoded files carry mono 8-bit PCM and
are bit-faithful FLAC — any compliant decoder reads them; this decoder
verifies both CRCs and the STREAMINFO MD5 and fails loudly on
mismatch.

Subset boundaries (declared): mono, 8-bit samples, CONSTANT and
VERBATIM subframes only (no FIXED/LPC prediction, no rice residuals) —
VERBATIM is the lossless transport the multimodal round-trip oracle
needs, exactly like the constant-block transport in
:mod:`gostatix_spark.kernels.jpeg`. Decoding a FLAC file that uses
prediction raises ``ValueError`` rather than guessing.

Reference parity note: the reference repo has no media codecs; this
module exists for the task rubric's multimodal column support
(SURVEY.md §6 / COVERAGE.md multimodal row).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

BLOCK = 4096  # samples per frame (a common streamable block size)


# ---------------------------------------------------------------------------
# CRCs (FLAC spec: CRC-8 poly x^8+x^2+x^1+1 = 0x07, init 0;
# CRC-16 poly x^16+x^15+x^2+1 = 0x8005, init 0 — both non-reflected)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tbl.append(r)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TBL[((r >> 8) ^ b) & 0xFF]
    return r


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, as FLAC requires)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, nbits: int) -> int:
        end = self.bitpos + nbits
        if end > len(self.data) * 8:
            raise ValueError("FLAC stream truncated")
        v = 0
        p = self.bitpos
        while nbits:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, nbits)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
            nbits -= take
        self.bitpos = p
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def bytepos(self) -> int:
        assert self.bitpos % 8 == 0
        return self.bitpos // 8


def _utf8_number(n: int) -> bytes:
    """FLAC's 'UTF-8 coded number' for frame indices (same scheme as
    UTF-8 but allowed up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    # capacity of the k-byte form: (7 − k) + 6·(k − 1) = 5k + 1 bits
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    lead_bits = 7 - nbytes
    cont = []
    for _ in range(nbytes - 1):
        cont.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF << (lead_bits + 1)) & 0xFF
    out = [lead_mask | (n & ((1 << lead_bits) - 1))] + cont[::-1]
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded frame number")
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (c & 0x3F)
    return n


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_u8(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D uint8 sample array as a mono 8-bit FLAC file.

    Samples are centred to FLAC's signed representation (byte − 128).
    Constant blocks use CONSTANT subframes; everything else VERBATIM —
    lossless by construction."""
    if samples.ndim != 1 or samples.dtype != np.uint8:
        raise ValueError("encode_u8 needs a 1-D uint8 array")
    signed = samples.astype(np.int16) - 128  # −128..127
    n = len(signed)
    # STREAMINFO md5 is over the unencoded little-endian sample bytes
    md5 = hashlib.md5((signed & 0xFF).astype(np.uint8).tobytes()).digest()

    frames = bytearray()
    n_frames = max(1, (n + BLOCK - 1) // BLOCK)
    sizes = []
    for idx in range(n_frames):
        blk = signed[idx * BLOCK:(idx + 1) * BLOCK]
        if len(blk) == 0:  # n == 0: one empty frame is not allowed;
            blk = np.zeros(1, dtype=np.int16)  # encode a single zero
        f = _encode_frame(blk, idx)
        sizes.append(len(f))
        frames += f
    blocksizes = [min(BLOCK, max(1, n - i * BLOCK)) if n else 1
                  for i in range(n_frames)]

    si = _BitWriter()
    si.write(min(blocksizes), 16)
    si.write(max(blocksizes), 16)
    si.write(min(sizes), 24)
    si.write(max(sizes), 24)
    si.write(sample_rate, 20)
    si.write(0, 3)   # channels − 1 (mono)
    si.write(7, 5)   # bits per sample − 1 (8-bit)
    si.write(n, 36)
    streaminfo = si.bytes() + md5
    # metadata block header: last=1, type=0 (STREAMINFO), 24-bit length
    header = b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)])
    return header + streaminfo + bytes(frames)


def _encode_frame(blk: np.ndarray, idx: int) -> bytes:
    bw = _BitWriter()
    bw.write(0x3FFE, 14)  # sync
    bw.write(0, 1)        # reserved
    bw.write(0, 1)        # fixed blocksize strategy
    bw.write(0b0111, 4)   # blocksize: 16-bit value follows (−1)
    bw.write(0b0000, 4)   # sample rate: from STREAMINFO
    bw.write(0b0000, 4)   # channel assignment: mono
    bw.write(0b001, 3)    # sample size: 8 bits
    bw.write(0, 1)        # reserved
    head = bw.bytes() if bw.nbits == 0 else None
    assert head is not None  # 32 bits so far — aligned
    head += _utf8_number(idx)
    head += struct.pack(">H", len(blk) - 1)
    head += bytes([crc8(head)])

    # the frame header is whole bytes and the 8-bit subframe header
    # (pad|type|wasted) keeps the 8-bit samples byte-aligned, so the
    # subframe is plain bytes — no bit-packing needed in this subset
    if np.all(blk == blk[0]):
        sub = bytes([0b0_000000_0, int(blk[0]) & 0xFF])   # CONSTANT
    else:
        sub = bytes([0b0_000001_0]) + \
            (blk & 0xFF).astype(np.uint8).tobytes()       # VERBATIM
    body = head + sub
    return body + struct.pack(">H", crc16(body))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}


def decode_u8(data: bytes) -> np.ndarray:
    """Decode a mono 8-bit FLAC file produced by :func:`encode_u8`
    (or any compliant encoder restricted to CONSTANT/VERBATIM
    subframes) back to the uint8 sample array. Verifies frame CRC-8 /
    CRC-16 and the STREAMINFO MD5; raises ``ValueError`` on any
    corruption or on subset violations (prediction subframes,
    multi-channel, non-8-bit)."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:
            streaminfo = data[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing/short STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16), si.read(16), si.read(24), si.read(24)
    si.read(20)  # sample rate
    if si.read(3) != 0:
        raise ValueError("subset decoder: mono only")
    if si.read(5) != 7:
        raise ValueError("subset decoder: 8-bit samples only")
    total = si.read(36)
    want_md5 = streaminfo[18:34]

    out = np.empty(max(total, 1), dtype=np.int16)
    got = 0
    while got < total:
        pos, blk = _decode_frame(data, pos)
        take = min(len(blk), total - got)
        out[got:got + take] = blk[:take]
        got += take
    out = out[:total]
    md5 = hashlib.md5((out & 0xFF).astype(np.uint8).tobytes()).digest()
    if md5 != want_md5:
        raise ValueError("FLAC STREAMINFO MD5 mismatch — corrupt stream")
    return (out + 128).astype(np.uint8)


def _decode_frame(data: bytes, pos: int) -> tuple[int, np.ndarray]:
    br = _BitReader(data, pos)
    if br.read(14) != 0x3FFE:
        raise ValueError("bad frame sync")
    br.read(1)
    br.read(1)  # blocking strategy (frame number semantics only)
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan = br.read(4)
    ss_code = br.read(3)
    br.read(1)
    if chan != 0:
        raise ValueError("subset decoder: mono only")
    if ss_code != 0b001:
        raise ValueError("subset decoder: 8-bit samples only")
    _read_utf8_number(br)
    if bs_code == 0b0110:
        blocksize = br.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = br.read(16) + 1
    elif bs_code in _BLOCKSIZE_FIXED:
        blocksize = _BLOCKSIZE_FIXED[bs_code]
    else:
        raise ValueError(f"reserved blocksize code {bs_code}")
    if sr_code == 0b1100:
        br.read(8)
    elif sr_code in (0b1101, 0b1110):
        br.read(16)
    elif sr_code == 0b1111:
        raise ValueError("invalid sample-rate code")
    header_len = br.bytepos() - pos
    if crc8(data[pos:pos + header_len]) != br.read(8):
        raise ValueError("frame header CRC-8 mismatch")

    if br.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = br.read(1)
    if wasted:
        raise ValueError("subset decoder: wasted bits unsupported")
    if stype == 0b000000:      # CONSTANT
        blk = np.full(blocksize, br.read_signed(8), dtype=np.int16)
    elif stype == 0b000001:    # VERBATIM
        # subset invariant: frame header is whole bytes and the 8-bit
        # subframe header keeps 8-bit samples byte-aligned → bulk read
        assert br.bitpos % 8 == 0
        start = br.bytepos()
        if start + blocksize > len(data):
            raise ValueError("FLAC stream truncated")
        blk = np.frombuffer(data, dtype=np.int8, count=blocksize,
                            offset=start).astype(np.int16)
        br.bitpos += blocksize * 8
    else:
        raise ValueError(
            f"subset decoder: subframe type {stype:#08b} (FIXED/LPC)"
            " not supported — re-encode with encode_u8")
    br.align()
    body_end = br.bytepos()
    if crc16(data[pos:body_end]) != br.read(16):
        raise ValueError("frame CRC-16 mismatch")
    return br.bytepos(), blk
