"""Independent scalar MetroHash128 reference — test-support only.

Provenance: transcribed directly from the PUBLIC ``dgryski/go-metro``
``Hash128`` function (the exact dependency the reference library calls,
``bloom_filter.go:17,323``), written independently of and WITHOUT
consulting ``gostatix_spark/hashing.py``. The two transcriptions share
no code; ``tests/test_hashing.py`` asserts they agree byte-for-byte on
the official MetroHash test string and on randomized inputs of every
length class, so a transcription error in either implementation fails
the suite (the round-1/round-2 advice item about self-certified
goldens).

Pure-Python uint64 arithmetic (explicit masking), no numpy — a
deliberately different implementation style from the vectorized kernel
under test.
"""

MASK = (1 << 64) - 1

K0 = 0xC83A91E1
K1 = 0x8648DBDB
K2 = 0x7BDEC03B
K3 = 0x2F5870A5

# the official MetroHash test key, from the public metrohash repository
TEST_KEY_63 = b"012345678901234567890123456789012345678901234567890123456789012"


def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (64 - r))) & MASK


def metro_hash128(data: bytes, seed: int) -> tuple[int, int]:
    """Port of go-metro ``Hash128(buffer, seed) (uint64, uint64)``."""
    pos = 0
    n = len(data)

    v0 = ((seed - K0) & MASK) * K3 & MASK
    v1 = ((seed + K1) & MASK) * K2 & MASK

    if n >= 32:
        v2 = ((seed + K0) & MASK) * K2 & MASK
        v3 = ((seed - K1) & MASK) * K3 & MASK

        while n - pos >= 32:
            v0 = (v0 + int.from_bytes(data[pos:pos + 8], "little") * K0) & MASK
            pos += 8
            v0 = (_rotr(v0, 29) + v2) & MASK
            v1 = (v1 + int.from_bytes(data[pos:pos + 8], "little") * K1) & MASK
            pos += 8
            v1 = (_rotr(v1, 29) + v3) & MASK
            v2 = (v2 + int.from_bytes(data[pos:pos + 8], "little") * K2) & MASK
            pos += 8
            v2 = (_rotr(v2, 29) + v0) & MASK
            v3 = (v3 + int.from_bytes(data[pos:pos + 8], "little") * K3) & MASK
            pos += 8
            v3 = (_rotr(v3, 29) + v1) & MASK

        v2 ^= _rotr(((v0 + v3) * K0 + v1) & MASK, 21) * K1 & MASK
        v2 &= MASK
        v3 ^= _rotr(((v1 + v2) * K1 + v0) & MASK, 21) * K0 & MASK
        v3 &= MASK
        v0 ^= _rotr(((v0 + v2) * K0 + v3) & MASK, 21) * K1 & MASK
        v0 &= MASK
        v1 ^= _rotr(((v1 + v3) * K1 + v2) & MASK, 21) * K0 & MASK
        v1 &= MASK

    if n - pos >= 16:
        v0 = (v0 + int.from_bytes(data[pos:pos + 8], "little") * K2) & MASK
        pos += 8
        v0 = _rotr(v0, 33) * K3 & MASK
        v1 = (v1 + int.from_bytes(data[pos:pos + 8], "little") * K2) & MASK
        pos += 8
        v1 = _rotr(v1, 33) * K3 & MASK
        v0 ^= _rotr((v0 * K2 + v1) & MASK, 45) * K1 & MASK
        v0 &= MASK
        v1 ^= _rotr((v1 * K3 + v0) & MASK, 45) * K0 & MASK
        v1 &= MASK

    if n - pos >= 8:
        v0 = (v0 + int.from_bytes(data[pos:pos + 8], "little") * K2) & MASK
        pos += 8
        v0 = _rotr(v0, 33) * K3 & MASK
        v0 ^= _rotr((v0 * K2 + v1) & MASK, 27) * K1 & MASK
        v0 &= MASK

    if n - pos >= 4:
        v1 = (v1 + int.from_bytes(data[pos:pos + 4], "little") * K2) & MASK
        pos += 4
        v1 = _rotr(v1, 33) * K3 & MASK
        v1 ^= _rotr((v1 * K3 + v0) & MASK, 46) * K0 & MASK
        v1 &= MASK

    if n - pos >= 2:
        v0 = (v0 + int.from_bytes(data[pos:pos + 2], "little") * K2) & MASK
        pos += 2
        v0 = _rotr(v0, 33) * K3 & MASK
        v0 ^= _rotr((v0 * K2 + v1) & MASK, 22) * K1 & MASK
        v0 &= MASK

    if n - pos >= 1:
        v1 = (v1 + data[pos] * K2) & MASK
        v1 = _rotr(v1, 33) * K3 & MASK
        v1 ^= _rotr((v1 * K3 + v0) & MASK, 58) * K0 & MASK
        v1 &= MASK

    v0 = (v0 + _rotr((v0 * K0 + v1) & MASK, 13)) & MASK
    v1 = (v1 + _rotr((v1 * K1 + v0) & MASK, 37)) & MASK
    v0 = (v0 + _rotr((v0 * K2 + v1) & MASK, 13)) & MASK
    v1 = (v1 + _rotr((v1 * K3 + v0) & MASK, 37)) & MASK

    return v0, v1
