"""Bloom filter kernel (numpy).

Mirrors the reference: enhanced double hashing with the
Dillinger–Manolios cubic term ``index_i = (h1 + i·h2 + (i³−i)/6) mod m``
(``bloom_filter.go:327-330``), insert sets k bits
(``bloom_filter.go:142-161``), lookup is the AND of k bit tests
(``bloom_filter.go:188-215``), observed FPR ``(1−e^(−bits/m))^k``
(``bloom_filter.go:228-231``). Merge (absent in the reference,
SURVEY.md §2.1 B11) = bitwise OR of equal-sized filters — associative,
commutative, idempotent; required for the two-phase aggregation.
"""

from __future__ import annotations

import math

import numpy as np

U64 = np.uint64


def new_state(m: int) -> np.ndarray:
    """Bit array as packed little-endian uint64 words."""
    return np.zeros((m + 63) // 64, dtype=U64)


def indices(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via enhanced double hashing (uint64 wrap
    semantics identical to the Go uint64 arithmetic)."""
    i = np.arange(k, dtype=U64)
    cubic = (i * i * i - i) // U64(6)  # exact: i³−i is divisible by 6
    return ((h1[:, None] + i[None, :] * h2[:, None] + cubic[None, :])
            % U64(m)).astype(np.int64)


_CHUNK = 1 << 17


def insert_batch(words: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> None:
    for s in range(0, len(h1), _CHUNK):
        idx = indices(h1[s:s + _CHUNK], h2[s:s + _CHUNK], k, m)
        np.bitwise_or.at(words, idx >> 6, U64(1) << (idx & 63).astype(U64))


def lookup_batch(words: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """Boolean membership per element (vectorized AND of k bit tests)."""
    out = np.empty(len(h1), dtype=bool)
    for s in range(0, len(h1), _CHUNK):
        idx = indices(h1[s:s + _CHUNK], h2[s:s + _CHUNK], k, m)
        bits = (words[idx >> 6] >> (idx & 63).astype(U64)) & U64(1)
        out[s:s + _CHUNK] = bits.all(axis=1)
    return out


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError("cannot merge bloom filters of different sizes")
    return a | b


def bit_count(words: np.ndarray) -> int:
    """Popcount of the whole filter (for the observed-FPR metric)."""
    return int(np.unpackbits(words.view(np.uint8)).sum())


def positive_rate(words: np.ndarray, k: int, m: int) -> float:
    """Observed false-positive probability — ``bloom_filter.go:228-231``."""
    return (1.0 - math.exp(-float(bit_count(words)) / m)) ** k
