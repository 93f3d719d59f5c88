"""Count-Min Sketch kernel (numpy).

Mirrors the reference: Kirsch–Mitzenmacher positions
``pos_r = (h1 + r·h2) mod w`` (``base_count_min_sketch.go:52-59``),
update adds to every row (``count_min_sketch.go:55-68``), point query =
row-wise min (``count_min_sketch.go:76-87``), merge = elementwise add
with dimension guard (``count_min_sketch.go:138-151``). ``all_sum``
tracked as in the reference (``base_count_min_sketch.go:31``; quirk
SURVEY.md §1.6.12 — kept, merged by addition).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def new_state(d: int, w: int) -> np.ndarray:
    return np.zeros((d, w), dtype=U64)


def positions(h1: np.ndarray, h2: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n, d) matrix of column positions per row."""
    r = np.arange(d, dtype=U64)[None, :]
    return ((h1[:, None] + r * h2[:, None]) % U64(w)).astype(np.int64)


_CHUNK = 1 << 17


def update_batch(matrix: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                 counts: np.ndarray | None = None) -> int:
    """Add ``counts`` (default 1) for each hashed element; returns the
    batch total (caller accumulates all_sum). Processes in cache-sized
    chunks so the (n, d) position temporaries stay small.

    Accumulation is per-row ``np.bincount`` (+ vector add), ~5× faster
    than the unbuffered ``np.add.at`` scatter on the same positions.
    Weighted counts go through bincount's float64 weights — exact for
    per-batch totals < 2^53, far beyond any Arrow batch."""
    d, w = matrix.shape
    total = 0
    for s in range(0, len(h1), _CHUNK):
        e = s + _CHUNK
        pos = positions(h1[s:e], h2[s:e], d, w)
        if counts is None:
            total += pos.shape[0]
            for r in range(d):
                matrix[r] += np.bincount(pos[:, r], minlength=w) \
                    .astype(U64, copy=False)
        else:
            c = np.asarray(counts[s:e], dtype=np.float64)
            total += int(c.sum())
            for r in range(d):
                matrix[r] += np.bincount(pos[:, r], weights=c,
                                         minlength=w).astype(U64)
    return total


def query_batch(matrix: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Row-wise min over d positions — the CMS point estimate."""
    d, w = matrix.shape
    pos = positions(h1, h2, d, w)
    rows = np.arange(d, dtype=np.int64)[None, :]
    return matrix[rows, pos].min(axis=1)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError("cannot merge CMS with different dimensions")
    return a + b
