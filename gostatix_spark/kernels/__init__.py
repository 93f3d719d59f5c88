"""Pure-numpy single-node sketch kernels.

Each kernel operates on a flat numpy state buffer and (h1, h2) uint64
hash arrays produced by :mod:`gostatix_spark.hashing`. The Spark layer
(:mod:`gostatix_spark.agg`) calls these inside Arrow-batched UDFs — the
kernels themselves know nothing about Spark.
"""

from gostatix_spark.kernels import bloom, cms, cuckoo, hll, topk  # noqa: F401
