"""gostatix_spark — a from-scratch PySpark-native distributed sketch library.

Re-expresses the five probabilistic structures of kwertop/gostatix
(Bloom filter, Cuckoo filter, HyperLogLog, Count-Min Sketch, Top-K) as
mergeable two-phase Spark aggregations: vectorized Arrow/numpy kernels
build per-partition partial states (``mapInArrow``), which are
tree-merged via ``groupBy().applyInPandas`` into one sketch per key.
No per-row Python anywhere in the hot path.

Reference: https://github.com/kwertop/gostatix (studied at
/root/reference; semantics cited per-module as file:line). This is a
Spark-first reimplementation, not a port.
"""

__version__ = "0.1.0"
