"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k, 100% JVM: broadcast
  the (small) query set, dot product via ``F.zip_with`` +
  ``F.aggregate`` inside whole-stage codegen, rank with a window. The
  correctness baseline.
* :func:`lsh_topk` — the scale path: random-hyperplane (SimHash) bucket
  index; candidates = rows whose sign-signature matches the query on a
  bucket prefix (multi-probe over all prefix buckets), exact cosine
  re-rank within candidates. Recall < 1 by design; probes trade
  recall/cost.
* :func:`embedding_norms` / :func:`cosine_col` — shared pieces.

At 100 TB: brute force is a single scan per query batch (no shuffle —
broadcast join + per-row expression), so it parallelizes perfectly but
costs a full scan; the LSH index turns that into a bucket-pruned scan
(partition the table by bucket and Catalyst prunes on the equi-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

__all__ = ["brute_force_topk", "lsh_topk", "cosine_col", "unit_vector_col",
           "hyperplane_signature", "build_lsh_index", "lsh_topk_indexed"]


def cosine_col(a, b):
    """Cosine similarity of two array<float> columns — pure JVM
    expression (zip_with product, aggregate sums)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def unit_vector_col(a):
    """L2-normalized copy of an array<float> column (array<double>).
    Normalizing each side of a similarity join ONCE turns the per-pair
    cosine into a bare dot product — the cheap way to run an O(n²) or
    candidate-verify stage without recomputing norms per pair."""
    ad = a.cast("array<double>")
    norm = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(ad, lambda x: x / norm)


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: broadcast(queries) nested-loop join → codegen'd cosine
    → window rank per query → filter ≤ k. Output:
    [q_id, rank, vec_id, cosine]."""
    joined = emb.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col, "cosine"))


def hyperplane_signature(df: DataFrame, vec_col: str, dim: int | None = None,
                         n_bits: int = 16, seed: int = 9,
                         out_col: str = "lsh_sig") -> DataFrame:
    """Random-hyperplane sign signature as a long column — vectorized
    numpy (one matmul per Arrow batch).

    ``dim`` may be omitted: the hyperplanes are derived from
    ``(seed, dim, n_bits)`` by a fresh seeded generator, so every
    worker/batch reconstructs the SAME planes from the vectors it sees
    — no driver-side ``.first()`` to sniff the dimension (one fewer
    Spark job per query)."""
    plane_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        plane_cache[dim] = (np.random.default_rng(seed)
                            .standard_normal((dim, n_bits))
                            .astype(np.float32))

    def planes_for(d: int) -> np.ndarray:
        if d not in plane_cache:
            plane_cache[d] = (np.random.default_rng(seed)
                              .standard_normal((d, n_bits))
                              .astype(np.float32))
        return plane_cache[d]

    @F.pandas_udf(LongType())
    def sig(vs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vs])
        bits = (mat @ planes_for(mat.shape[1])) > 0
        vals = np.zeros(len(vs), dtype=np.int64)
        for j in range(n_bits):
            vals |= bits[:, j].astype(np.int64) << j
        return pd.Series(vals)

    return df.withColumn(out_col, sig(F.col(vec_col)))


def build_lsh_index(emb: DataFrame, path: str, *,
                    dim: int | None = None, n_bits: int = 12,
                    prefix_bits: int = 6, seed: int = 9,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist the signature table PARTITIONED BY BUCKET so repeated
    query batches amortize the signature scan: ``lsh_topk`` recomputes
    every row's signature per call; the index computes it once, and
    :func:`lsh_topk_indexed` reads only the probed buckets (static
    partition pruning on the ``bkt`` directory column).

    Layout: ``path/bkt=<b>/part-*.parquet`` with columns
    ``[id, vec, lsh_sig]`` plus a ``_lsh_index.json`` sidecar recording
    (n_bits, prefix_bits, seed, columns) so queries can't accidentally
    probe with mismatched hyperplanes. On an object store, keep the
    sidecar in the table's metadata/properties instead."""
    import json
    import os
    shift = n_bits - prefix_bits
    e = hyperplane_signature(emb, vec_col, dim, n_bits, seed) \
        .withColumn("bkt", F.shiftrightunsigned("lsh_sig", shift).cast("int"))
    (e.select(id_col, vec_col, "lsh_sig", "bkt")
     .write.mode("overwrite").partitionBy("bkt").parquet(path))
    with open(os.path.join(path, "_lsh_index.json"), "w") as f:
        json.dump({"n_bits": n_bits, "prefix_bits": prefix_bits,
                   "seed": seed, "id_col": id_col, "vec_col": vec_col}, f)


def lsh_topk_indexed(spark, path: str, queries: DataFrame, k: int = 10, *,
                     q_id_col: str = "q_id",
                     q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k against a persisted :func:`build_lsh_index`.
    The query batch's buckets are computed first (tiny job over the
    queries only), then the index scan carries a static
    ``bkt IN (...)`` partition filter — Catalyst prunes every other
    bucket directory before listing files, so the scan cost is
    O(probed buckets), not O(index). Results are identical to
    :func:`lsh_topk` with the same parameters (same seed ⇒ same
    hyperplanes ⇒ same buckets ⇒ same exact re-rank)."""
    import json
    import os
    with open(os.path.join(path, "_lsh_index.json")) as f:
        p = json.load(f)
    shift = p["n_bits"] - p["prefix_bits"]
    q = hyperplane_signature(queries, q_vec_col, None, p["n_bits"],
                             p["seed"]) \
        .withColumn("bkt", F.shiftrightunsigned("lsh_sig", shift).cast("int"))
    q = q.select(q_id_col, q_vec_col, "bkt")
    probed = [r["bkt"] for r in q.select("bkt").distinct().collect()]
    emb = spark.read.parquet(path).where(F.col("bkt").isin(probed))
    cands = emb.join(F.broadcast(q), "bkt")
    scored = cands.select(
        F.col(q_id_col), F.col(p["id_col"]),
        cosine_col(F.col(p["vec_col"]), F.col(q_vec_col)).alias("cosine"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"),
                                             F.asc(p["id_col"]))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, "rank", p["id_col"], "cosine"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 10, *,
             dim: int | None = None, n_bits: int = 12, prefix_bits: int = 6,
             seed: int = 9,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: equi-join on the top ``prefix_bits`` of the
    hyperplane signature (the bucket), exact cosine re-rank within the
    bucket. Output schema matches :func:`brute_force_topk`."""
    shift = n_bits - prefix_bits
    e = hyperplane_signature(emb, vec_col, dim, n_bits, seed) \
        .withColumn("_bkt", F.shiftrightunsigned("lsh_sig", shift))
    q = hyperplane_signature(queries, q_vec_col, dim, n_bits, seed) \
        .withColumn("_bkt", F.shiftrightunsigned("lsh_sig", shift))
    cands = e.join(F.broadcast(q.select(q_id_col, q_vec_col, "_bkt")), "_bkt")
    scored = cands.select(
        F.col(q_id_col), F.col(id_col),
        cosine_col(F.col(vec_col), F.col(q_vec_col)).alias("cosine"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col, "cosine"))
