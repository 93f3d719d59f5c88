"""Query surface over built sketch states.

Two flavors:

* **state-side** — turn a states DataFrame ``[key?, state, ...]`` into
  answers (``hll_estimate``, ``cms_counts``, ``topk_values``) with a
  pandas UDF over the tiny state rows; stays distributed, never
  collects raw data.
* **probe-side** — broadcast a (small) final sketch state and test a
  big DataFrame column against it (``bloom_contains``,
  ``cuckoo_contains``, ``cms_count_col``) with Arrow-vectorized pandas
  UDFs: the reference's ``Lookup``/``Count`` (``bloom_filter.go:188-215``,
  ``cuckoo_filter.go:118-125``, ``count_min_sketch.go:76-92``) applied
  per-batch instead of per-call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType, StringType,
                               StructField, StructType)

from gostatix_spark import hashing
from gostatix_spark.kernels import bloom, cms, cuckoo, hll, topk
from gostatix_spark.state import (BloomState, CMSState, CuckooState, HLLState,
                                  TopKState, sketch_from_bytes)

__all__ = ["hll_estimate", "hll_intersect_pairs", "cms_counts",
           "topk_values", "bloom_contains", "bloom_cardinality",
           "cms_inner_product",
           "bloom_contains_sharded", "bloom_contains_join",
           "cuckoo_contains", "cuckoo_contains_join", "cms_count_col",
           "quantiles", "sketch_info", "hash_pandas"]


def _hash_pd(s: pd.Series, element: str, algo: str):
    """(h1, h2) for a pandas Series under the canonical encodings."""
    if element == "int64":
        return hashing.hash_int64s(s.to_numpy(dtype=np.int64), algo)
    if element == "int32":
        return hashing.hash_tokens(s.to_numpy(dtype=np.int64), algo)
    if element in ("string", "binary"):
        # Arrow does the utf-8 encode / buffer concat in C; the kernel
        # hashes the flat buffer via length-grouped matrices — no
        # per-element Python (the old list-comprehension .encode()
        # dominated probe UDFs on multi-million-row gram columns)
        import pyarrow as pa
        from gostatix_spark.agg import _arrow_var_bytes
        arr = pa.Array.from_pandas(
            s, type=pa.string() if element == "string" else pa.binary())
        values, offsets = _arrow_var_bytes(arr)
        return hashing.hash_var_bytes(values, offsets, algo)
    if element == "token_array":
        lens = s.map(len).to_numpy(dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        values = (np.concatenate([np.asarray(x, dtype=np.int64) for x in s])
                  if lens.sum() else np.zeros(0, np.int64))
        return hashing.hash_token_arrays(values, offsets, algo)
    raise ValueError(element)


hash_pandas = _hash_pd


# ---------------------------------------------------------------------------
# state-side queries
# ---------------------------------------------------------------------------


def hll_estimate(states: DataFrame, out_col: str = "est_distinct",
                 linear_counting: bool = True) -> DataFrame:
    """[key?, state, ...] → [key?, est_distinct] (``hyperloglog.go:67-76``)."""
    @F.pandas_udf(LongType())
    def est(blobs: pd.Series) -> pd.Series:
        return pd.Series([
            hll.count(sketch_from_bytes(bytes(b)).registers,
                      linear_counting=linear_counting)
            for b in blobs], dtype="int64")
    return states.withColumn(out_col, est(F.col("state")))


def hll_intersect_pairs(states: DataFrame, key_col: str,
                        linear_counting: bool = True,
                        pairs: DataFrame | None = None) -> DataFrame:
    """Pairwise distinct-intersection estimates between keyed HLL
    sketches by inclusion–exclusion: ``|A∩B| ≈ |A| + |B| − |A∪B|``,
    where the union sketch is the registerwise max (the ⊕-merge — the
    composition the mergeable design buys for free; the reference has
    no set algebra beyond merge, ``hyperloglog.go:103-112``).

    Output: ``[key_a, key_b, est_a, est_b, est_union, est_intersect,
    est_jaccard]`` (``est_jaccard`` = intersect/union — the
    sketch-level set-similarity signal). Error: each term carries the
    standard 1.04/√m relative error; RSS-combining gives
    ``σ_∩ ≈ (1.04/√m)·sqrt(|A|² + |B|² + |A∪B|²)`` — small-overlap
    pairs have large RELATIVE error (inclusion–exclusion's known
    weakness); gate accordingly (see q:hll_intersect_gate).

    **Pair selection — the scale knob.** With ``pairs=None`` the
    default compares EVERY unordered key pair: a states×states
    non-equi join (BroadcastNestedLoopJoin) — K²/2 pairs of KB blobs.
    Fine for handfuls of keys (event types); quadratic by construction
    at windowed-key scale (10⁴ keys ⇒ 5·10⁷ register merges). For that
    regime pass ``pairs`` — a ``[key_a, key_b]`` DataFrame naming the
    pairs to score (candidate pairs from an LSH pass, adjacent
    windows, a top-k key subset…): the work becomes two equi-joins +
    O(|pairs|) register math, shuffling only the requested rows.
    Every requested pair yields exactly one output row: a pair whose
    key has no sketch comes back with null estimates (LEFT joins), so
    missing keys are visible to the caller instead of silently
    dropped.

    Register math is vectorized per Arrow batch (stacked registers →
    one ``np.maximum`` + one ``hll.count_many`` pass per term)."""
    a = states.select(F.col(key_col).alias("key_a"),
                      F.col("state").alias("_sa"))
    b = states.select(F.col(key_col).alias("key_b"),
                      F.col("state").alias("_sb"))
    out_t = StructType([StructField("est_a", LongType()),
                        StructField("est_b", LongType()),
                        StructField("est_union", LongType()),
                        StructField("est_intersect", LongType())])

    @F.pandas_udf(out_t)
    def est(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        cols = ["est_a", "est_b", "est_union", "est_intersect"]
        if not len(sa):
            return pd.DataFrame(columns=cols, dtype="int64")
        # a requested pair whose key had no sketch arrives with a null
        # state (LEFT join) — score the valid rows, emit nulls for the
        # rest so the caller sees one row per requested pair
        valid = (~sa.isna() & ~sb.isna()).to_numpy()
        out = pd.DataFrame(index=range(len(sa)), columns=cols,
                           dtype="Int64")
        if valid.any():
            ra = np.stack([sketch_from_bytes(bytes(x))
                           .registers for x in sa[valid]])
            rb = np.stack([sketch_from_bytes(bytes(y))
                           .registers for y in sb[valid]])
            na = hll.count_many(ra, linear_counting=linear_counting)
            nb = hll.count_many(rb, linear_counting=linear_counting)
            nu = hll.count_many(np.maximum(ra, rb),
                                linear_counting=linear_counting)
            out.loc[valid, "est_a"] = na
            out.loc[valid, "est_b"] = nb
            out.loc[valid, "est_union"] = nu
            out.loc[valid, "est_intersect"] = na + nb - nu
        return out

    if pairs is not None:
        joined = pairs.select("key_a", "key_b").join(a, "key_a", "left") \
                      .join(b, "key_b", "left")
    else:
        joined = a.join(b, F.col("key_a") < F.col("key_b"))
    return (joined
            .withColumn("_e", est("_sa", "_sb"))
            .select("key_a", "key_b", "_e.est_a", "_e.est_b",
                    "_e.est_union", "_e.est_intersect")
            .withColumn("est_jaccard",
                        F.when(F.col("est_union").isNull(),
                               F.lit(None).cast("double"))
                        .when(F.col("est_union") > 0,
                              F.col("est_intersect") / F.col("est_union"))
                        .otherwise(F.lit(0.0))))


def topk_values(states: DataFrame, out_elem: str = "element",
                out_count: str = "est_count", exact: bool = False,
                decode: str = "string") -> DataFrame:
    """[key?, state, ...] → exploded [key?, rank, element, est_count].

    ``decode``: 'string' (utf-8), 'int64'/'int32' (big-endian), 'binary'.
    """
    def dec(e: bytes):
        if decode == "string":
            return e.decode("utf-8", "replace")
        if decode == "int64":
            return int.from_bytes(e, "big", signed=True)
        if decode == "int32":
            return int.from_bytes(e, "big", signed=True)
        return e
    elem_type = {"string": StringType(), "binary": None}.get(decode, LongType())
    if decode == "binary":
        from pyspark.sql.types import BinaryType
        elem_type = BinaryType()

    result_t = ArrayType(StructType([
        StructField("rank", LongType()), StructField(out_elem, elem_type),
        StructField(out_count, LongType())]))

    @F.pandas_udf(result_t)
    def vals(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            st: TopKState = sketch_from_bytes(bytes(b))
            if exact and getattr(st, "capped", False):
                raise ValueError(
                    "topk_values(exact=True) on a capped (max_distinct) "
                    "build: compaction flushed count tails into the CMS, "
                    "so exact candidate sums undercount flushed-then-"
                    "reappearing elements; read with exact=False (CMS "
                    "re-estimation, the reference semantics)")
            rows = topk.final_values(st.cms.matrix, st.candidates, st.k,
                                     exact=exact)
            out.append([{"rank": i + 1, out_elem: dec(e), out_count: c}
                        for i, (e, c) in enumerate(rows)])
        return pd.Series(out)

    key_cols = [c for c in states.columns
                if c not in ("state", "n_items", "n_partials")]
    return (states
            .withColumn("_tk", F.explode(vals(F.col("state"))))
            .select(*key_cols, "_tk.rank", f"_tk.{out_elem}", f"_tk.{out_count}"))


def cms_counts(states: DataFrame, items: list, element: str = "string",
               out_col: str = "est_count") -> DataFrame:
    """Point-query a fixed item list against every key's CMS state —
    returns exploded [key?, item, est_count]."""
    h1, h2 = _hash_pd(pd.Series(items), element, "metro")
    h1l, h2l = h1.tolist(), h2.tolist()
    from pyspark.sql.types import BinaryType
    item_type = {"string": StringType(), "int64": LongType(),
                 "int32": LongType(), "binary": BinaryType()}[element]
    result_t = ArrayType(StructType([
        StructField("item", item_type), StructField(out_col, LongType())]))

    @F.pandas_udf(result_t)
    def q(blobs: pd.Series) -> pd.Series:
        ha = np.array(h1l, dtype=np.uint64)
        hb = np.array(h2l, dtype=np.uint64)
        out = []
        for b in blobs:
            st: CMSState = sketch_from_bytes(bytes(b))
            est = cms.query_batch(st.matrix, ha, hb)
            out.append([{"item": items[i], out_col: int(est[i])}
                        for i in range(len(items))])
        return pd.Series(out)

    key_cols = [c for c in states.columns
                if c not in ("state", "n_items", "n_partials")]
    return (states.withColumn("_q", F.explode(q(F.col("state"))))
            .select(*key_cols, "_q.item", f"_q.{out_col}"))


def cms_inner_product(states_a: DataFrame, states_b: DataFrame,
                      out_col: str = "est_join_size") -> DataFrame:
    """Equi-join SIZE estimate from two CMS sketches over the join
    keys (Cormode–Muthukrishnan): ``⟨a,b⟩ ≈ min_d Σ_w a[d,w]·b[d,w]``
    — never underestimates, overestimate ≤ ε·‖a‖₁·‖b‖₁ w.p. ≥ 1−δ.
    The planner's use case: size a join from two KB-sized sketches
    without touching either table. Requires identical (d, w) — i.e.
    both built with the same ε/δ — and the same hash family, which
    this library fixes globally.

    Both inputs are single-state (or per-key, joined by the caller);
    the cross pair of sketch rows is KB×KB — never data-sized."""
    a = states_a.select(F.col("state").alias("_sa"))
    b = states_b.select(F.col("state").alias("_sb"))

    @F.pandas_udf(LongType())
    def est(sa: pd.Series, sb: pd.Series) -> pd.Series:
        vals = []
        for x, y in zip(sa, sb):
            ma = sketch_from_bytes(bytes(x))
            mb = sketch_from_bytes(bytes(y))
            if (ma.d, ma.w) != (mb.d, mb.w):
                raise ValueError(
                    f"CMS dims differ: {(ma.d, ma.w)} vs {(mb.d, mb.w)}")
            prod = (ma.matrix.astype(np.float64)
                    * mb.matrix.astype(np.float64)).sum(axis=1)
            vals.append(int(prod.min()))
        return pd.Series(vals, dtype="int64")

    return a.crossJoin(b).select(est("_sa", "_sb").alias(out_col))


def bloom_cardinality(states: DataFrame,
                      out_col: str = "est_items") -> DataFrame:
    """Swamidass–Baldi cardinality estimate from a Bloom filter's fill:
    ``n̂ = −(m/k)·ln(1 − X/m)`` with X set bits — recovers an item
    count from the bitset ALONE (no counter), e.g. after OR-merging
    filters whose item counts overlap (n_items would double-count
    shared elements; the fill does not). Saturated filters (X = m)
    return −1: the estimate diverges there by construction."""
    @F.pandas_udf(LongType())
    def est(blobs: pd.Series) -> pd.Series:
        vals = []
        for b in blobs:
            st = sketch_from_bytes(bytes(b))
            # bits ≥ m are never set (positions are mod m), so a full
            # popcount of the backing words IS the fill count X
            x = int(np.unpackbits(st.words.view(np.uint8)).sum())
            if x >= st.m:
                vals.append(-1)
            else:
                vals.append(round(-(st.m / st.k)
                                  * np.log1p(-x / st.m)))
        return pd.Series(vals, dtype="int64")

    return states.withColumn(out_col, est(F.col("state")))


def sketch_info(states: DataFrame) -> DataFrame:
    """[key?, state, ...] → per-state parameters and health metrics —
    the reference's accessor surface (``BloomPositiveRate``
    ``bloom_filter.go:228-231``, ``Accuracy`` ``base_hyperloglog.go:66``,
    ``CuckooPositiveRate`` ``base_cuckoo_filter.go:73-75``, CMS dims,
    ``allSum``) as one DataFrame."""
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType
    from gostatix_spark.kernels import kll as kll_k
    from gostatix_spark.kernels import tdigest as td_k
    from gostatix_spark.kernels.cuckoo import CuckooFilter

    info_t = StructType([
        StructField("kind", StringType()),
        StructField("params", StringType()),       # json
        StructField("fill_metric", DoubleType()),  # fpr / occupancy / etc
        StructField("accuracy", DoubleType()),
    ])

    @F.pandas_udf(info_t)
    def info(blobs: pd.Series) -> pd.DataFrame:
        import json
        import math
        rows = []
        for b in blobs:
            b = bytes(b)
            if b[:4] == td_k.MAGIC:
                m, w, n, delta = td_k.from_bytes(b)
                rows.append({"kind": "tdigest",
                             "params": json.dumps({"delta": delta, "n": int(n)}),
                             "fill_metric": float(len(m)),
                             "accuracy": 1.0 / delta})
                continue
            if b[:4] == kll_k.KLL.MAGIC:
                sk = kll_k.KLL.from_bytes(b)
                rows.append({"kind": "kll",
                             "params": json.dumps({"k": sk.k, "n": int(sk.n)}),
                             "fill_metric": float(sum(len(lv) for lv in sk.levels)),
                             "accuracy": 1.0 / sk.k})
                continue
            st = sketch_from_bytes(b)
            if isinstance(st, BloomState):
                rows.append({"kind": "bloom",
                             "params": json.dumps({"m": st.m, "k": st.k,
                                                   "n": st.n_items}),
                             "fill_metric": bloom.positive_rate(st.words, st.k, st.m),
                             "accuracy": float("nan")})
            elif isinstance(st, HLLState):
                rows.append({"kind": "hll",
                             "params": json.dumps({"m": st.m, "n": st.n_items}),
                             "fill_metric": float((st.registers > 0).mean()),
                             "accuracy": 1.04 / math.sqrt(st.m)})
            elif isinstance(st, CMSState):
                rows.append({"kind": "cms",
                             "params": json.dumps({"d": st.d, "w": st.w,
                                                   "all_sum": st.all_sum}),
                             "fill_metric": float((st.matrix > 0).mean()),
                             "accuracy": math.e / st.w})
            elif isinstance(st, TopKState):
                rows.append({"kind": "topk",
                             "params": json.dumps({"k": st.k,
                                                   "candidates": len(st.candidates)}),
                             "fill_metric": float(st.cms.all_sum),
                             "accuracy": st.error_rate})
            elif isinstance(st, CuckooState):
                f = CuckooFilter(st.size, st.bucket_size, st.fp_len,
                                 buckets=st.buckets, length=st.length)
                occ = st.length / (st.size * st.bucket_size)
                rows.append({"kind": "cuckoo",
                             "params": json.dumps({"size": st.size,
                                                   "bucket_size": st.bucket_size,
                                                   "fp_len": st.fp_len,
                                                   "length": st.length}),
                             "fill_metric": occ,
                             "accuracy": f.positive_rate()})
        return pd.DataFrame(rows)

    key_cols = [c for c in states.columns
                if c not in ("state", "n_items", "n_partials")]
    return (states.withColumn("_i", info(F.col("state")))
            .select(*key_cols, "_i.kind", "_i.params", "_i.fill_metric",
                    "_i.accuracy"))


def quantiles(states: DataFrame, qs: list[float],
              out_col: str = "quantile_value") -> DataFrame:
    """[key?, state, ...] → exploded [key?, q, quantile_value] for
    t-digest (GSKQ) or KLL (GSKL) states."""
    from pyspark.sql.types import DoubleType, StructField, StructType
    from gostatix_spark.kernels import kll as kll_k
    from gostatix_spark.kernels import tdigest as td_k

    result_t = ArrayType(StructType([
        StructField("q", DoubleType()), StructField(out_col, DoubleType())]))

    @F.pandas_udf(result_t)
    def qf(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            b = bytes(b)
            if b[:4] == td_k.MAGIC:
                m, w, _, _ = td_k.from_bytes(b)
                vals = td_k.quantile(m, w, qs)
            else:
                vals = kll_k.KLL.from_bytes(b).quantile(qs)
            out.append([{"q": float(q), out_col: float(v)}
                        for q, v in zip(qs, vals)])
        return pd.Series(out)

    key_cols = [c for c in states.columns
                if c not in ("state", "n_items", "n_partials")]
    return (states.withColumn("_q", F.explode(qf(F.col("state"))))
            .select(*key_cols, "_q.q", f"_q.{out_col}"))


# ---------------------------------------------------------------------------
# probe-side: broadcast state, test a big column
# ---------------------------------------------------------------------------


def bloom_contains(spark: SparkSession, state_blob: bytes, col: Column,
                   element: str) -> Column:
    """Vectorized membership predicate column against a broadcast Bloom
    state — the distributed analog of ``Lookup`` (``bloom_filter.go:188``).
    Use it to prefilter semi/anti joins; no false negatives."""
    bc = spark.sparkContext.broadcast(bytes(state_blob))

    @F.pandas_udf(BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        st: BloomState = sketch_from_bytes(bc.value)
        h1, h2 = _hash_pd(s, element, "metro")
        return pd.Series(bloom.lookup_batch(st.words, h1, h2, st.k, st.m))

    return probe(col)


def _shard_mapping(shard_states, n_shards: int | None) -> list[bytes]:
    """Normalize/validate a shard→state mapping. Accepts a dict
    ``{shard_id: blob}`` (the safe form — build straight from
    ``cuckoo_build``/``bloom_build_sharded`` output rows, whose collect
    order is NOT shard order) or a list where index = shard id. Raises
    on missing shards: the builds emit a row per shard even when empty,
    so a gap means the caller dropped one — routing against a
    misaligned list would turn every probe into a silent false
    negative."""
    if isinstance(shard_states, dict):
        mapping = {int(k): bytes(v) for k, v in shard_states.items()}
    else:
        mapping = {i: bytes(b) for i, b in enumerate(shard_states)}
    if n_shards is None:
        n_shards = len(mapping)
    missing = sorted(set(range(n_shards)) - set(mapping))
    extra = sorted(set(mapping) - set(range(n_shards)))
    if missing or extra:
        raise ValueError(
            f"shard states do not cover 0..{n_shards - 1}: "
            f"missing={missing} unexpected={extra}")
    return [mapping[i] for i in range(n_shards)]


def cuckoo_contains(spark: SparkSession, shard_states, col: Column,
                    element: str, *, n_shards: int | None = None) -> Column:
    """Membership against a sharded cuckoo build: shard =
    ``shard_of(h1, n_shards)`` (the build's routing rule —
    :func:`gostatix_spark.agg.cuckoo_build`), probe the owning shard's
    buckets. ``shard_states``: dict ``{shard: blob}`` or list indexed
    by shard id; pass ``n_shards`` explicitly to validate against the
    build (``cuckoo_filter.go:118-125`` lookup semantics, no false
    negatives)."""
    blobs = _shard_mapping(shard_states, n_shards)
    bc = spark.sparkContext.broadcast(blobs)

    @F.pandas_udf(BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        blobs = bc.value
        filters = []
        for b in blobs:
            st: CuckooState = sketch_from_bytes(b)
            filters.append(cuckoo.CuckooFilter(
                st.size, st.bucket_size, st.fp_len, st.retries,
                buckets=st.buckets, length=st.length))
        h1, _ = _hash_pd(s, element, "murmur3")
        shard = hashing.shard_of(h1, len(blobs))
        out = np.zeros(len(s), dtype=bool)
        for i, f in enumerate(filters):
            sel = shard == i
            if sel.any():
                out[sel] = f.lookup_hashes(h1[sel])
        return pd.Series(out)

    return probe(col)


def bloom_contains_sharded(spark: SparkSession, shard_states, col: Column,
                           element: str, *,
                           n_shards: int | None = None) -> Column:
    """Membership against a sharded Bloom build
    (:func:`gostatix_spark.agg.bloom_build_sharded`): route each probe
    by ``shard_of(h1)``, test the owning shard's bit array. Same
    no-false-negative guarantee as the single-blob probe; each
    broadcast blob is 1/n_shards the size (on a real cluster the shard
    states can also stay as a small joined table instead of a
    broadcast)."""
    blobs = _shard_mapping(shard_states, n_shards)
    bc = spark.sparkContext.broadcast(blobs)

    @F.pandas_udf(BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        states = [sketch_from_bytes(b) for b in bc.value]
        h1, h2 = _hash_pd(s, element, "metro")
        shard = hashing.shard_of(h1, len(states))
        out = np.zeros(len(s), dtype=bool)
        for i, st in enumerate(states):
            sel = shard == i
            if sel.any():
                out[sel] = bloom.lookup_batch(st.words, h1[sel], h2[sel],
                                              st.k, st.m)
        return pd.Series(out)

    return probe(col)


def _probe_hashes_df(probes: DataFrame, value_col: str, element: str,
                     n_shards: int, algo: str) -> DataFrame:
    """[value_col, h1, shard] for a probe DataFrame (row-level element
    kinds only — each row is one probe)."""
    import pyarrow as pa
    from pyspark.sql.types import IntegerType

    from gostatix_spark.agg import _to_arrow_schema, extract_hashes

    schema = StructType([probes.schema[value_col],
                         StructField("h1", LongType(), False),
                         StructField("h2", LongType(), False),
                         StructField("shard", IntegerType(), False)])

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            h1, h2, rowmap = extract_hashes(batch.column(value_col),
                                            element, algo)
            if rowmap is not None:
                raise ValueError(
                    "probe joins need row-level element kinds")
            yield pa.RecordBatch.from_pydict(
                {value_col: batch.column(value_col),
                 "h1": pa.array(h1.astype(np.int64)),
                 "h2": pa.array(h2.astype(np.int64)),
                 "shard": pa.array(
                     hashing.shard_of(h1, n_shards).astype(np.int32))},
                schema=_to_arrow_schema(schema))

    return probes.select(value_col).mapInArrow(fn, schema)


def _contains_join(states: DataFrame, probes: DataFrame, value_col: str,
                   element: str, n_shards: int, algo: str,
                   lookup_fn, out_col: str) -> DataFrame:
    """Shared shard-routed membership join: probes shuffle (by shard)
    to wherever their owning shard's state row lands; a cogrouped
    applyInPandas runs the vectorized lookup. This is the probe path
    for filter sets too large to broadcast (e.g. 4096 cuckoo shards ×
    GBs): each task holds ONE shard's state + its probes, nothing is
    collected or broadcast. Returns ``[value_col, out_col]``."""
    out_schema = StructType([probes.schema[value_col],
                             StructField(out_col, BooleanType(), False)])
    hashes = _probe_hashes_df(probes, value_col, element, n_shards, algo)

    def apply_fn(spdf: pd.DataFrame, ppdf: pd.DataFrame) -> pd.DataFrame:
        if not len(ppdf):
            return pd.DataFrame(columns=[value_col, out_col])
        if not len(spdf):
            # no state row for this shard: builds emit every shard, so
            # this means the states side was filtered — treat as empty
            # filter (nothing was inserted there)
            return pd.DataFrame({value_col: ppdf[value_col],
                                 out_col: np.zeros(len(ppdf), dtype=bool)})
        st = sketch_from_bytes(bytes(spdf["state"].iloc[0]))
        h1 = ppdf["h1"].to_numpy().astype(np.int64).view(np.uint64)
        h2 = ppdf["h2"].to_numpy().astype(np.int64).view(np.uint64)
        return pd.DataFrame({value_col: ppdf[value_col],
                             out_col: lookup_fn(st, h1, h2)})

    return (states.groupBy("shard")
            .cogroup(hashes.groupBy("shard"))
            .applyInPandas(apply_fn, out_schema))


def cuckoo_contains_join(states: DataFrame, probes: DataFrame,
                         value_col: str, *, n_shards: int,
                         element: str | None = None,
                         out_col: str = "contained") -> DataFrame:
    """Broadcast-free cuckoo membership: route probes to shards by the
    build's rule and look up inside a cogrouped task — the scale path
    past ~10 GB of total filter state where :func:`cuckoo_contains`'s
    broadcast stops being viable. ``states`` is raw
    :func:`gostatix_spark.agg.cuckoo_build` (or
    ``cuckoo_apply_removals``) output — never collected."""
    from gostatix_spark.agg import infer_element

    element = infer_element(probes, value_col, element)

    def lookup(st: CuckooState, h1, h2):
        f = cuckoo.CuckooFilter(st.size, st.bucket_size, st.fp_len,
                                st.retries, buckets=st.buckets,
                                length=st.length)
        return f.lookup_hashes(h1)

    return _contains_join(states, probes, value_col, element, n_shards,
                          "murmur3", lookup, out_col)


def bloom_contains_join(states: DataFrame, probes: DataFrame,
                        value_col: str, *, n_shards: int,
                        element: str | None = None,
                        out_col: str = "contained") -> DataFrame:
    """Broadcast-free sharded-bloom membership (see
    :func:`cuckoo_contains_join`); ``states`` is raw
    :func:`gostatix_spark.agg.bloom_build_sharded` output."""
    from gostatix_spark.agg import infer_element

    element = infer_element(probes, value_col, element)

    def lookup(st: BloomState, h1, h2):
        return bloom.lookup_batch(st.words, h1, h2, st.k, st.m)

    return _contains_join(states, probes, value_col, element, n_shards,
                          "metro", lookup, out_col)


def cms_count_col(spark: SparkSession, state_blob: bytes, col: Column,
                  element: str) -> Column:
    """Per-row CMS frequency estimate column against a broadcast state
    (``count_min_sketch.go:76-92`` vectorized)."""
    bc = spark.sparkContext.broadcast(bytes(state_blob))

    @F.pandas_udf(LongType())
    def probe(s: pd.Series) -> pd.Series:
        st: CMSState = sketch_from_bytes(bc.value)
        h1, h2 = _hash_pd(s, element, "metro")
        return pd.Series(cms.query_batch(st.matrix, h1, h2).astype(np.int64))

    return probe(col)
