"""Deterministic sampling, split assignment, and data ordering for
training-data pipelines.

A 100-TB corpus can't be sampled with ``rand()`` — resumed/retried
tasks would redraw, executors disagree, and yesterday's sample can't
be reproduced for an ablation. Every operator here derives its
randomness from ``md5(id ∥ salt)`` instead:

* fully deterministic — same input, same salt ⇒ same output, on any
  cluster size, any retry, any engine (md5 is engine-independent, so
  DuckDB oracles these operators EXACTLY);
* shuffle-free — a narrow projection + filter; Catalyst pushes the
  filter to the scan, and at 1000 executors each task decides its own
  rows with zero coordination;
* composable — independent decisions come from different salts, and
  the train/val/test assignment is a single consistent partition of
  the id space (an id can never land in two splits).

The uniform variate is the first 8 hex chars of the md5 compared
against a hex threshold STRING: lowercase-hex string order equals
numeric order, so no numeric conversion (and no engine-specific
hex-parse builtin) is involved.

The reference has no sampling surface — this extends the engine for
the LLM-training-pipeline brief (dedup → quality filter → SAMPLE →
mix → pack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_uniform_hex", "hex_threshold", "deterministic_sample",
           "assign_split", "stratified_sample", "deterministic_order",
           "reservoir_sample", "token_shards"]

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars ⇒ 2^32 buckets


def hex_threshold(fraction: float) -> str:
    """``fraction`` ∈ [0, 1] as an 8-char lowercase hex bound: a row
    passes iff its :func:`hash_uniform_hex` is lexicographically below
    this. Quantization error ≤ 2⁻³² of the population. fraction = 1
    returns ``"g"`` — a string sorting after every hex digit, so the
    comparison stays a plain (engine-portable) string compare; the
    9-char ``"100000000"`` would sort BEFORE e.g. ``"2a…"``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * _HEX_SPACE)
    if v >= _HEX_SPACE:
        return "g"
    return format(v, "08x")


def hash_uniform_hex(id_col, salt: str = "") -> Column:
    """The first 8 lowercase-hex chars of ``md5(id ∥ salt)`` — a
    uniform draw on 2³² buckets, keyed only by the row's id. Different
    salts give independent draws from the same id."""
    return F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                      F.lit(salt))), 1, 8)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash. Reproducible on
    any cluster/retry; a row's fate never depends on other rows, so
    the sample composes with any partitioning. Narrow (no shuffle)."""
    return df.where(hash_uniform_hex(id_col, salt) <
                    F.lit(hex_threshold(fraction)))


def assign_split(df: DataFrame, id_col: str,
                 splits: dict[str, float] | None = None,
                 salt: str = "split",
                 out_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …)
    by partitioning the hash space with cumulative thresholds —
    deterministic, disjoint, exhaustive. ``splits`` maps name →
    fraction and must sum to 1 (±1e-9); iteration order fixes which
    end of the hash space each split owns, so pass an ordered dict
    (python dicts are) and keep it stable across runs."""
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_uniform_hex(id_col, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict, default: float = 0.0,
                      salt: str = "strata") -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` analog):
    ``fractions`` maps stratum value → keep-fraction. This is how a
    training mix is weighted (e.g. keep 100% of books, 10% of
    crawl). Implemented as a CASE over broadcast-small literals — one
    narrow pass, no shuffle, no join. Rows whose stratum is NULL or
    unlisted get the ``default`` rate (the coalesce below: a NULL
    stratum must not silently vanish when default > 0)."""
    u = hash_uniform_hex(id_col, salt)
    expr = None
    for val, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(val)) & \
            (u < F.lit(hex_threshold(frac)))
        expr = cond if expr is None else expr | cond
    base = u < F.lit(hex_threshold(default))
    unlisted = F.coalesce(~F.col(strata_col).isin(list(fractions)),
                          F.lit(True))
    expr = base if expr is None else expr | (unlisted & base)
    return df.where(expr)


def reservoir_sample(df: DataFrame, id_col: str, k: int,
                     salt: str = "reservoir") -> DataFrame:
    """EXACT-size uniform sample: the k rows with the smallest
    ``md5(id ∥ salt)`` priority — the deterministic equivalent of a
    distributed reservoir (every size-k subset equally likely under
    the hash's uniformity, same k rows on any cluster/retry/engine).
    Spark executes ``ORDER BY priority LIMIT k`` as
    TakeOrderedAndProject: a per-partition top-k then a driver-side
    k-merge — no global sort, no full shuffle."""
    pri = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (df.withColumn("_pri", pri)
            .orderBy("_pri").limit(k).drop("_pri"))


def token_shards(df: DataFrame, id_col: str, tok_col: str,
                 budget: int, salt: str = "order",
                 out_col: str = "shard",
                 part_hex_chars: int = 0,
                 part_col: str = "part") -> DataFrame:
    """Assign documents to fixed-token-budget shards: documents are
    laid out in the deterministic-shuffle order (md5 of id — see
    :func:`deterministic_order`) and sharded at every ``budget``-token
    boundary of the running total, i.e. ``shard = floor((cumulative
    tokens − own tokens) / budget)``. This is token-offset sharding —
    the way a training run splits a corpus into equal-work units
    (shards differ by at most one document's tokens from the budget),
    and it is exactly reproducible anywhere (a window cumsum over a
    deterministic order — the DuckDB oracle recomputes it verbatim).

    ``part_hex_chars > 0`` is the AT-SCALE shape: the order key's
    first N hex chars become a partition column (16^N groups) and the
    cumsum windows WITHIN each partition — a hash shuffle plus
    parallel per-group sorts instead of one global sort. Shard ids
    are then per-(part); output gains ``part_col``. A global window
    (``part_hex_chars=0``) range-shuffles into a single ordering —
    fine to ~10⁹ rows, serial beyond."""
    from pyspark.sql import Window
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    if part_hex_chars > 0:
        part = F.substring(key, 1, part_hex_chars)
        w = Window.partitionBy(part).orderBy(key) \
            .rowsBetween(Window.unboundedPreceding, -1)
        prev = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
        return (df.withColumn(part_col, part)
                .withColumn(out_col,
                            F.floor(prev / F.lit(budget)).cast("int")))
    w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
    prev = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    return df.withColumn(
        out_col, F.floor(prev / F.lit(budget)).cast("int"))


def deterministic_order(df: DataFrame, id_col: str,
                        salt: str = "order",
                        out_col: str = "shuffle_key") -> DataFrame:
    """Attach a reproducible global-shuffle key (the full md5 hex —
    collision-free for practical purposes): ``ORDER BY shuffle_key``
    is the same pseudo-random training order on every engine and every
    run. At scale, write with
    ``df.repartitionByRange(n, out_col).sortWithinPartitions(out_col)``
    — a single range-shuffle produces globally ordered output files."""
    return df.withColumn(
        out_col, F.md5(F.concat(F.col(id_col).cast("string"),
                                F.lit(salt))))
