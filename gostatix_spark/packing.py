"""Vocabulary construction, token encoding, and sequence packing —
the last mile of an LLM training-data pipeline (dedup → filter →
sample → mix → ENCODE → PACK).

The reference engine has no tokenization surface (its unit tests feed
pre-made strings — e.g. ``bloom_filter_test.go``'s word lists); these
operators extend the engine for the training-pipeline brief the same
way ``sampling.py`` does, and share its design rules:

* **deterministic** — token ids come from a total order
  ``(count DESC, token ASC)``; pack layout comes from the same
  ``md5(id ∥ salt)`` order ``sampling.deterministic_order`` uses, so
  the identical corpus encodes and packs identically on any cluster
  size, any retry, any engine (every operator here has a row-exact
  DuckDB oracle in ``__spark_entry__``);
* **JVM-side** — explode / broadcast-join / groupBy / higher-order
  array expressions; no per-row Python anywhere;
* **scale-shaped** — the only unavoidable big shuffle is the
  per-token explode that materializing packs genuinely requires
  (one row per token, doc-keyed or pack-keyed — no global hotspot);
  vocabulary ranking shrinks the data BEFORE any global step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["build_vocab", "encode_tokens", "decode_tokens",
           "pack_sequences"]


def build_vocab(df: DataFrame, text_col: str,
                vocab_size: int | None = None,
                min_count: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary over whitespace tokens:
    ``(token, count, token_id)`` with ``token_id`` = dense 0-based
    rank under the total order ``(count DESC, token ASC)`` — the
    deterministic tie-break makes the id assignment reproducible
    across engines and runs (a count-only order would leave equal-
    count tokens to shuffle nondeterminism).

    Scale shape: the token count is a two-phase hash aggregation
    (map-side partial combine — the shuffle carries one row per
    distinct token per partition, not per occurrence). When
    ``vocab_size`` is set, the global order is taken with
    ``ORDER BY … LIMIT V`` — Spark executes TakeOrderedAndProject
    (per-partition top-V, driver k-merge), never a full sort of the
    distinct-token table. The final ``row_number`` window then runs
    over only the V surviving rows (vocabularies are bounded — 32k to
    a few M ids — so a single-partition window over V rows is
    driver-scale by construction, while the corpus-scale work stayed
    distributed). Without ``vocab_size`` the window sorts the full
    distinct-token table — fine to ~10⁸ distinct tokens, documented
    serial beyond.
    """
    wc = (df.select(F.explode(F.split(F.col(text_col), " "))
                    .alias("token"))
            .groupBy("token").agg(F.count("*").alias("count")))
    if min_count > 1:
        wc = wc.where(F.col("count") >= min_count)
    order = [F.col("count").desc(), F.col("token").asc()]
    if vocab_size is not None:
        wc = wc.orderBy(*order).limit(vocab_size)
    w = Window.orderBy(*order)
    return wc.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int"))


def encode_tokens(df: DataFrame, id_col: str, text_col: str,
                  vocab: DataFrame, unk_id: int = -1,
                  out_col: str = "token_ids") -> DataFrame:
    """Encode each document's whitespace tokens to ids via ``vocab``
    (a :func:`build_vocab` result — columns ``token``, ``token_id``);
    out-of-vocabulary tokens become ``unk_id``. Returns
    ``(id_col, out_col: array<int>, n_tok, n_unk)``.

    Scale shape: posexplode (one row per token, carries its position),
    BROADCAST left join against the vocab — a vocabulary is MBs even
    at millions of ids, so the join is map-side with zero shuffle —
    then one doc-keyed aggregation reassembles the array in position
    order via ``array_sort(collect_list(struct(pos, id)))`` (a
    higher-order expression, not a Python sort). Per-group state is
    one document's ids; no key aggregates across documents.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " "))
         .alias("__pos", "__token"))
    joined = tok.join(F.broadcast(
        vocab.select(F.col("token").alias("__token"), "token_id")),
        "__token", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("int")
    return (joined.select(F.col(id_col), F.col("__pos"),
                          tid.alias("__tid"))
            .groupBy(id_col)
            .agg(F.expr("transform(array_sort(collect_list("
                        "struct(__pos, __tid))), x -> x.__tid)")
                 .alias(out_col),
                 F.count("*").cast("long").alias("n_tok"),
                 F.sum(F.when(F.col("__tid") == unk_id, 1).otherwise(0))
                  .cast("long").alias("n_unk")))


def decode_tokens(df: DataFrame, id_col: str, ids_col: str,
                  vocab: DataFrame, unk_token: str = "<unk>",
                  out_col: str = "text") -> DataFrame:
    """Inverse of :func:`encode_tokens`: map each document's id array
    back to its whitespace-joined token string via ``vocab`` (columns
    ``token``, ``token_id``); ids with no vocab row — the ``unk_id``
    sentinel, or any stale id after a vocab rebuild — decode to
    ``unk_token``. Returns ``(id_col, out_col, n_tok, n_unk)``.
    Round trip: ``decode(encode(text))`` equals ``text`` with every
    out-of-vocabulary word replaced by ``unk_token`` (exact identity
    only for a FULL vocab — ``vocab_size=None`` AND ``min_count=1``;
    either truncation drops tokens and breaks the identity) —
    property-tested and oracled. Internal aliases are ``__``-prefixed
    so an ``id_col`` named e.g. ``pos`` or ``token`` cannot collide.
    A document whose id array is empty or null produces no output row
    (posexplode emits nothing); :func:`encode_tokens` never emits an
    empty array, so this only concerns externally-produced inputs —
    left-join the result back onto the input to keep such rows.

    Scale shape mirrors the encoder: posexplode carries each id's
    position, the vocab joins BROADCAST (map-side, zero shuffle), and
    one doc-keyed aggregation reassembles the string in position order
    through ``array_join(transform(array_sort(collect_list(...))))`` —
    higher-order expressions end to end, no per-row Python.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.col(ids_col)).alias("__pos", "__tid"))
    joined = tok.join(
        F.broadcast(vocab.select(F.col("token_id").alias("__tid"),
                                 F.col("token").alias("__token"))),
        "__tid", "left")
    word = F.coalesce(F.col("__token"), F.lit(unk_token))
    return (joined.select(F.col(id_col), F.col("__pos"),
                          word.alias("__w"),
                          F.col("__token").isNull().alias("__unk"))
            .groupBy(id_col)
            .agg(F.expr("array_join(transform(array_sort(collect_list("
                        "struct(__pos, __w))), x -> x.__w), ' ')")
                  .alias(out_col),
                 F.count("*").cast("long").alias("n_tok"),
                 F.sum(F.col("__unk").cast("int")).cast("long")
                  .alias("n_unk")))


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   seq_len: int, salt: str = "order",
                   part_hex_chars: int = 0,
                   with_tokens: bool = False) -> DataFrame:
    """GPT-style sequence packing: lay the corpus out in the
    deterministic-shuffle order (``md5(id ∥ salt)`` — the same order
    ``sampling.deterministic_order`` / ``token_shards`` use), concat
    all tokens, and cut the stream into fixed ``seq_len``-token packs;
    documents straddle pack boundaries (no padding waste). Returns one
    row per pack: ``(part, pack, n_tok, n_docs, fingerprint)`` where
    ``fingerprint`` is the md5 of the pack's tokens joined in stream
    order — the content-exact check a row-count alone can't give.
    ``with_tokens=True`` adds the materialized ``tokens`` array.

    Scale shape (mirrors ``token_shards``): each document's global
    token offset is an exclusive prefix sum of ``n_tok`` over the
    order key — with ``part_hex_chars = N > 0`` the cumsum windows
    within 16^N hash-prefix partitions (a hash shuffle + parallel
    per-group sorts; packs are then per-part and the stream restarts
    at part edges), with 0 a single range-shuffled global ordering
    (fine to ~10⁹ docs, serial beyond). Tokens then posexplode —
    one row per token, the honest cost of materializing packs —
    straight into a pack-keyed aggregation whose per-group state is
    bounded by ``seq_len``. Every step is a built-in expression;
    the plan is two shuffles (offset window, pack groupBy) past the
    explode, nothing quadratic, no Python.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    base = df.select(F.col(id_col), key.alias("k"),
                     F.split(F.col(text_col), " ").alias("ws"))
    if part_hex_chars > 0:
        base = base.withColumn("part",
                               F.substring(F.col("k"), 1, part_hex_chars))
    else:
        base = base.withColumn("part", F.lit(""))
    w = (Window.partitionBy("part").orderBy("k")
         .rowsBetween(Window.unboundedPreceding, -1))
    off = base.withColumn(
        "off", F.coalesce(F.sum(F.size("ws")).over(w), F.lit(0)))
    tok = off.select(
        "part", F.col(id_col), "off",
        F.posexplode("ws").alias("pos", "word"))
    tok = tok.withColumn("gpos", F.col("off") + F.col("pos"))
    tok = tok.withColumn(
        "pack", F.floor(F.col("gpos") / F.lit(seq_len)).cast("int"))
    aggs = [
        F.count("*").cast("long").alias("n_tok"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.md5(F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(gpos, word))), x -> x.word), ' ')"))
         .alias("fingerprint"),
    ]
    if with_tokens:
        aggs.append(F.expr(
            "transform(array_sort(collect_list(struct(gpos, word))),"
            " x -> x.word)").alias("tokens"))
    return tok.groupBy("part", "pack").agg(*aggs)
