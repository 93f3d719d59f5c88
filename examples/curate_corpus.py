"""spark-submit entry point: end-to-end training-corpus curation —
the pipeline a 100 TB pretraining build runs, composed entirely from
this library's operators:

1. exact dedup (md5 hash-agg — one shuffle, pure JVM);
2. near-dedup via MinHash+LSH (banded candidates, inline signature
   prefilter, exact-Jaccard verify) → connected components
   (large/small-star) → keep the min-id canonical doc per duplicate
   cluster;
3. quality filter (JVM expressions: stopword/punct ratios, length);
4. weighted source mix (deterministic md5 draws — reproducible on any
   cluster size / retry, zero shuffle);
5. train/val/test split assignment (disjoint + exhaustive partition
   of the md5 hash space);
6. token-budget sharding of the train split (hash-prefix-partitioned
   running-token windows) and a partitioned parquet write.

Submit:

    zip -r gostatix_spark.zip gostatix_spark
    spark-submit --py-files gostatix_spark.zip \
        examples/curate_corpus.py \
        --input  s3://bucket/raw_documents \
        --out    s3://bucket/curated \
        --near-dup-threshold 0.85 --budget 1048576 \
        --mix "web=0.5,books=1.0" --mix-default 0.25

Every stage is deterministic, so re-running the job over the same
input produces byte-identical output — the property that makes a
curated-corpus rebuild auditable.
"""

from __future__ import annotations

import argparse


def _parse_mix(s: str | None) -> dict:
    if not s:
        return {}
    out = {}
    for kv in s.split(","):
        k, _, v = kv.partition("=")
        out[k.strip()] = float(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="catalog table or parquet path of [doc_id, source, text]")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--near-dup-threshold", type=float, default=0.85)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--max-stopword-ratio", type=float, default=0.8)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.03)
    ap.add_argument("--mix", default="",
                    help="per-source keep fractions, e.g. 'web=0.5,books=1.0'")
    ap.add_argument("--mix-default", type=float, default=1.0)
    ap.add_argument("--splits", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--budget", type=int, default=1 << 20,
                    help="tokens per train shard")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from gostatix_spark import dedup, sampling, textstats
    from gostatix_spark.sources import read_table

    spark = SparkSession.builder.appName("curate-corpus").getOrCreate()
    docs = read_table(spark, args.input)
    id_c, txt_c = args.id_col, args.text_col

    # 1. exact dedup: keep the min-id representative of each text
    keepers = dedup.exact_dedup(docs, txt_c, id_c) \
        .select(F.col("keep_id").alias(id_c))
    docs = docs.join(keepers, id_c, "left_semi")

    # 2. near-dedup: verified near-pairs → connected components →
    # keep ONE canonical doc (the min id) per duplicate cluster.
    # Cluster-canonical beats per-pair drops: with a chain A~B, B~C
    # the pairwise rule deletes both B and C, over-deleting when only
    # the chain links are near-dups; CC keeps exactly one survivor
    # per transitive group. Pairs and CC edges shuffle only ids.
    pairs = dedup.minhash_dedup_pairs(docs, txt_c, id_c,
                                      threshold=args.near_dup_threshold)
    cc = dedup.connected_components(pairs, "id_a", "id_b")
    losers = cc.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_c))
    docs = docs.join(losers, id_c, "left_anti")

    # 3. quality gate (all JVM expressions — no Python in the scan)
    q = textstats.quality_features(docs, txt_c, id_c)
    keep = q.where(
        (F.col("n_words") >= args.min_words)
        & F.col("stopword_ratio").between(args.min_stopword_ratio,
                                          args.max_stopword_ratio)
    ).select(id_c)
    docs = docs.join(keep, id_c, "left_semi")

    # 4. weighted source mix (deterministic, shuffle-free)
    mix = _parse_mix(args.mix)
    if mix or args.mix_default < 1.0:
        docs = sampling.stratified_sample(docs, id_c, args.source_col,
                                          mix, default=args.mix_default)

    # 5. split assignment
    splits = {k: float(v) for k, _, v in
              (kv.partition("=") for kv in args.splits.split(","))}
    docs = sampling.assign_split(docs, id_c, splits)

    # 6. token-budget shards for the train split; val/test pass through
    docs = docs.withColumn("n_tok", F.size(F.split(F.col(txt_c), " ")))
    train = sampling.token_shards(
        docs.where(F.col("split") == "train"), id_c, "n_tok",
        budget=args.budget, part_hex_chars=2)
    rest = docs.where(F.col("split") != "train") \
        .withColumn("part", F.lit("-")).withColumn("shard", F.lit(0))
    out = train.unionByName(rest)
    (out.repartition("split", "part")
        .write.mode("overwrite").partitionBy("split")
        .parquet(args.out))

    n = spark.read.parquet(args.out).count()
    print(f"curated corpus written: {n} documents → {args.out}")


if __name__ == "__main__":
    main()
