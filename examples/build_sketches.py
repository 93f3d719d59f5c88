"""spark-submit entry point: build sketches over a table of pre-tokenized
training sequences and persist the sketch table (north-rule deployment
path).

Package the library and submit:

    zip -r gostatix_spark.zip gostatix_spark
    spark-submit \
        --py-files gostatix_spark.zip \
        examples/build_sketches.py \
        --input  my_catalog.corpus.sequences \
        --kind   hll --value-col tokens --key-col source \
        --params m=16384 \
        --out    s3://bucket/sketches/hll_by_source \
        --checkpoint s3://bucket/sketches/_cp

``--input`` accepts an Iceberg/Hive catalog table name or a parquet
path (``sources.read_table`` resolves). ``--checkpoint`` enables
resumable phase-1 with per-partition lineage: re-submitting after an
executor/job loss recomputes only missing partitions. The cluster's
``spark-submit`` provides master/executor config; nothing here assumes
local mode.
"""

from __future__ import annotations

import argparse


def _parse_params(s: str | None) -> dict:
    """'m=16384,eps=0.01' → {'m': 16384, 'eps': 0.01} (int/float/str)."""
    out: dict = {}
    if not s:
        return out
    for kv in s.split(","):
        k, _, v = kv.partition("=")
        for cast in (int, float):
            try:
                out[k.strip()] = cast(v)
                break
            except ValueError:
                continue
        else:
            out[k.strip()] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="catalog table (catalog.db.table) or parquet path")
    ap.add_argument("--kind", required=True,
                    choices=["hll", "cms", "bloom", "topk", "tdigest",
                             "kll", "cuckoo"])
    ap.add_argument("--value-col", required=True)
    ap.add_argument("--key-col", default=None)
    ap.add_argument("--element", default=None,
                    help="tokens|token_array|int32|int64|string|binary "
                         "(inferred from the column type when omitted)")
    ap.add_argument("--params", default=None,
                    help="comma-separated sketch params, e.g. m=16384 or "
                         "eps=0.001,fail_prob=0.01")
    ap.add_argument("--out", required=True, help="sketch-table output path")
    ap.add_argument("--checkpoint", default=None,
                    help="enable resumable phase-1 (parquet path)")
    ap.add_argument("--n-shards", type=int, default=32,
                    help="cuckoo only: shard count")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from gostatix_spark.agg import cuckoo_build, sketch_agg
    from gostatix_spark.checkpoint import checkpointed_sketch_agg
    from gostatix_spark.sources import read_table, save_sketches

    spark = SparkSession.builder.appName(
        f"gostatix-build-{args.kind}").getOrCreate()
    df = read_table(spark, args.input)
    params = _parse_params(args.params)

    if args.kind == "cuckoo" and args.checkpoint:
        # the cuckoo build is not checkpoint-resumable (order-dependent
        # kick loop — no mergeable partials to checkpoint); failing here
        # beats silently handing back a non-resumable 100 TB build
        ap.error("--checkpoint is not supported with --kind cuckoo")
    if args.kind == "cuckoo":
        states = cuckoo_build(df, args.value_col, key_col=args.key_col,
                              element=args.element, n_shards=args.n_shards,
                              **params)
    elif args.checkpoint:
        states = checkpointed_sketch_agg(
            df, args.kind, args.value_col, checkpoint_path=args.checkpoint,
            key_col=args.key_col, element=args.element, **params)
    else:
        states = sketch_agg(df, args.kind, args.value_col,
                            key_col=args.key_col, element=args.element,
                            **params)

    save_sketches(states, args.out, kind=args.kind, source_ref=args.input)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} sketch rows to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
