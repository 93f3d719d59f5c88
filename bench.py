"""Benchmark harness.

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}``

Two workloads:

1. **driver queries** at ``$SPARK_GRAFT_SF_DIR`` (default
   /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` — per-query
   wall seconds.
2. **sketch-build throughput** (the BASELINE.json metric): one pass
   over the deterministic synthetic tokenized corpus building all five
   sketches, measured at N=8 and 4N=32 local cores on the SAME input
   and partitioning → tokens/sec at both + scaling efficiency
   (sandbox stand-in for N vs 4N executors per the driver protocol;
   see BENCH/BASELINE.md). Run with SPARK_GRAFT_SCALING=0 to skip.
"""

from __future__ import annotations

import json
import os
import time


def _run_driver_queries(sf_dir: str, cores: int) -> tuple[dict, float]:
    import __spark_entry__ as entrymod
    from gostatix_spark.session import get_spark

    spark = get_spark("bench-queries", cores=cores)
    # warm JVM + python workers so the first timed query isn't charged
    # the session spin-up
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    entrymod.q_hll_users(spark, sf_dir).count()
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"#   {name}: {dt:.2f}s ({n} rows)", flush=True)
    spark.stop()
    return timings, total


def _sketch_build_job(spark, corpus, n_docs: int) -> dict:
    """The measured job (BENCH/BASELINE.md protocol): ONE scan building
    the four mergeable sketches together (multi_sketch_agg) + the
    cuckoo shard build (its own scan — it shuffles element hashes)."""
    from gostatix_spark.agg import cuckoo_build, multi_sketch_agg

    from pyspark.sql import functions as F

    corpus = corpus.withColumn("n_tok_d", F.col("n_tok").cast("double"))
    t0 = time.perf_counter()
    states = multi_sketch_agg(corpus, [
        {"name": "hll", "kind": "hll", "value_col": "tokens",
         "key_col": "source", "params": {"m": 16384}},
        {"name": "cms", "kind": "cms", "value_col": "tokens",
         "key_col": "source", "params": {"eps": 0.001, "fail_prob": 0.01}},
        {"name": "bloom", "kind": "bloom", "value_col": "doc_id",
         "element": "string", "params": {"n": n_docs, "eps": 0.01}},
        {"name": "topk", "kind": "topk", "value_col": "tokens",
         "params": {"k": 100, "eps": 0.0001}},
        {"name": "tdigest", "kind": "tdigest", "value_col": "n_tok_d",
         "key_col": "source", "params": {}},
        {"name": "kll", "kind": "kll", "value_col": "n_tok_d",
         "key_col": "source", "params": {}},
    ])
    n_states = states.count()
    cuckoo_states = cuckoo_build(corpus, "doc_id", element="string",
                                 n_shards=32, eps=0.01, size=n_docs)
    n_states += cuckoo_states.count()
    return {"wall_sec": time.perf_counter() - t0, "n_states": n_states}


def _run_scaling(n_docs: int, partitions: int, seed: int = 42,
                 reps: int = 3) -> dict:
    """N vs 4N measurement (sandbox stand-in for two cluster sizes).

    Protocol (BENCH/BASELINE.md): identical materialized input files;
    split packing targets ~4 task waves per level (the runtime
    scheduling knob a cluster operator tunes per cluster size); warm
    scan first; median of ``reps`` runs per level. Default pair (2, 8):
    this VM's 32 'CPUs' are oversubscribed hyperthreads — a pure-CPU
    multiprocessing probe shows only 2.55× aggregate throughput from
    8→32 procs and even a no-op passthrough mapInArrow *degrades*
    beyond 8 workers, so 8 is the highest level at which ±4× scaling
    is physically observable. Override with SPARK_GRAFT_SCALING_PAIR.
    """
    import shutil
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from gostatix_spark.corpus import corpus_df
    from gostatix_spark.session import get_spark

    pair = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_PAIR", "2,8").split(",")]
    out = {}
    n_tokens = None
    tmp = tempfile.mkdtemp(prefix="gostatix_bench_")
    corpus_path = f"{tmp}/corpus"
    try:
        # materialize the deterministic corpus ONCE (the north rule's
        # input is a stored table; generation must not be measured)
        spark = get_spark("bench-gen", cores=32)
        corpus_df(spark, n_docs, seed=seed, partitions=partitions) \
            .write.mode("overwrite").parquet(corpus_path)
        input_bytes = sum(f.stat().st_size
                          for f in __import__("pathlib").Path(corpus_path)
                          .glob("*.parquet"))
        spark.stop()

        for cores in pair:
            mpb = max(16, int(input_bytes / (4 * cores) / (1 << 20)))
            spark = get_spark(f"bench-scaling-{cores}", cores=cores,
                              shuffle_partitions=max(32, cores),
                              max_partition_bytes=f"{mpb}m")
            corpus = spark.read.parquet(corpus_path)
            # warmup: full scan primes OS page cache + JVM; a small
            # untimed build primes the python workers' numpy path
            n_tokens = corpus.select(F.sum("n_tok")).collect()[0][0]
            _sketch_build_job(spark, corpus.limit(20000), 20000)
            walls = []
            for _ in range(reps):
                walls.append(_sketch_build_job(spark, corpus, n_docs)["wall_sec"])
            spark.stop()
            med = statistics.median(walls)
            out[f"tput_tokens_per_sec_c{cores}"] = round(n_tokens / med)
            out[f"wall_sec_c{cores}"] = round(med, 2)
            out[f"wall_runs_c{cores}"] = [round(w, 1) for w in walls]
            print(f"#   scaling cores={cores}: median {med:.1f}s over {walls} "
                  f"({n_tokens/med:.0f} tok/s)", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    lo, hi = pair
    out["n_tokens"] = int(n_tokens)
    out["n_docs"] = n_docs
    out["input_partitions"] = partitions
    out["pair"] = pair
    out[f"scaling_efficiency_{lo}_to_{hi}"] = round(
        (out[f"tput_tokens_per_sec_c{hi}"] / out[f"tput_tokens_per_sec_c{lo}"])
        / (hi / lo), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings, total = _run_driver_queries(sf_dir, cores)

    result = {
        "metric": "sketch+pipeline query suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
        parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "128"))
        result["scaling"] = _run_scaling(n_docs, parts)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
