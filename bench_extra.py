"""Per-query isolation bench (guide §1.4): times each named query with
the noop sink so the computation is measured, not the sink, inside ONE
warmed session — the per-query complement of the frozen bench.py.

    python bench_extra.py [query ...]        # default: all queries
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py
    BENCH_EXTRA_REPS=N     best-of-N per query (default 1)
    BENCH_EXTRA_SINK=count|noop  count mirrors bench.py's timed action
                           (default); noop computes every column (§1.4)
    BENCH_EXTRA_OUT=path   JSON detail file (default BENCH/bench_extra_latest.json)

Prints one JSON line {"queries": {name: sec}, "value": total}.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "1"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from gostatix_spark.session import get_spark

    names = sys.argv[1:] or list(entrymod.queries())
    qfns = entrymod.queries()

    spark = get_spark("bench-extra", cores=cores)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    entrymod.q_hll_users(spark, sf_dir).count()
    spark.catalog.clearCache()

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = qfns[name]
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if os.environ.get("BENCH_EXTRA_SINK", "count") == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            timings.setdefault(name, []).append(round(dt, 3))
            spark.catalog.clearCache()
        print(f"#   {name}: {min(timings[name]):.2f}s "
              f"(all: {timings[name]})", flush=True)
    spark.stop()

    best = {n: min(ts) for n, ts in timings.items()}
    out = {"metric": "per-query noop-sink wall (best of "
                     f"{reps})", "unit": "sec",
           "value": round(sum(best.values()), 3), "queries": best,
           "samples": timings, "sf": sf_dir.rstrip("/").split("sf")[-1]}
    path = os.environ.get("BENCH_EXTRA_OUT", "BENCH/bench_extra_latest.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "queries", "sf")}),
          flush=True)


if __name__ == "__main__":
    main()
