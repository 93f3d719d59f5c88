"""Physical-plan regression tests — the scale properties SCALE.md
claims must stay true as the code evolves:

* a sketch build has exactly ONE Exchange (the tiny partial-state
  shuffle) and a column-pruned scan;
* the ANN query broadcasts the query side and pushes the top-k rank
  limit down (WindowGroupLimit);
* a bloom probe is an Arrow-batched filter over a pruned scan.
"""

import re

import pytest
from pyspark.sql import functions as F

from gostatix_spark.agg import sketch_agg
from gostatix_spark.query import bloom_contains
from gostatix_spark.similarity import brute_force_topk

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sketch_agg_single_exchange(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    states = sketch_agg(events, "hll", "user_id", key_col="event_type", m=1024)
    plan = _plan(states)
    assert plan.count("Exchange") == 1, plan
    assert "MapInArrow" in plan and "FlatMapGroupsInPandas" in plan
    # column pruning: the scan reads only the two referenced columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
        == {"user_id", "event_type"}


def test_ann_broadcast_and_windowgrouplimit(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(2).select(F.col("vec_id").alias("q_id"),
                            F.col("embedding").alias("q_vec"))
    plan = _plan(brute_force_topk(emb, q, k=3))
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan  # top-k pushed below the exchange


def test_bloom_probe_pruned_scan(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    states = sketch_agg(cust, "bloom", "c_custkey", n=2000, eps=0.01)
    blob = bytes(states.collect()[0]["state"])
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    probe = orders.select("o_orderkey", "o_custkey").where(
        bloom_contains(spark, blob, F.col("o_custkey"), "int64"))
    plan = _plan(probe)
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
        == {"o_orderkey", "o_custkey"}


def test_exact_dedup_stays_jvm(spark):
    from gostatix_spark.dedup import exact_dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_dedup(docs, "text", "doc_id"))
    assert "Python" not in plan  # pure JVM: project + hash aggregate
    assert "HashAggregate" in plan


def test_bloom_sharded_single_exchange(spark):
    """The sharded bloom build keeps the two-phase shape: one pass over
    the data (MapInArrow emits n_shards partial rows per partition),
    ONE Exchange of those tiny rows, per-shard merge."""
    from gostatix_spark.agg import bloom_build_sharded
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    states = bloom_build_sharded(docs, "doc_id", n=5000, eps=0.01,
                                 n_shards=8)
    plan = _plan(states)
    assert plan.count("Exchange") == 1, plan
    assert "MapInArrow" in plan and "FlatMapGroupsInPandas" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
        == {"doc_id"}


def test_cuckoo_removals_cogroup_no_extra_exchange(spark):
    """Build + removals: each side shuffles once to its (shard) group;
    the cogrouped apply adds no further Exchange, and no element-sized
    collect appears (everything stays as DataFrame ops)."""
    from gostatix_spark.agg import cuckoo_apply_removals, cuckoo_build
    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    states = cuckoo_build(supp, "s_suppkey", n_shards=4, eps=0.01)
    removals = supp.where("s_suppkey % 2 = 0").select("s_suppkey")
    after = cuckoo_apply_removals(states, removals, "s_suppkey", n_shards=4)
    plan = _plan(after)
    # one Exchange per cogroup side for the states (build: hashes →
    # shard groups) and one for the removal hashes
    assert "FlatMapCoGroupsInPandas" in plan
    assert plan.count("Exchange") <= 3, plan
