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
