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


def test_sampling_ops_shuffle_free_pruned(spark):
    """SCALE.md §5b: sample / split / stratified-mix decisions are
    narrow projections+filters — NO Exchange, NO Python in the plan,
    and the scan reads only the referenced columns."""
    from gostatix_spark import sampling
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df, cols in [
        (sampling.deterministic_sample(docs, "doc_id", 0.25)
         .select("doc_id"), {"doc_id"}),
        (sampling.assign_split(docs, "doc_id").select("doc_id", "split"),
         {"doc_id"}),
        (sampling.stratified_sample(docs, "doc_id", "source",
                                    {"src1": 0.5}, default=0.1)
         .select("doc_id", "source"), {"doc_id", "source"}),
    ]:
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
            == cols, plan


def test_token_shards_partitioned_window_single_exchange(spark):
    """The at-scale token_shards shape: ONE hash Exchange into the
    16^N partition groups, per-group sort + running window — no global
    sort, no range partitioning."""
    from gostatix_spark import sampling
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "n_tok", F.size(F.split("text", " ")))
    out = sampling.token_shards(docs, "doc_id", "n_tok", budget=1000,
                                part_hex_chars=1).select("doc_id", "shard")
    plan = _plan(out)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Window" in plan, plan


def test_reservoir_sample_take_ordered_no_global_sort(spark):
    """reservoir_sample must compile to TakeOrderedAndProject
    (per-partition top-k + driver k-merge), never a global Sort+
    Exchange(rangepartitioning)."""
    from gostatix_spark import sampling
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(sampling.reservoir_sample(docs, "doc_id", 100))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_hll_intersect_explicit_pairs_no_nested_loop(spark):
    """The pairs= scale path must compile to equi-joins — the default
    all-pairs BroadcastNestedLoopJoin is exactly what it replaces."""
    from gostatix_spark.query import hll_intersect_pairs
    events = spark.read.parquet(f"{SF}/events.parquet")
    states = sketch_agg(events, "hll", "user_id", key_col="event_type",
                        m=1024)
    pairs = spark.createDataFrame([("click", "view")],
                                  "key_a string, key_b string")
    plan = _plan(hll_intersect_pairs(states, "event_type", pairs=pairs))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # and the default path IS the (documented) nested-loop join
    plan_default = _plan(hll_intersect_pairs(states, "event_type"))
    assert "BroadcastNestedLoopJoin" in plan_default


def test_simhash_manku_single_join(spark):
    """The Manku scheme must be ONE self-join over exploded table keys,
    not C(8,2)=28 unioned plan-duplicated joins: exactly one join node
    and no Union in the physical plan."""
    from gostatix_spark import dedup
    sims = spark.createDataFrame(
        [(i, i * 2654435761 % (1 << 63)) for i in range(50)],
        "id long, simhash long")
    plan = _plan(dedup.simhash_manku_pairs(sims, max_hamming=6,
                                           eager=False))
    assert "Union" not in plan, plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan
