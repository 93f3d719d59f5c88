"""Streaming: incremental sketch maintenance must equal the batch build
(merge laws make micro-batch boundaries invisible), stay distributed
(no driver-side merge), and be idempotent under foreachBatch's
at-least-once replay."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from gostatix_spark.agg import sketch_agg
from gostatix_spark.corpus import corpus_df
from gostatix_spark.state import sketch_from_bytes
from gostatix_spark.streaming import (incremental_sketch_sink,
                                      load_sketch_state,
                                      sketch_stream_query)


def test_stream_equals_batch(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        corpus = corpus_df(spark, 1000, seed=3, partitions=4)
        corpus.write.parquet(src)

        batch_states = sketch_agg(spark.read.parquet(src), "hll", "tokens",
                                  key_col="source", m=512)
        want = {r["source"]: sketch_from_bytes(bytes(r["state"]))
                for r in batch_states.collect()}

        stream = (spark.readStream.schema(corpus.schema)
                  .option("maxFilesPerTrigger", 1)  # several micro-batches
                  .parquet(src))
        q = sketch_stream_query(stream, "hll", "tokens",
                                f"{tmp}/state", key_col="source", m=512)
        q.awaitTermination(120)

        got = {r["source"]: sketch_from_bytes(bytes(r["state"]))
               for r in load_sketch_state(spark, f"{tmp}/state").collect()}
        assert set(got) == set(want)
        for s in want:
            assert got[s].equals(want[s]), s


def test_fine_grained_keys_stream_equals_batch(spark):
    """≥1,000 distinct keys through the sink — the shape where a
    driver-side merge would bottleneck/OOM; the distributed sink with
    bucketed merge must still equal the batch build bytewise."""
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        df = (spark.range(20000)
              .select((F.col("id") % 1200).cast("string").alias("k"),
                      (F.col("id") * 2654435761 % 100000).alias("v")))
        df.repartition(4).write.parquet(src)
        stored = spark.read.parquet(src)

        want = {r["k"]: bytes(r["state"])
                for r in sketch_agg(stored, "hll", "v", key_col="k",
                                    m=256).collect()}

        stream = (spark.readStream.schema(stored.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src))
        q = sketch_stream_query(stream, "hll", "v", f"{tmp}/state",
                                key_col="k", m=256, merge_buckets=16)
        q.awaitTermination(180)

        got = {r["k"]: bytes(r["state"])
               for r in load_sketch_state(spark, f"{tmp}/state").collect()}
        assert set(got) == set(want)
        assert sum(got[k] != want[k] for k in want) == 0


def test_replayed_batch_is_not_double_counted(spark):
    """foreachBatch is at-least-once: a replayed (batch_id, data) pair
    must be a no-op. CMS is additive — double-folding a batch would
    double every count, so it is the sharpest detector."""
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        batch = spark.createDataFrame(
            [("a",)] * 10 + [("b",)] * 5, "item string")
        sink = incremental_sketch_sink("cms", "item", state,
                                       element="string", d=3, w=64)
        sink(batch, 0)
        first = bytes(load_sketch_state(spark, state).collect()[0]["state"])
        sink(batch, 0)   # exact replay — must be skipped
        replay = bytes(load_sketch_state(spark, state).collect()[0]["state"])
        assert replay == first
        sink(batch, 1)   # genuinely new batch — must fold
        second = sketch_from_bytes(
            bytes(load_sketch_state(spark, state).collect()[0]["state"]))
        assert second.all_sum == 2 * sketch_from_bytes(first).all_sum


def test_commit_is_versioned_and_pruned(spark):
    """Each commit lands in a NEW v=<n> dir with an atomic pointer flip
    (crash mid-write can't corrupt the readable state); old versions
    beyond the keep window are pruned."""
    import os
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        sink = incremental_sketch_sink("hll", "item", state,
                                       element="string", m=64)
        for i in range(4):
            sink(spark.createDataFrame([(f"x{i}",)], "item string"), i)
        versions = sorted(n for n in os.listdir(state) if n.startswith("v="))
        assert versions == ["v=3", "v=4"]  # keep_versions=2
        est = load_sketch_state(spark, state).collect()[0]
        assert est["n_items"] == 4
