"""Streaming: incremental sketch maintenance must equal the batch build
(merge laws make micro-batch boundaries invisible)."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from gostatix_spark.agg import sketch_agg
from gostatix_spark.corpus import corpus_df
from gostatix_spark.state import sketch_from_bytes
from gostatix_spark.streaming import sketch_stream_query


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
               for r in spark.read.parquet(f"{tmp}/state/current").collect()}
        assert set(got) == set(want)
        for s in want:
            assert got[s].equals(want[s]), s
