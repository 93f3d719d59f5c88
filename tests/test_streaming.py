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


def test_incremental_commit_touches_only_affected_buckets(spark):
    """Steady-state write amplification is O(touched buckets), not
    O(total state): a 1-key micro-batch into a 1,200-key state rewrites
    exactly ONE bucket dir; the other 31 buckets are carried forward by
    manifest reference (no data rewritten), and the merged state still
    equals the batch build bytewise."""
    import json
    import os
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        big = spark.range(1200).select(F.col("id").cast("string").alias("k"),
                                       F.col("id").alias("v"))
        sink = incremental_sketch_sink("hll", "v", state, key_col="k",
                                       m=64, n_state_buckets=32)
        sink(big, 0)
        sink(spark.createDataFrame([("42", 7)], "k string, v long"), 1)
        kb_dirs = [d for d in os.listdir(f"{state}/v=2")
                   if d.startswith("kb=")]
        assert len(kb_dirs) == 1
        with open(f"{state}/_LATEST") as f:
            ptr = json.load(f)
        v1_refs = [rel for rel in ptr["buckets"].values()
                   if rel.startswith("v=1/")]
        assert len(v1_refs) == 31  # untouched buckets not rewritten
        assert os.path.isdir(f"{state}/v=1")  # still referenced → kept
        got = {r["k"]: bytes(r["state"])
               for r in load_sketch_state(spark, state).collect()}
        both = big.unionByName(spark.createDataFrame([("42", 7)],
                                                     "k string, v long"))
        want = {r["k"]: bytes(r["state"])
                for r in sketch_agg(both, "hll", "v", key_col="k",
                                    m=64).collect()}
        assert got == want


def test_fresh_checkpoint_over_kept_state_fails_loudly(spark):
    """A restarted stream with a NEW checkpoint dir restarts batch ids
    at 0; silently treating that as a replay would drop real data —
    the sink must refuse instead (ADVICE round-2)."""
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        batch = spark.createDataFrame([("a",)], "item string")
        sink1 = incremental_sketch_sink("hll", "item", state,
                                        element="string", m=64,
                                        replay_scope="ckpt-A")
        sink1(batch, 0)
        sink1(batch, 0)  # same scope → silent replay skip
        sink2 = incremental_sketch_sink("hll", "item", state,
                                        element="string", m=64,
                                        replay_scope="ckpt-B")
        with pytest.raises(ValueError, match="fresh streaming checkpoint"):
            sink2(batch, 0)


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


def test_restart_with_different_bucket_count_fails_loudly(spark):
    """n_state_buckets is baked into the key→bucket mapping; a restart
    with a different count would read keys from the wrong (empty)
    bucket and duplicate their state — the sink must refuse (ADVICE
    round-3)."""
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        batch = spark.createDataFrame([("a", 1)], "k string, v long")
        sink16 = incremental_sketch_sink("hll", "v", state, key_col="k",
                                         m=64, n_state_buckets=16)
        sink16(batch, 0)
        sink8 = incremental_sketch_sink("hll", "v", state, key_col="k",
                                        m=64, n_state_buckets=8)
        with pytest.raises(ValueError, match="n_state_buckets=16"):
            sink8(batch, 1)


def test_legacy_pointer_shape_fails_with_actionable_message(spark):
    """A pre-manifest _LATEST (no 'buckets' key) must raise a ValueError
    explaining the state predates the bucketed layout — not a bare
    KeyError (ADVICE round-3)."""
    import json
    import os
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        os.makedirs(state)
        with open(f"{state}/_LATEST", "w") as f:
            json.dump({"version": 3, "batch_id": 7}, f)
        with pytest.raises(ValueError, match="bucketed state layout"):
            load_sketch_state(spark, state)
        sink = incremental_sketch_sink("hll", "item", state,
                                       element="string", m=64)
        batch = spark.createDataFrame([("a",)], "item string")
        with pytest.raises(ValueError, match="bucketed state layout"):
            sink(batch, 99)


class _MemStore:
    """Mock object store with compare-and-swap commit semantics — the
    contract a real S3 conditional-put / GCS generation-match
    implementation must satisfy."""

    def __init__(self):
        self.ptr = None
        self.commits = 0

    def read(self):
        return None if self.ptr is None else dict(self.ptr)

    def commit(self, ptr, expected_version):
        from gostatix_spark.streaming import ConcurrentCommitError
        cur = None if self.ptr is None else self.ptr["version"]
        if cur != expected_version:
            raise ConcurrentCommitError(f"{cur} != {expected_version}")
        self.ptr = dict(ptr)
        self.commits += 1


def test_commit_protocol_against_mock_object_store(spark):
    """The sink drives any PointerStore through the same CAS protocol:
    commits advance the mock store's pointer, a replay is skipped
    without a commit, and state reads follow the mock's manifest."""
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        store = _MemStore()
        batch = spark.createDataFrame(
            [("a",)] * 4 + [("b",)] * 2, "item string")
        sink = incremental_sketch_sink("cms", "item", state,
                                       element="string", d=3, w=64,
                                       pointer_store=store)
        sink(batch, 0)
        assert store.commits == 1 and store.ptr["version"] == 1
        sink(batch, 0)  # replay → skip, no commit
        assert store.commits == 1
        sink(batch, 1)
        assert store.commits == 2 and store.ptr["version"] == 2
        st = sketch_from_bytes(bytes(
            load_sketch_state(spark, state,
                              pointer_store=store).collect()[0]["state"]))
        assert st.all_sum == 12


def test_concurrent_commit_detected(spark):
    """If another writer moves the pointer between this sink's read and
    its commit, the CAS refuses instead of clobbering the manifest."""
    from gostatix_spark.streaming import (ConcurrentCommitError,
                                          LocalPointerStore)
    with tempfile.TemporaryDirectory() as tmp:
        store = LocalPointerStore(f"{tmp}/state")
        store.commit({"version": 1, "batch_id": 0,
                      "n_state_buckets": 32, "buckets": {}},
                     expected_version=None)
        with pytest.raises(ConcurrentCommitError):
            store.commit({"version": 2, "batch_id": 1,
                          "n_state_buckets": 32, "buckets": {}},
                         expected_version=None)  # stale read


def test_object_store_scheme_fails_loudly():
    from gostatix_spark.streaming import pointer_store_for
    with pytest.raises(ValueError, match="conditional-put"):
        pointer_store_for("s3://bucket/state")


# ---------------------------------------------------------------------------
# PointerStore CAS contract — shared by every implementation
# ---------------------------------------------------------------------------


def _store_factories(tmp):
    from gostatix_spark.streaming import (InMemoryConditionalPutClient,
                                          LocalPointerStore,
                                          ObjectStorePointerStore)
    return {
        "posix": lambda: LocalPointerStore(f"{tmp}/state"),
        "object": (lambda client=InMemoryConditionalPutClient():
                   ObjectStorePointerStore(client)),
    }


@pytest.mark.parametrize("impl", ["posix", "object"])
def test_pointer_store_cas_contract(impl):
    """The contract every PointerStore must satisfy (VERDICT r4 #3):
    fresh create only with expected_version=None; a stale
    expected_version loses and leaves the winner's pointer intact; a
    writer that crashes between read and commit changes nothing."""
    from gostatix_spark.streaming import ConcurrentCommitError
    with tempfile.TemporaryDirectory() as tmp:
        store = _store_factories(tmp)[impl]()
        assert store.read() is None
        p1 = {"version": 1, "batch_id": 0, "n_state_buckets": 8,
              "buckets": {}}
        # create requires expected None; a wrong expectation fails
        with pytest.raises(ConcurrentCommitError):
            store.commit(p1, expected_version=7)
        store.commit(p1, expected_version=None)
        assert store.read()["version"] == 1
        # double-create (two writers both saw "no pointer") → loser
        with pytest.raises(ConcurrentCommitError):
            store.commit({"version": 1, "batch_id": 99,
                          "n_state_buckets": 8, "buckets": {}},
                         expected_version=None)
        assert store.read()["batch_id"] == 0  # winner intact
        # normal advance
        p2 = dict(p1, version=2, batch_id=1)
        store.commit(p2, expected_version=1)
        # concurrent writer with the stale version-1 read loses
        with pytest.raises(ConcurrentCommitError):
            store.commit(dict(p1, version=2, batch_id=77),
                         expected_version=1)
        assert store.read()["batch_id"] == 1
        # crash between read and commit = no commit call: old pointer
        # stays (nothing to assert beyond read stability)
        assert store.read()["version"] == 2


def test_object_store_cas_closes_toctou_window():
    """The etag precondition must catch a writer that lands BETWEEN
    this commit's read and its conditional put — the race the POSIX
    flock serializes, which an object store must close server-side."""
    from gostatix_spark.streaming import (ConcurrentCommitError,
                                          InMemoryConditionalPutClient,
                                          ObjectStorePointerStore)

    class RacyClient(InMemoryConditionalPutClient):
        def __init__(self):
            super().__init__()
            self.interloper = None

        def put_if_match(self, key, data, etag):
            if self.interloper is not None:
                hook, self.interloper = self.interloper, None
                hook()  # another writer commits first
            return super().put_if_match(key, data, etag)

    client = RacyClient()
    store = ObjectStorePointerStore(client)
    base = {"version": 1, "batch_id": 0, "n_state_buckets": 8,
            "buckets": {}}
    store.commit(base, expected_version=None)

    winner = ObjectStorePointerStore(client)
    client.interloper = lambda: winner.commit(
        dict(base, version=2, batch_id=1), expected_version=1)
    # loser read version 1 (valid!), but the winner lands before its
    # put → precondition fails, surfaced as ConcurrentCommitError
    with pytest.raises(ConcurrentCommitError):
        store.commit(dict(base, version=2, batch_id=66),
                     expected_version=1)
    assert store.read()["batch_id"] == 1  # the winner's commit


def test_sink_runs_against_object_store_pointer(spark):
    """End-to-end: the streaming sink commits through the object-store
    CAS exactly as through the POSIX one (stream==batch state bytes)."""
    from gostatix_spark.streaming import (InMemoryConditionalPutClient,
                                          ObjectStorePointerStore)
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/state"
        store = ObjectStorePointerStore(InMemoryConditionalPutClient())
        batch = spark.createDataFrame(
            [("a",)] * 4 + [("b",)] * 2, "item string")
        sink = incremental_sketch_sink("cms", "item", state,
                                       element="string", d=3, w=64,
                                       pointer_store=store)
        sink(batch, 0)
        sink(batch, 0)  # replay skipped
        sink(batch, 1)
        assert store.read()["version"] == 2
        st = sketch_from_bytes(bytes(
            load_sketch_state(spark, state,
                              pointer_store=store).collect()[0]["state"]))
        assert st.all_sum == 12
