"""Structured Streaming integration: incremental sketch maintenance.

The reference has no streaming runtime (SURVEY.md §2.2) — its "stream"
is a caller loop over ``Insert``. The Spark-native equivalent is a
Structured Streaming query that folds each micro-batch into a
persistent sketch table:

``readStream → foreachBatch( build partials → merge with stored state )``

Merge associativity + commutativity (tested) is exactly what makes this
correct: the stored state is a running ⊕-fold and each micro-batch
contributes its partial, independent of arrival order or batch
boundaries. The same property powers checkpoint/resume — a streaming
restart just resumes the fold from the last committed state.

Execution shape (all distributed — nothing is collected to the driver):

* phase-1 partials over the micro-batch (vectorized ``mapInArrow``,
  map-side combine, skew-immune);
* the state table is KEY-BUCKET-PARTITIONED (``bucket =
  pmod(xxhash64(key), n_state_buckets)``); only the buckets touched by
  the micro-batch are read, merged (``groupBy.applyInPandas``) and
  rewritten. Untouched buckets are carried forward by MANIFEST
  reference — no data is copied or rewritten for them, so steady-state
  commit cost is O(touched buckets), not O(total state) (the round-2
  full-state-rewrite sink's write amplification).
* commit = write touched buckets under a NEW versioned dir
  ``v=<n>/kb=<b>``, then atomically flip the ``_LATEST`` pointer
  (tmp-file + ``os.replace``) whose manifest maps every bucket to the
  version dir that last wrote it — the Iceberg-snapshot pattern on a
  plain filesystem. A crash mid-write leaves the previous pointer (and
  every directory it references) fully intact.

Exactly-once state: ``foreachBatch`` delivers micro-batches
*at-least-once* (a failed epoch is replayed with the same
``batch_id``). The committed pointer records the folded ``batch_id``
AND the replay scope (the query's checkpoint location): a batch with
``batch_id ≤`` committed is skipped only when it comes from the SAME
scope; a restart against a fresh/different Structured Streaming
checkpoint restarts batch ids at 0, and silently dropping that data
would lose it — the sink fails loudly instead and tells the operator
to either restore the original checkpoint or start a new state_path.

Watermarks/late data: sketch merges are insensitive to late or
reordered rows (⊕ is order-free), so no watermark is needed for the
running-total sketch. Windowed variants (sketch per event-time window)
key the aggregation by the window start and let the caller expire old
windows.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from gostatix_spark.agg import _Spec, _build_partials, _merge_partials, \
    infer_element

__all__ = ["incremental_sketch_sink", "sketch_stream_query",
           "load_sketch_state"]


def _read_pointer(state_path: str) -> dict | None:
    try:
        with open(os.path.join(state_path, "_LATEST")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_pointer(state_path: str, ptr: dict) -> None:
    os.makedirs(state_path, exist_ok=True)
    tmp = os.path.join(state_path, "._LATEST.tmp")
    with open(tmp, "w") as f:
        json.dump(ptr, f)
    os.replace(tmp, os.path.join(state_path, "_LATEST"))  # atomic flip


def _bucket_col(key_col: str | None, n_buckets: int):
    """Stable key→bucket assignment (xxhash64 is a fixed algorithm, so
    the mapping survives session restarts — manifests depend on it)."""
    if key_col is None:
        return F.lit(0)
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def load_sketch_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The committed sketch table ``[key?, state, n_items, n_partials]``
    (or None before the first commit). Follows the ``_LATEST``
    manifest, so it unions each bucket's LAST-written directory —
    never a half-written one."""
    ptr = _read_pointer(state_path)
    if ptr is None:
        return None
    paths = sorted({os.path.join(state_path, rel)
                    for rel in ptr["buckets"].values()})
    if not paths:
        return None
    return spark.read.parquet(*paths)


def incremental_sketch_sink(kind: str, value_col: str, state_path: str, *,
                            key_col: str | None = None,
                            element: str | None = None,
                            merge_buckets: int | None = None,
                            n_state_buckets: int = 32,
                            keep_versions: int = 2,
                            replay_scope: str | None = None,
                            **sketch_params):
    """Returns a ``foreachBatch`` function maintaining one sketch per
    key under ``state_path`` (bucket-partitioned versioned dirs +
    atomic manifest pointer; read with :func:`load_sketch_state`).

    Each call: verify the replay guard (same ``replay_scope`` +
    ``batch_id`` ≤ committed ⇒ no-op; DIFFERENT scope with a rewound
    ``batch_id`` ⇒ loud failure, see module docstring); phase-1
    partials over the micro-batch; read ONLY the touched state buckets;
    distributed per-key merge; write the touched buckets under
    ``v=<n+1>``; flip the manifest pointer; prune version dirs that are
    old AND no longer referenced.
    """
    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr = _read_pointer(state_path)
        version = ptr["version"] if ptr else None
        if ptr is not None and batch_id <= ptr["batch_id"]:
            if replay_scope == ptr.get("replay_scope"):
                return  # at-least-once replay of an already-folded batch
            raise ValueError(
                f"state at {state_path!r} has committed batch_id"
                f" {ptr['batch_id']} from scope {ptr.get('replay_scope')!r},"
                f" but batch {batch_id} arrived from scope {replay_scope!r}"
                " — a fresh streaming checkpoint restarted batch ids over"
                " kept state. Restore the original checkpoint dir or point"
                " the query at a new state_path.")
        if not batch_df.head(1):
            return  # empty micro-batch: state unchanged
        el = infer_element(batch_df, value_col, element)
        spec = _Spec.make(kind, **sketch_params)
        key_cols = [key_col] if key_col else []
        cols = key_cols + ["state", "n_items"]
        partials = _build_partials(batch_df, spec, value_col, key_col, el) \
            .select(*cols)
        kb = _bucket_col(key_col, n_state_buckets)
        if key_col:
            # the touched-bucket probe and the merge both consume the
            # partials — persist so the phase-1 build runs ONCE per
            # micro-batch, not once per consumer
            partials = partials.persist()
            # tiny collect: ≤ n_state_buckets ints, never key data
            touched = sorted(
                r[0] for r in
                partials.select(kb.alias("kb")).distinct().collect())
        else:
            touched = [0]
        manifest = dict(ptr["buckets"]) if ptr else {}
        inp = partials
        cur_paths = sorted({os.path.join(state_path, manifest[str(b)])
                            for b in touched if str(b) in manifest})
        if cur_paths:
            # partition-pruned state read: ONLY the touched buckets
            current = spark.read.parquet(*cur_paths).select(*cols)
            inp = inp.unionByName(current)
        merged = _merge_partials(inp, key_col, None, merge_buckets) \
            .select(*key_cols, "state", "n_items", "n_partials") \
            .withColumn("kb", kb if key_col else F.lit(0))
        new_version = (version or 0) + 1
        vdir = os.path.join(state_path, f"v={new_version}")
        try:
            merged.write.mode("overwrite").partitionBy("kb").parquet(vdir)
        finally:
            if key_col:
                partials.unpersist()
        for b in touched:
            manifest[str(b)] = f"v={new_version}/kb={b}"
        _write_pointer(state_path, {
            "version": new_version, "batch_id": batch_id,
            "replay_scope": replay_scope,
            "n_state_buckets": n_state_buckets, "buckets": manifest})
        # retention: drop version dirs outside the keep window that no
        # manifest entry references (the pointer already moved, so
        # readers can't land on them)
        live = {rel.split("/", 1)[0] for rel in manifest.values()}
        try:
            for name in os.listdir(state_path):
                if name.startswith("v=") and name not in live and \
                        int(name[2:]) <= new_version - keep_versions:
                    shutil.rmtree(os.path.join(state_path, name),
                                  ignore_errors=True)
        except OSError:
            pass

    return fn


def sketch_stream_query(stream_df: DataFrame, kind: str, value_col: str,
                        state_path: str, *, key_col: str | None = None,
                        element: str | None = None,
                        merge_buckets: int | None = None,
                        n_state_buckets: int = 32,
                        trigger_available_now: bool = True,
                        checkpoint_dir: str | None = None, **sketch_params):
    """Launch the streaming query. With ``trigger_available_now`` the
    query drains all available input and stops — the batch-equivalence
    test mode; without it, it runs continuously. The checkpoint
    location doubles as the replay scope recorded in the state pointer
    (see module docstring)."""
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(state_path, "_stream_checkpoint")
    sink = incremental_sketch_sink(kind, value_col, state_path,
                                   key_col=key_col, element=element,
                                   merge_buckets=merge_buckets,
                                   n_state_buckets=n_state_buckets,
                                   replay_scope=os.path.abspath(checkpoint_dir),
                                   **sketch_params)
    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
