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
* union with the COMMITTED state table (a DataFrame, not a driver
  pandas frame) and fold per key via the shared ``_merge_partials``
  (``groupBy.applyInPandas``; ``merge_buckets`` batches fine-grained
  keys so thousands of keys don't pay per-key pandas overhead);
* commit = write a NEW versioned subdir ``v=<n>``, then atomically
  flip the ``_LATEST`` pointer (tmp-file + ``os.replace``). A crash
  mid-write leaves the previous pointer — and therefore the previous
  state — fully intact.

Exactly-once state: ``foreachBatch`` delivers micro-batches
*at-least-once* (a failed epoch is replayed with the same
``batch_id``). The committed pointer records the folded ``batch_id``;
a replayed batch with ``batch_id ≤`` committed is a no-op, so
non-idempotent sketches (CMS / Top-K / t-digest / KLL) never
double-count. On an object store, replace the pointer file with an
atomic metadata commit (e.g. an Iceberg snapshot of the state table);
the versioned-dir layout maps 1:1.

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

from pyspark.sql import DataFrame, SparkSession

from gostatix_spark.agg import _Spec, _build_partials, _merge_partials, \
    infer_element

__all__ = ["incremental_sketch_sink", "sketch_stream_query",
           "load_sketch_state"]


def _read_pointer(state_path: str) -> tuple[int | None, int | None]:
    """(version, last committed batch_id) or (None, None)."""
    try:
        with open(os.path.join(state_path, "_LATEST")) as f:
            d = json.load(f)
        return int(d["version"]), int(d["batch_id"])
    except (OSError, ValueError, KeyError):
        return None, None


def _write_pointer(state_path: str, version: int, batch_id: int) -> None:
    os.makedirs(state_path, exist_ok=True)
    tmp = os.path.join(state_path, "._LATEST.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "batch_id": batch_id}, f)
    os.replace(tmp, os.path.join(state_path, "_LATEST"))  # atomic flip


def load_sketch_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The committed sketch table ``[key?, state, n_items, n_partials]``
    (or None before the first commit). Reads whatever version the
    ``_LATEST`` pointer names — never a half-written directory."""
    version, _ = _read_pointer(state_path)
    if version is None:
        return None
    return spark.read.parquet(os.path.join(state_path, f"v={version}"))


def incremental_sketch_sink(kind: str, value_col: str, state_path: str, *,
                            key_col: str | None = None,
                            element: str | None = None,
                            merge_buckets: int | None = None,
                            keep_versions: int = 2, **sketch_params):
    """Returns a ``foreachBatch`` function maintaining one sketch per
    key under ``state_path`` (versioned subdirs + atomic pointer; read
    with :func:`load_sketch_state`).

    Each call: skip if ``batch_id`` was already committed (replay);
    else phase-1 partials over the micro-batch, union with the stored
    state DataFrame, distributed per-key merge, write ``v=<n+1>``,
    flip the pointer, prune versions older than ``keep_versions``.
    """
    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        version, last_bid = _read_pointer(state_path)
        if last_bid is not None and batch_id <= last_bid:
            return  # at-least-once replay of an already-folded batch
        if not batch_df.head(1):
            return  # empty micro-batch: state unchanged
        el = infer_element(batch_df, value_col, element)
        spec = _Spec.make(kind, **sketch_params)
        key_cols = [key_col] if key_col else []
        cols = key_cols + ["state", "n_items"]
        inp = _build_partials(batch_df, spec, value_col, key_col, el) \
            .select(*cols)
        current = load_sketch_state(spark, state_path)
        if current is not None:
            inp = inp.unionByName(current.select(*cols))
        merged = _merge_partials(inp, key_col, None, merge_buckets)
        new_version = (version or 0) + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(state_path, f"v={new_version}"))
        _write_pointer(state_path, new_version, batch_id)
        # retention: drop versions older than the keep window (the
        # pointer already moved, so readers can't land on them)
        try:
            for name in os.listdir(state_path):
                if name.startswith("v=") and \
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
                        trigger_available_now: bool = True,
                        checkpoint_dir: str | None = None, **sketch_params):
    """Launch the streaming query. With ``trigger_available_now`` the
    query drains all available input and stops — the batch-equivalence
    test mode; without it, it runs continuously."""
    sink = incremental_sketch_sink(kind, value_col, state_path,
                                   key_col=key_col, element=element,
                                   merge_buckets=merge_buckets,
                                   **sketch_params)
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(state_path, "_stream_checkpoint")
    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
