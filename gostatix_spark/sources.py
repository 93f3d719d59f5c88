"""Table sources — Iceberg-first with parquet fallback.

The north rule's input is an **Iceberg table** of pre-tokenized
sequences. This sandbox ships no Iceberg runtime jar, so
:func:`read_table` resolves in order:

1. an Iceberg/catalog table name (``catalog.db.table``) via
   ``spark.read.table`` — this is the production path and also picks
   up Delta/Hive tables registered in the catalog;
2. ``spark.read.format("iceberg").load(path)`` when the runtime is
   present;
3. plain parquet directory (the sandbox path).

Lineage: on Iceberg, ``snapshot_id()`` would come from the table's
current snapshot (``SELECT snapshot_id FROM db.tbl.snapshots ORDER BY
committed_at DESC LIMIT 1``); without a catalog we derive a stable
pseudo-snapshot from the input file listing so checkpoint lineage
(SURVEY.md §1.5) still records *what* was read.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_table", "snapshot_id", "save_sketches", "load_sketches"]


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if "/" not in ref and "." in ref:
        # catalog table name (iceberg/delta/hive) — production path
        return spark.read.table(ref)
    try:
        return spark.read.format("iceberg").load(ref)
    except Exception:
        return spark.read.parquet(ref)


def save_sketches(states: DataFrame, path: str, *, kind: str,
                  source_ref: str | None = None,
                  mode: str = "overwrite") -> None:
    """Persist a final sketch table (the sink of a build). Adds
    metadata columns (``sketch_kind``, ``built_at_snapshot``) so a
    reader knows which input snapshot the sketches summarize."""
    from pyspark.sql import functions as F
    out = states.withColumn("sketch_kind", F.lit(kind))
    if source_ref is not None:
        out = out.withColumn(
            "built_at_snapshot",
            F.lit(snapshot_id(states.sparkSession, source_ref)))
    out.write.mode(mode).parquet(path)


def load_sketches(spark: SparkSession, path: str,
                  kind: str | None = None) -> DataFrame:
    """Load a sketch table written by :func:`save_sketches` — the
    analog of the reference's ``*FromKey`` constructors
    (``bloom_filter.go:124-139``)."""
    df = spark.read.parquet(path)
    if kind is not None:
        df = df.where(df["sketch_kind"] == kind)
    return df


def snapshot_id(spark: SparkSession, ref: str) -> int:
    """Stable snapshot identifier for lineage columns. On Iceberg this
    is the table's current snapshot id; on bare parquet it is a hash of
    the sorted (name, size, mtime) file listing."""
    if "/" not in ref and "." in ref:
        try:
            row = spark.sql(
                f"SELECT snapshot_id FROM {ref}.snapshots "
                f"ORDER BY committed_at DESC LIMIT 1").first()
            if row:
                return int(row[0])
        except Exception:
            pass
    h = hashlib.sha256()
    try:
        for name in sorted(os.listdir(ref)):
            st = os.stat(os.path.join(ref, name))
            h.update(f"{name}:{st.st_size}:{int(st.st_mtime)}".encode())
    except OSError:
        h.update(ref.encode())
    return int.from_bytes(h.digest()[:8], "big") >> 1
