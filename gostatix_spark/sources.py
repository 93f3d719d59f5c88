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

__all__ = ["read_table", "snapshot_id"]


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if "/" not in ref and "." in ref:
        # catalog table name (iceberg/delta/hive) — production path
        return spark.read.table(ref)
    try:
        return spark.read.format("iceberg").load(ref)
    except Exception:
        return spark.read.parquet(ref)


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
