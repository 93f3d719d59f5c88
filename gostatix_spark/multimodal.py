"""Multimodal column handling — images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested; the actual media decoding is STUBBED
behind :data:`DECODERS` because no image/audio libraries exist in this
container — each stub is a deterministic fake keyed on the payload
bytes, clearly marked. Swapping in a real decoder (PIL / torchaudio /
pyav) changes one function, not the pipeline.

Pattern: ``mapInPandas`` so one Python worker sees an iterator of
row-batches and can bound its own memory (media rows are big — pair
this with a small ``spark.sql.execution.arrow.maxRecordsPerBatch`` or
``maxBytesPerBatch`` when payloads are MBs).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, MapType, StringType, StructField,
                               StructType)

__all__ = ["ASSET_SCHEMA", "make_assets", "decode_features", "frame_sample"]

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("media", BinaryType(), False),        # opaque payload
    StructField("meta", MapType(StringType(), StringType()), False),
])


def make_assets(spark, n: int, seed: int = 42, payload_bytes: int = 256) -> DataFrame:
    """Deterministic synthetic asset table (payloads are hash-derived
    pseudo-bytes — stands in for real encoded media)."""
    kinds = ["image", "audio", "video"]

    def gen(batches):
        for b in batches:
            ids = b.column("id").to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = kinds[int(i) % 3]
                rows.append({
                    "asset_id": int(i), "kind": kind,
                    "media": rng.integers(0, 256, payload_bytes,
                                          dtype=np.uint8).tobytes(),
                    "meta": {"codec": "fake", "kind": kind},
                })
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema
            yield from pa.Table.from_pylist(
                rows, schema=to_arrow_schema(ASSET_SCHEMA)).to_batches()

    return spark.range(n).mapInArrow(gen, ASSET_SCHEMA)


def _fake_decode(media: bytes, kind: str, out_dim: int) -> np.ndarray:
    """STUB — deterministic fake 'decoder': folds the payload bytes into
    a feature vector. A real deployment replaces this with
    PIL/torchaudio/pyav decoding; everything around it stays."""
    arr = np.frombuffer(media, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % out_dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.float32)])
    return arr.reshape(-1, out_dim).mean(axis=0) / 255.0


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def decode_features(df: DataFrame, out_dim: int = 16) -> DataFrame:
    """[asset_id, kind, features array<float>] — batched decode +
    feature extraction via mapInPandas (memory-bounded iterator)."""
    out_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ])

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = [DECODERS[k](m, k, out_dim).tolist()
                     for k, m in zip(pdf["kind"], pdf["media"])]
            yield pd.DataFrame({"asset_id": pdf["asset_id"],
                                "kind": pdf["kind"], "features": feats})

    return df.mapInPandas(fn, out_schema)


def frame_sample(df: DataFrame, every_n: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Video 'frame sampling' stub: split the payload into fixed-size
    pseudo-frames, keep every n-th. Demonstrates the 1→many row
    expansion pattern (mapInPandas yielding more rows than it got)."""
    out_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ])

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for aid, media in zip(pdf["asset_id"], pdf["media"]):
                n_frames = len(media) // frame_bytes
                for fno in range(0, n_frames, every_n):
                    rows.append({"asset_id": aid, "frame_no": fno,
                                 "frame": media[fno * frame_bytes:
                                                (fno + 1) * frame_bytes]})
            if rows:
                yield pd.DataFrame(rows)

    return df.where(F.col("kind") == "video").mapInPandas(fn, out_schema)
