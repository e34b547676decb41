"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs; all
per-item compute runs through Arrow-batched ``mapInPandas`` so bytes never
round-trip per row between JVM and Python. The decode kernels themselves
are STUBBED behind ``set_decoder`` (this container ships no PIL/ffmpeg —
a deterministic fake stands in, clearly marked), but the Spark-side
surface — schema, batch iteration, partition sizing, UDF signatures — is
real and tested.

Scale notes: media rows are large and skewed; ``repartition`` by a hash of
the id before mapInPandas levels batch sizes, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch memory
(set it so batch_bytes ~ rows * avg_media_size stays well under executor
memory).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def _fake_decode(content: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real decoder (PIL/ffmpeg absent here).

    Derives fake-but-stable dimensions from md5 hex prefixes of the byte
    content — the same engine-portable construction as
    functions/porthash.py, so the driver's DuckDB oracle can replay the
    "decode" exactly. Swap via set_decoder() in production.
    """
    import hashlib

    hx = hashlib.md5(content).hexdigest()
    return {
        "width": 64 + int(hx[:4], 16) % 1024,
        "height": 64 + int(hx[4:8], 16) % 1024,
    }


_decoder: Callable[[bytes, str], dict] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], dict]) -> None:
    """Install a real decode kernel (e.g. PIL-based). The kernel receives
    (bytes, kind) and returns {'width': int, 'height': int}."""
    global _decoder
    _decoder = fn


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode + feature-extract media via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                content = bytes(content) if content is not None else b""
                decoded = _decoder(content, kind)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(content),
                        "width": decoded["width"],
                        "height": decoded["height"],
                        "checksum": hashlib.md5(content).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize plumbing: the real kernel is NotImplemented in this
    environment; the pipeline shape (binary in -> binary out + metadata)
    is what this function pins down."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image library not present in this "
            "container; install one and set_decoder()/replace this kernel"
        )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: metadata-only (selects which frames a
    real decoder would emit) — demonstrates the explode-by-plan shape with
    no decoder: one output row per planned frame index."""
    n_frames = (F.col("n_bytes") / 1000).cast("int")  # fake: 1 frame/KB
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return media.select(
        "media_id",
        "kind",
        F.explode(idx).alias("frame_index"),
    )
