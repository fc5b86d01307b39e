"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Beyond-reference operator family (the reference moves only tabular
parquet). What is REAL here and what is STUBBED:

- REAL: the Spark-side plumbing — binary payload column, metadata
  struct, partition-parallel Arrow batching, UDF signatures, output
  schemas, and the deterministic byte-level features (length, header
  bytes, content hash). These are tested and oracle-checked.
- STUBBED: the actual media codecs. This container has no image/audio
  libraries, so ``decode_image``/``sample_frames`` raise
  ``NotImplementedError`` unless ``fake=True``, in which case a
  DETERMINISTIC FAKE derives plausible features (width/height/duration)
  from the payload bytes. The batch shape, schema, and partitioning are
  exactly what a real decoder drops into.

Scale: ``mapInPandas`` streams Arrow record batches per partition — no
driver involvement, no shuffle; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decode cost is
embarrassingly parallel; a real deployment sizes partitions to media
payloads via ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_COL = "payload"
MEDIA_TYPE_COL = "media_type"


def with_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "application/octet-stream"
) -> DataFrame:
    """Attach an opaque binary payload column (here: the UTF-8 bytes of
    a text column — the testdata has no real media; the schema and
    downstream plumbing are identical for true image/audio bytes)."""
    return df.select(
        "*",
        F.encode(F.col(text_col), "UTF-8").alias(PAYLOAD_COL),
        F.lit(media_type).alias(MEDIA_TYPE_COL),
    )


def payload_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for a binary column, all JVM-side built-ins:
    byte length, first-4-bytes hex header (magic-number sniffing), and
    a sha256 content hash (exact-dedup key for media)."""
    return df.select(
        F.col(id_col),
        F.length(F.col(PAYLOAD_COL)).cast("bigint").alias("byte_len"),
        F.lower(F.hex(F.substring(F.col(PAYLOAD_COL), 1, 4))).alias("header_hex"),
        F.sha2(F.col(PAYLOAD_COL), 256).alias("content_hash"),
        F.col(MEDIA_TYPE_COL),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("feature_hash", StringType()),
    ]
)


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Decode image payloads to (width, height, channels, feature hash)
    via Arrow-batched mapInPandas.

    ``fake=False`` raises NotImplementedError per batch: the real codec
    (PIL/OpenCV) is NOT INSTALLED in this environment — STUB, clearly
    marked. ``fake=True`` derives deterministic pseudo-features from the
    bytes so the full distributed path (batching, schema, partition
    parallelism) is exercised end-to-end in tests.
    """
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(PAYLOAD_COL))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                # STUB: swap in e.g. PIL.Image.open(io.BytesIO(b)) here.
                raise NotImplementedError(
                    "image decode requires a codec library not present "
                    "in this environment; use fake=True for the "
                    "deterministic test double"
                )
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf[PAYLOAD_COL].map(len),
                # fake decode: dims derived from content hash — stable
                "width": pdf[PAYLOAD_COL].map(
                    lambda b: 64 + int.from_bytes(hashlib.sha256(b).digest()[:2]) % 1024
                ),
                "height": pdf[PAYLOAD_COL].map(
                    lambda b: 64 + int.from_bytes(hashlib.sha256(b).digest()[2:4]) % 1024
                ),
                "n_channels": pdf[PAYLOAD_COL].map(lambda b: 3),
                "feature_hash": pdf[PAYLOAD_COL].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            yield pd.DataFrame(out)

    return cols.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", every_n_bytes: int = 64, fake: bool = False
) -> DataFrame:
    """Video frame sampling shape: one payload row → N frame rows.
    Real codec STUBBED (see decode_image_features); ``fake=True`` emits
    byte-slices as stand-in frames, exercising the 1→N mapInPandas
    explode shape a real ffmpeg-style sampler uses."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(PAYLOAD_COL))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a codec library not present "
                    "in this environment; use fake=True for the "
                    "deterministic test double"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[PAYLOAD_COL]):
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append((doc_id, i, b[off : off + every_n_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return cols.mapInPandas(batches, FRAME_SCHEMA)
