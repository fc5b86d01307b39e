"""Stream watermark = MAX(version) over processed rows (reference: A1).

``WatermarkProcessor`` persists max blob ``createdOn`` as the stream's
resume point (reference main.scala:51,130; asserted
IntegrationTests.scala:177-181). Spark's file-source checkpoint replaces
it operationally (streaming/runner.py), but we also expose the explicit
aggregate for parity with the reference's observable watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.functions.keys import VERSION_COLUMN


def compute_watermark(df: DataFrame, version_col: str = VERSION_COLUMN) -> DataFrame:
    """One-row DataFrame: ``watermark = MAX(version_col)`` (BIGINT).

    Map-side partial max then a single-row exchange — no full shuffle.
    """
    return df.agg(F.max(F.col(version_col).cast("long")).alias("watermark"))


def watermark_value(df: DataFrame, version_col: str = VERSION_COLUMN) -> int | None:
    """Collect the scalar watermark (driver-side, one row)."""
    row = compute_watermark(df, version_col).collect()[0]
    return row["watermark"]
