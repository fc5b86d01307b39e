"""Relational + pipeline operators built from DataFrame primitives."""

from arcane_stream_parquet_spark.operators.dedup import latest_by_key
from arcane_stream_parquet_spark.operators.watermark import compute_watermark

__all__ = ["latest_by_key", "compute_watermark"]
