"""Sources: parquet blob scans (batch + streaming) and testdata loaders."""

from arcane_stream_parquet_spark.sources.tables import load_table, TABLE_NAMES
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource

__all__ = ["load_table", "TABLE_NAMES", "BlobParquetSource"]
