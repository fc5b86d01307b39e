"""arcane_stream_parquet_spark — a PySpark-native analytics/ELT engine.

A from-scratch, Spark-first re-expression of the capabilities of
``SneaksAndData/arcane-stream-parquet`` (reference at /root/reference, a
CDC-style Parquet→Iceberg upsert stream; see SURVEY.md): incremental
Parquet blob ingestion, merge-key derivation, latest-wins upsert merge,
backfill, schema migration — plus the batch/SQL operator surface and the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis) that a 100 TB Spark deployment needs.

Design stance (SURVEY.md §7): DataFrame/SQL + Structured Streaming only;
Catalyst does optimization; Python UDFs only where built-ins genuinely
cannot express the semantics (and then Arrow-vectorized).
"""

from arcane_stream_parquet_spark.session import build_session, configure_session
from arcane_stream_parquet_spark.sources.tables import load_table, TABLE_NAMES

__all__ = [
    "build_session",
    "configure_session",
    "load_table",
    "TABLE_NAMES",
]

__version__ = "0.1.0"
