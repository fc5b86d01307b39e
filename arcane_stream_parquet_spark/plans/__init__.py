"""Query registry: every implemented operator exposes a (Spark builder,
DuckDB oracle SQL) pair here; ``__spark_entry__.py`` re-exports it."""

from arcane_stream_parquet_spark.plans.registry import (
    QuerySpec,
    REGISTRY,
    register_query,
    spark_queries,
    oracle_queries,
)

__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register_query",
    "spark_queries",
    "oracle_queries",
]
