"""Loaders for the driver-generated testdata tables (TESTDATA.md).

``load_table(spark, sf_dir, name)`` is the single entry point every
query goes through; it applies the runtime confs (nano-timestamp
handling) so the engine works on a driver-provided SparkSession too.

events.ts is TIMESTAMP(NANOS) in the parquet footer. Spark (with the
legacy conf) reads it as epoch-nano BIGINT; DuckDB truncates the same
column to TIMESTAMP (µs), so every oracle comparison happens at epoch
micros — Spark ``ts DIV 1000`` vs DuckDB ``epoch_us(ts)`` (see the
registry authoring rules in plans/registry.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from arcane_stream_parquet_spark.session import configure_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning / predicate pushdown stay
    available because this is a plain parquet scan (no caching, no
    materialization)."""
    configure_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
