"""Registry of oracle-checked queries.

Contract (driver, __spark_entry__.py): for each name, the Spark builder
``(spark, sf_dir) -> DataFrame`` and the equivalent DuckDB SQL must
produce identical row counts, schemas (column names), and
order-insensitive value hashes at sf=0.01.

Authoring rules that make hashes match (learned once, applied
everywhere — see tests/test_oracle.py for the local enforcement):

- Alias every computed column identically on both sides.
- events.ts is epoch-nano BIGINT on the Spark side (legacy nanos conf)
  but DuckDB 1.0 truncates parquet NANOS to TIMESTAMP (µs). Compare at
  micros: Spark ``ts DIV 1000`` (integer division — float division of
  an int64 loses precision past 2^53), DuckDB ``epoch_us(ts)``.
- Aggregates over DOUBLE columns: cast inputs to DECIMAL(18,4) (exact,
  associative — immune to summation-order differences between engines),
  then round and cast the result back to DOUBLE on both sides.
- DuckDB ``sum(BIGINT)`` is HUGEINT; cast back to BIGINT in the oracle.
- Timestamps in output: cast to DATE or epoch micros/nanos BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: SparkBuilder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register_query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkBuilder], SparkBuilder]:
    """Decorator: register a Spark query builder with its oracle SQL."""

    def wrap(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import arcane_stream_parquet_spark.plans.core_queries  # noqa: F401
    import arcane_stream_parquet_spark.plans.llm_queries  # noqa: F401
    import arcane_stream_parquet_spark.plans.sql_queries  # noqa: F401
    import arcane_stream_parquet_spark.plans.streaming_queries  # noqa: F401


def spark_queries() -> dict[str, SparkBuilder]:
    _load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
