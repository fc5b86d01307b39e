"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB at sf0.001, compare row
count, column names, and order-insensitive values.

This is the enforcement of the registry's authoring rules — if this
passes, the driver's sf0.01 gate should too (same comparison shape).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from arcane_stream_parquet_spark.plans import REGISTRY, oracle_queries, spark_queries
from arcane_stream_parquet_spark.sources.tables import TABLE_NAMES

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_ORACLE}/{name}.parquet'"
        )
    yield con
    con.close()


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive
    comparison, mirroring the driver's sorted value-hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell types for stable sorting/comparison
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            df[col] = df[col].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def _names() -> list[str]:
    spark_queries()  # force registry load
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_ORACLE)
    spark_pd = sdf.toPandas()

    if spec.oracle is None:
        assert len(spark_pd) >= 0  # rows-only check (driver's weaker mode)
        return

    duck_pd = duck.execute(spec.oracle).df()

    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: column mismatch spark={sorted(spark_pd.columns)} "
        f"oracle={sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count spark={len(spark_pd)} oracle={len(duck_pd)}"
    )

    a, b = _canonical(spark_pd), _canonical(duck_pd)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        mismatches = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        assert not mismatches, (
            f"{name}: {len(mismatches)} value mismatches in column {col}; "
            f"first 3: {mismatches[:3]}"
        )


def test_every_query_has_oracle_or_tag():
    """Queries without an oracle must be deliberately tagged non-sql."""
    spark_queries()
    missing = [
        n for n, s in REGISTRY.items() if s.oracle is None and "non-sql" not in s.tags
    ]
    assert not missing, f"queries lacking oracle SQL and non-sql tag: {missing}"


def test_oracle_sql_runs_standalone(duck):
    for name, sql in oracle_queries().items():
        duck.execute(sql).fetchone()


def test_registry_stays_under_driver_correctness_cap():
    """The round-2 driver recorded exactly 50 CORRECTNESS rows while 61
    queries were registered — the harness caps the file at 50 entries
    and silently drops the rest, leaving those operators driver-
    unverified. The registry was consolidated to fit; this guard keeps
    any future addition from pushing a query past the cap unnoticed
    (consolidate overlapping entries instead)."""
    assert len(spark_queries()) <= 50
    # every query has either a real oracle or an explicit None
    assert set(oracle_queries()) <= set(spark_queries())
