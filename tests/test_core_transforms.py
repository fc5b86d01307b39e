"""Unit tests for the M1 core transforms (SURVEY.md §7 M1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.functions import (
    FieldSelectionRule,
    merge_key_column,
    normalize_column_names,
    normalize_name,
    select_fields,
    with_merge_key,
)
from arcane_stream_parquet_spark.operators.dedup import latest_by_key
from arcane_stream_parquet_spark.operators.watermark import watermark_value


def test_normalize_name():
    assert normalize_name("col$1") == "col1"
    assert normalize_name("a/b\\c d-e.f") == "abcdef"
    assert normalize_name("already_fine_123") == "already_fine_123"


def test_normalize_column_names_collision(spark):
    df = spark.createDataFrame([(1, 2)], "`a$b` long, `a/b` long")
    with pytest.raises(ValueError, match="collides"):
        normalize_column_names(df)


def test_merge_key_is_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, None)], "k long, s string"
    )
    out = with_merge_key(df, ["k", "s"]).collect()
    assert out[0]["arcane_merge_key"] == out[1]["arcane_merge_key"]
    assert out[2]["arcane_merge_key"] is not None
    assert len(out[0]["arcane_merge_key"]) == 64  # sha-256 hex


def test_field_selection_essential_fields_survive(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, "k")], "x long, y string, createdon long, arcane_merge_key string"
    )
    rule = FieldSelectionRule(mode="include", fields=frozenset({"x"}))
    assert select_fields(df, rule).columns == ["x", "createdon", "arcane_merge_key"]
    rule = FieldSelectionRule(mode="exclude", fields=frozenset({"createdon", "y"}))
    assert select_fields(df, rule).columns == ["x", "createdon", "arcane_merge_key"]


def test_field_selection_rejects_bad_mode():
    with pytest.raises(ValueError):
        FieldSelectionRule(mode="only")


def test_latest_by_key_golden(spark):
    """Reference golden shape: many versions per key → one row per key,
    max version wins (IntegrationTests.scala:176)."""
    rows = [(k, v, f"p{k}-{v}") for k in range(5) for v in range(10)]
    df = spark.createDataFrame(rows, "k long, createdon long, payload string")
    out = latest_by_key(df, ["k"]).collect()
    assert len(out) == 5
    assert {r["createdon"] for r in out} == {9}
    assert {r["payload"] for r in out} == {f"p{k}-9" for k in range(5)}


def test_latest_by_key_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b")], "k long, createdon long, payload string"
    )
    out = latest_by_key(df, ["k"], tiebreakers=["payload"]).collect()
    assert len(out) == 1 and out[0]["payload"] == "b"


def test_watermark(spark):
    df = spark.createDataFrame([(1, 10), (2, 99), (3, 7)], "k long, createdon long")
    assert watermark_value(df) == 99


def test_field_selection_pushes_column_pruning(spark, sf_dir):
    """The include rule must reach the parquet scan as ReadSchema pruning
    (reference isServerSide semantics)."""
    from arcane_stream_parquet_spark.sources.tables import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    rule = FieldSelectionRule(mode="include", fields=frozenset({"l_orderkey"}))
    plan = select_fields(lineitem, rule)._jdf.queryExecution().executedPlan().toString()
    assert "l_quantity" not in plan  # pruned at the scan
