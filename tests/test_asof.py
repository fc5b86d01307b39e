"""Unit tests for operators/asof.py — the struct-atomic carry semantics
the round-1 ADVICE flagged: a matched right row must arrive WHOLE
(genuine NULLs preserved, never columns stitched from different rows).
"""

from __future__ import annotations

from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=6), Row(k=1, t=2), Row(k=2, t=9)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, t2=3, v="A", w=10),
            Row(k=1, t2=5, v=None, w=20),
            Row(k=1, t2=7, v="C", w=None),
        ],
        schema="k int, t2 int, v string, w int",
    )
    return left, right


def test_backward_preserves_matched_nulls(spark):
    """ADVICE repro: left t=6 matches right (t2=5, v=NULL, w=20) — the
    old per-column ignorenulls carry returned v='A' from a DIFFERENT
    row; the struct carry must return the real NULL with w=20."""
    left, right = _sides(spark)
    out = {r["t"]: r for r in asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t2"
    ).collect()}
    assert out[6]["v_right"] is None and out[6]["w_right"] == 20
    assert out[2]["v_right"] is None and out[2]["w_right"] is None  # no match
    assert out[9]["v_right"] is None and out[9]["w_right"] is None  # other key


def test_forward_direction(spark):
    left, right = _sides(spark)
    out = {r["t"]: r for r in asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t2", direction="forward"
    ).collect()}
    assert out[6]["v_right"] == "C" and out[6]["w_right"] is None
    assert out[2]["v_right"] == "A" and out[2]["w_right"] == 10
    assert out[9]["v_right"] is None  # key 2 has no right rows


def test_equal_ts_matches_inclusively(spark):
    left = spark.createDataFrame([Row(k=1, t=5)])
    right = spark.createDataFrame([Row(k=1, t2=5, v="X")])
    back = asof_join(left, right, on=["k"], left_ts="t", right_ts="t2").collect()
    fwd = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t2", direction="forward"
    ).collect()
    assert back[0]["v_right"] == "X"
    assert fwd[0]["v_right"] == "X"


def test_tiebreaker_picks_max_deterministically(spark):
    left = spark.createDataFrame([Row(k=1, t=9)])
    right = spark.createDataFrame(
        [Row(k=1, t2=5, v="low", seq=1), Row(k=1, t2=5, v="high", seq=2)]
    )
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="t",
        right_ts="t2",
        right_value_cols=["v"],
        tiebreakers=["seq"],
    ).collect()
    assert out[0]["v_right"] == "high"


def test_plan_is_single_shuffle_window(spark):
    """The as-of join must plan as union + one key shuffle + window —
    no join operator, no range explosion."""
    left, right = _sides(spark)
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all
    assert plan.count("Exchange hashpartitioning(k") <= 1
