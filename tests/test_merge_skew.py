"""Skew-path proof for the merge (round-2 verdict item 8): 10⁶ rows on
ONE merge key must flow through merge_latest_wins without piling onto a
single reducer.

The structural guarantee: latest-wins dedup is a max_by AGGREGATION
(partial + final), not a ranking window — each input partition reduces
its share of the hot key map-side, so the exchange carries at most
num_partitions rows for that key, where a window would sort all 10⁶ on
one task. AQE (on in session.py) additionally coalesces/splits
post-shuffle partitions at runtime for the join side."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from arcane_stream_parquet_spark.operators.merge import merge_latest_wins


def _skewed(spark, n_hot: int, n_tail: int):
    """n_hot rows on one key + n_tail singleton keys."""
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("arcane_merge_key"),
        F.col("id").alias("createdon"),
        F.col("id").alias("seq"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("k"), F.col("id")).alias("arcane_merge_key"),
        F.col("id").alias("createdon"),
        F.col("id").alias("seq"),
        F.lit("tail").alias("payload"),
    )
    return hot.unionByName(tail)


def test_hot_key_merges_correctly_and_in_bounded_time(spark):
    target = _skewed(spark, 500_000, 5_000)
    batch = _skewed(spark, 500_000, 5_000).withColumn(
        "createdon", F.col("createdon") + 1_000_000
    )
    t0 = time.monotonic()
    out = merge_latest_wins(target, batch, tiebreakers=("seq",))
    rows = {r["arcane_merge_key"]: r for r in out.collect()}
    wall = time.monotonic() - t0
    # 1M rows of the hot key + 10k tail rows collapse to 5,001 keys
    assert len(rows) == 5_001
    hot = rows["HOT"]
    # survivor = max (createdon, precedence, seq): the batch's last row
    assert hot["createdon"] == 1_499_999 and hot["seq"] == 499_999
    assert rows["k42"]["createdon"] == 1_000_042
    # generous bound: the window formulation is not asymptotically
    # worse locally, but a stuck single-reducer sort would blow this
    assert wall < 120, f"skewed merge took {wall:.1f}s"


def test_dedup_plan_is_partial_aggregate_not_window(spark):
    df = _skewed(spark, 1_000, 10)
    batch = _skewed(spark, 1_000, 10)
    plan = merge_latest_wins(df, batch, tiebreakers=("seq",))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan, "latest-wins dedup regressed to a ranking window"
    # partial + final aggregate pair around the exchange
    assert plan.count("max_by") >= 2, plan
