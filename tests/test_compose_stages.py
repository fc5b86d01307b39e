"""compose_stages — lineage-managed pipeline composition.

Pins that the cut actually bounds the analyzed-plan size (the r13
probe's driver-OOM failure mode, reproduced here in miniature as
superlinear plan-text growth) and that results are identical with and
without the cut.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.pipeline import compose_stages


def _join_back_stage(i: int):
    """One funnel-shaped stage: transform the text, then join the
    metadata back from the SAME input — the input plan is referenced
    TWICE, so without a lineage cut the logical tree doubles per stage
    (2^stages — the exact mechanism behind the probe's 1.5 GB plan
    string; every clean→join-meta stage in a real funnel has this
    shape)."""

    def stage(df):
        cleaned = df.select(
            "id", F.concat_ws(" ", "t", F.lit(f"s{i}")).alias("t")
        )
        return cleaned.join(df.select("id", "v"), "id").select(
            "id", "t", (F.col("v") + F.length("t")).alias("v")
        )

    return stage


def _plan_len(df) -> int:
    """Optimized-plan text length: the ANALYZED plan is a per-operator
    DAG print (linear in stages); the blowup lives in the OPTIMIZER'S
    CollapseProject, which inlines each referenced expression into
    every use site — multiplicative across stages. That optimized tree
    is what execution planning and plan printing walk."""
    return len(df._jdf.queryExecution().optimizedPlan().toString())


def test_cut_bounds_plan_growth_and_preserves_result(spark):
    base = spark.range(50).select(
        F.col("id"), F.lit("seed").alias("t"), F.lit(0).cast("long").alias("v")
    )
    stages = [_join_back_stage(i) for i in range(10)]

    raw = compose_stages(base, stages, cut="none")
    cut = compose_stages(base, stages, cut="local_checkpoint")

    # identical results (the cut is a physical boundary, not a semantic one)
    assert sorted(map(tuple, cut.collect())) == sorted(map(tuple, raw.collect()))

    # the raw chain's analyzed plan grows far past the cut chain's:
    # superlinear fan-out vs a flat post-checkpoint scan
    assert _plan_len(cut) * 10 < _plan_len(raw)


def test_plan_growth_is_superlinear_without_cut(spark):
    base = spark.range(10).select(
        F.col("id"), F.lit("seed").alias("t"), F.lit(0).cast("long").alias("v")
    )
    sizes = []
    df = base
    for i in range(8):
        df = _join_back_stage(i)(df)
        sizes.append(_plan_len(df))
    # each stage multiplies the plan text, it does not add to it
    growth = [b / a for a, b in zip(sizes, sizes[1:])]
    assert min(growth[2:]) > 1.5, sizes


def test_validation(spark):
    base = spark.range(1)
    with pytest.raises(ValueError):
        compose_stages(base, [], cut="bogus")
    # empty stage list is the identity
    assert compose_stages(base, [], cut="none") is base
