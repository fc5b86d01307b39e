"""Partitioning helpers for CPU-bound per-row operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the upstream scan yields fewer partitions.

    Why: compute-heavy narrow operators (shingling, per-shingle sha256,
    per-token bit votes) inherit the scan's partitioning; a small input
    file produces ONE partition and serializes the whole computation
    onto one core. At any real deployment the scan of a large table
    already carries ≥ parallelism partitions and this is a no-op — the
    repartition shuffle only ever pays for itself on tiny inputs, and
    it moves raw rows once before the expensive projection.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
