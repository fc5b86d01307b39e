"""Deterministic sampling / splitting operators for training-data
pipelines — beyond-reference (the task brief's LLM-pipeline family).

Everything here is hash-based and seedless-reproducible: the same row
lands in the same split/sample on every run, every engine, every
cluster size — the property training pipelines actually need (RNG
sampling is neither replayable across engines nor stable under
repartitioning). All pure projections/filters: zero shuffles.

The portable hash: first 8 hex chars of sha256(id) → int — identical
in Spark (conv) and DuckDB (strpos polynomial), uniform over 2^32.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket_expr(id_col: str | Column, salt: str = "") -> Column:
    """Uniform bucket 0..9999 from a stable content hash (cross-engine:
    plans/llm_queries.py generates the identical DuckDB expression)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(HASH_BUCKETS)
    )


def train_test_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Adds 'train' | 'val' | 'test' — disjoint, exhaustive,
    hash-deterministic. Changing the salt reshuffles the assignment
    without touching the data."""
    bucket = hash_bucket_expr(id_col, salt)
    train_hi = int(train_frac * HASH_BUCKETS)
    val_hi = train_hi + int(val_frac * HASH_BUCKETS)
    split = (
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, hash-deterministic. Because the hash
    is uniform PER ROW, applying this after a groupBy key yields a
    stratified sample: every stratum retains ~fraction of its rows
    regardless of stratum size (no per-stratum state needed)."""
    bucket = hash_bucket_expr(id_col, salt)
    return df.filter(bucket < int(fraction * HASH_BUCKETS))
