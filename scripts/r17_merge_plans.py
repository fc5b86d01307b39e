"""Dump .explain("formatted") for the merge write plans under both
dedup strategies (r17 evidence: the fused sort-dedup write removes the
groupBy(key) exchange from CoW/initial version writes).

Usage: python scripts/r17_merge_plans.py [out_dir] [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.merge import (
    ParquetMergeTarget,
    _PRECEDENCE_COL,
    merge_latest_wins,
)
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r17"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="asp-r17-merge-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    source = BlobParquetSource(
        path=os.path.join(sf_dir, "lineitem.parquet"),
        primary_keys=["l_orderkey", "l_linenumber"],
    )
    base = source.read_batch(spark)
    work = tempfile.mkdtemp(prefix="asp_r17_plans_")

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "written")

    # BEFORE (dedup_strategy="agg"): groupBy(key) max_by, then the
    # writer's repartition(bucket)+sort — two exchanges.
    t_agg = ParquetMergeTarget(
        spark=spark, path=os.path.join(work, "agg"), num_buckets=64,
        dedup_strategy="agg",
    )
    bucketed = t_agg._with_bucket(t_agg._dedup_latest(base))
    dump(
        "merge_initial_write_before.txt",
        bucketed.repartition(F.col("__bucket")).sortWithinPartitions(
            "__bucket", F.col(t_agg.key_col).cast("string")
        ),
    )

    # AFTER (dedup_strategy="sort"): the fused lag-window dedup riding
    # the write's single bucket exchange + sort.
    t_sort = ParquetMergeTarget(
        spark=spark, path=os.path.join(work, "sort"), num_buckets=64,
        dedup_strategy="sort",
    )
    from pyspark.sql import Window

    unioned = t_sort._with_bucket(base)
    ordering = [t_sort.version_col]
    ord_struct = F.struct(*[F.col(c) for c in ordering])
    w = Window.partitionBy(F.col("__bucket")).orderBy(
        F.col(t_sort.key_col).cast("string").asc(),
        F.col(t_sort.key_col).asc(),
        ord_struct.desc(),
    )
    prev = F.lag(F.struct(F.col(t_sort.key_col).alias("k"))).over(w)
    deduped = (
        unioned.select("*", prev.alias("__asp_prev"))
        .filter(
            F.col("__asp_prev").isNull()
            | ~F.col("__asp_prev")["k"].eqNullSafe(F.col(t_sort.key_col))
        )
        .select(*unioned.columns)
    )
    dump("merge_initial_write_after.txt", deduped)

    # CoW upsert shape (existing ∪ batch), both strategies
    t_agg.merge(base)
    batch = (
        base.filter(F.col("l_orderkey") % 10 == 0)
        .withColumn("createdon", F.col("createdon") + F.lit(1))
        .localCheckpoint(eager=True)
    )
    manifest = t_agg._manifest()
    buckets, region, keep, touched, kept = t_agg._plan_batch_touch(
        manifest, t_agg._with_bucket(batch)
    )
    schema = t_agg._schema_of(manifest)
    existing = t_agg._scan_with_deletes(touched, schema, [])
    ex, bl = t_agg._reconcile_schema(existing, t_agg._with_bucket(batch))
    merged = merge_latest_wins(ex, bl, t_agg.key_col, t_agg.version_col)
    dump(
        "merge_cow_write_before.txt",
        merged.repartition(F.col("__bucket")).sortWithinPartitions(
            "__bucket", F.col(t_agg.key_col).cast("string")
        ),
    )
    unioned2 = ex.withColumn(_PRECEDENCE_COL, F.lit(0)).unionByName(
        bl.withColumn(_PRECEDENCE_COL, F.lit(1))
    )
    ow = Window.partitionBy(F.col("__bucket")).orderBy(
        F.col(t_agg.key_col).cast("string").asc(),
        F.col(t_agg.key_col).asc(),
        F.struct(F.col(t_agg.version_col), F.col(_PRECEDENCE_COL)).desc(),
    )
    prev2 = F.lag(F.struct(F.col(t_agg.key_col).alias("k"))).over(ow)
    deduped2 = (
        unioned2.select("*", prev2.alias("__asp_prev"))
        .filter(
            F.col("__asp_prev").isNull()
            | ~F.col("__asp_prev")["k"].eqNullSafe(F.col(t_agg.key_col))
        )
        .select(*[c for c in unioned2.columns if c != _PRECEDENCE_COL])
    )
    dump("merge_cow_write_after.txt", deduped2)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
