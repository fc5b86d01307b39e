"""Manifest-bloom point-lookup probe at sf0.1 (SCALE.md evidence).

Builds the count_where_pruned scratch shape — orders clustered by
order_day, bloom on the unsorted o_custkey — twice (with and without
manifest_bloom_cols) and measures, for a present and an absent point
probe: files planned, wall for read_where().count(), plus the
manifest-size overhead the filters cost.

Run: python scripts/bloom_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.session import build_session


def build(spark, orders, path, bloom: bool) -> ParquetMergeTarget:
    n = orders.count()
    t = ParquetMergeTarget(
        spark=spark,
        path=path,
        num_buckets=2,
        cluster_by=("order_day",),
        stats_cols=("o_totalprice",),
        manifest_bloom_cols=("o_custkey",) if bloom else (),
        manifest_bloom_bits=1 << 17,
        max_records_per_file=max(40, n // 40),
    )
    t0 = time.perf_counter()
    t.merge(orders)
    return t, time.perf_counter() - t0


def probe(t, key) -> dict:
    t0 = time.perf_counter()
    df = t.read_where(("o_custkey", "=", key))
    files = len(df.inputFiles())
    cnt = df.count()
    return {
        "files_planned": files,
        "rows": cnt,
        "wall_s": round(time.perf_counter() - t0, 3),
    }


def meta_bytes(t) -> int:
    import os

    total = 0
    for root, _, names in os.walk(t.path + "/_asp_meta"):
        total += sum(os.path.getsize(os.path.join(root, n)) for n in names)
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="bloom-probe", cpus=32, shuffle_partitions=32)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("arcane_merge_key"),
        F.lit(1).cast("long").alias("createdon"),
        F.unix_date(F.to_date("o_orderdate")).cast("int").alias("order_day"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
    )
    present = int(orders.agg(F.min("o_custkey")).first()[0])
    base = tempfile.mkdtemp(prefix="bloom_probe_")
    out: dict = {"sf_dir": sf_dir, "n_rows": orders.count()}
    try:
        for bloom in (False, True):
            t, merge_s = build(spark, orders, f"{base}/{bloom}", bloom)
            total_files = len(
                t._files_of_manifest(t._manifest()) or []
            )
            out[f"bloom={bloom}"] = {
                "merge_s": round(merge_s, 2),
                "total_files": total_files,
                "meta_bytes": meta_bytes(t),
                "present_key": probe(t, present),
                "absent_key": probe(t, -1),
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
