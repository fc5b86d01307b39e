"""Round-17 merge/ingest profiler (guide §1: measure first).

Replicates bench.py's merge_throughput phases (backfill → CoW upsert →
MoR upsert) with per-method wall attribution: every phase-bounding
method of ParquetMergeTarget is wrapped with a timer, so the output
decomposes each commit's wall into write / stats read-back / prune /
manifest / residual (inline collects + plan build).

Usage: python scripts/r17_merge_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource
from arcane_stream_parquet_spark.streaming.runner import run_backfill

TIMES: dict[str, list[float]] = defaultdict(list)


def _wrap(cls, name):
    fn = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return fn(self, *a, **k)
        finally:
            TIMES[name].append(time.perf_counter() - t0)

    setattr(cls, name, timed)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32
    spark = build_session(app_name="asp-r17-merge-profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for m in (
        "_merge_cow",
        "_merge_mor",
        "_commit_initial",
        "_write_version",
        "_collect_file_stats",
        "_collect_delete_stats",
        "_prune_touched_files",
        "_commit_manifest",
        "_manifest",
        "_write_deletes",
        "_files_for_buckets",
        "_plan_batch_touch",
        "commit_watermark",
    ):
        _wrap(ParquetMergeTarget, m)

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="asp_r17_profile_")
    source = BlobParquetSource(
        path=os.path.join(sf_dir, "lineitem.parquet"),
        primary_keys=["l_orderkey", "l_linenumber"],
    )
    target = ParquetMergeTarget(
        spark=spark, path=os.path.join(work, "t"), num_buckets=64
    )
    n = source.read_batch(spark).count()

    def snap(label, t0):
        wall = time.perf_counter() - t0
        out = {k: [round(x, 3) for x in v] for k, v in sorted(TIMES.items())}
        print(json.dumps({"phase": label, "wall": round(wall, 2), "per_method": out}))
        TIMES.clear()

    t0 = time.perf_counter()
    run_backfill(spark, source, target, behavior="Merge")
    snap("backfill", t0)

    batch = (
        source.read_batch(spark)
        .filter(F.col("l_orderkey") % 10 == 0)
        .withColumn("createdon", F.col("createdon") + F.lit(1))
        .localCheckpoint(eager=True)
    )
    bn = batch.count()
    t0 = time.perf_counter()
    target.merge(batch)
    snap("cow_upsert", t0)

    batch_mor = batch.withColumn("createdon", F.col("createdon") + F.lit(1))
    t0 = time.perf_counter()
    target.merge(batch_mor, mode="mor")
    snap("mor_upsert", t0)

    print(json.dumps({"rows": n, "batch_rows": bn}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
