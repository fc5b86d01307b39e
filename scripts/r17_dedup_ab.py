"""A/B the r17 dedup_strategy ("sort" fused window vs "agg" max_by) on
the bench's exact merge shapes, alternating in ONE process so box drift
hits both arms equally.

Usage: python scripts/r17_dedup_ab.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32
    spark = build_session(app_name="asp-r17-dedup-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    source = BlobParquetSource(
        path=os.path.join(sf_dir, "lineitem.parquet"),
        primary_keys=["l_orderkey", "l_linenumber"],
    )
    base = source.read_batch(spark)
    batch = (
        base.filter(F.col("l_orderkey") % 10 == 0)
        .withColumn("createdon", F.col("createdon") + F.lit(1))
        .localCheckpoint(eager=True)
    )
    times: dict[str, list[float]] = defaultdict(list)
    for rep in range(reps):
        for strat in ("sort", "agg"):
            work = tempfile.mkdtemp(prefix=f"asp_ab_{strat}_")
            t = ParquetMergeTarget(
                spark=spark,
                path=os.path.join(work, "t"),
                num_buckets=64,
                dedup_strategy=strat,
            )
            spark.sparkContext.setJobDescription(f"backfill:{strat}:{rep}")
            t0 = time.perf_counter()
            t.merge(base)
            times[f"backfill_{strat}"].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"cow:{strat}:{rep}")
            t0 = time.perf_counter()
            t.merge(batch)
            times[f"cow_{strat}"].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            shutil.rmtree(work, ignore_errors=True)
    out = {
        k: {
            "best": round(min(v), 3),
            "med": round(sorted(v)[len(v) // 2], 3),
            "all": [round(x, 2) for x in v],
        }
        for k, v in sorted(times.items())
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
