"""Data-skipping probe (round 10): does ``stats_cols`` +
``read_where`` actually shrink what Spark plans, and does the saving
grow with table size?

Setup: lineitem keyed by (orderkey, linenumber), bucketed by key hash,
``sorted_by=l_shipdate`` within each bucket with a row-per-file cap —
so every data file is a tight contiguous ship-date range (the layout a
date-partitioned 100 TB table has naturally).  Probe a ~1-month window
out of the ~7-year span three ways:

  full   — read().aggregate (the no-predicate control)
  filter — read().filter(pred): Spark still PLANS every file; parquet
           row-group stats only help after tasks launch
  skip   — read_where(pred): files pruned at manifest level, before
           the plan exists

The headline metric is planned files/bytes (df.inputFiles), with walls
alongside; at local[32] walls are floor-dominated (SCALE.md cdc probe)
but the footprint ratio is exactly what a 1000-executor cluster saves
in tasks scheduled + bytes opened.

Usage: python scripts/skipping_probe.py [sf ...]  (default 0.01 0.1)
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.operators.merge import (  # noqa: E402
    ParquetMergeTarget,
)

LO = datetime.datetime(1998, 6, 1)
HI = datetime.datetime(1998, 7, 1)
RUNS = 3


def best_of(fn) -> float:
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def footprint(df) -> tuple[int, int]:
    files = [
        f[len("file:"):] if f.startswith("file:") else f
        for f in df.inputFiles()
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def probe(spark, sf: str, work: str) -> dict:
    rows = (
        spark.read.parquet(f"/root/testdata/sf{sf}/lineitem.parquet")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_shipdate").cast("timestamp_ntz").alias("ship"),
            F.col("l_extendedprice").alias("price"),
        )
        .withColumn("createdon", F.lit(1).cast("long"))
    )
    t = ParquetMergeTarget(
        spark=spark,
        path=os.path.join(work, f"t{sf}"),
        num_buckets=16,
        stats_cols=("ship",),
        sorted_by=("ship",),
        max_records_per_file=4000,
    )
    t.merge(rows)

    pred_py = (("ship", ">=", LO), ("ship", "<", HI))
    pred_sql = (F.col("ship") >= F.lit(LO)) & (F.col("ship") < F.lit(HI))

    full_files, full_kb = footprint(t.read())
    skip_files, skip_kb = footprint(t.read_where(*pred_py))

    full_s = best_of(lambda: t.read().agg(F.sum("price")).collect())
    filt_s = best_of(
        lambda: t.read().filter(pred_sql).agg(F.sum("price")).collect()
    )
    skip_s = best_of(
        lambda: t.read_where(*pred_py).agg(F.sum("price")).collect()
    )
    n_match = t.read_where(*pred_py).count()
    n_filter = t.read().filter(pred_sql).count()
    assert n_match == n_filter, (n_match, n_filter)
    return {
        "sf": sf,
        "rows": int(rows.count()),
        "window_rows": n_match,
        "full_files": full_files,
        "full_kb": full_kb // 1024,
        "skip_files": skip_files,
        "skip_kb": skip_kb // 1024,
        "planned_frac": round(skip_kb / full_kb, 4),
        "full_s": round(full_s, 2),
        "filter_s": round(filt_s, 2),
        "skip_s": round(skip_s, 2),
    }


def main() -> int:
    sfs = sys.argv[1:] or ["0.01", "0.1"]
    spark = build_session(app_name="asp-skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="asp_skip_probe_")
    probe(spark, sfs[0], tempfile.mkdtemp(dir=work, prefix="warmup"))
    print("(warmup pass done)", flush=True)
    out = []
    for sf in sfs:
        r = probe(spark, sf, work)
        out.append(r)
        print(r, flush=True)
    last = out[-1]
    print(
        f"\nat sf{last['sf']}: the window holds "
        f"{last['window_rows']}/{last['rows']} rows "
        f"({100 * last['window_rows'] / last['rows']:.1f}%); read_where "
        f"plans {last['skip_files']}/{last['full_files']} files = "
        f"{100 * last['planned_frac']:.1f}% of the bytes; wall "
        f"full={last['full_s']}s filter={last['filter_s']}s "
        f"skip={last['skip_s']}s",
        flush=True,
    )
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
