"""Z-order probe (round 10): does ``cluster_by`` buy file skipping on
a SECOND predicate column that ``sorted_by`` structurally cannot?

Setup: lineitem keyed by (orderkey, linenumber), 16 buckets, 4 k
rows/file — two layouts of the SAME rows:

  lex — sorted_by=(ship,): each file a tight ship-date range, price
        unordered inside → price predicates can never prune
  zed — cluster_by=(ship, price): Morton layout, every file bounded
        in BOTH dims

Probed with three windows via read_where (planned files/bytes from
df.inputFiles — the task/IO footprint a real cluster saves):

  ship-only (1 month), price-only (a ~10% band), ship AND price

Usage: python scripts/zorder_probe.py [sf]   (default 0.1)
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.operators.merge import (  # noqa: E402
    ParquetMergeTarget,
)

LO = datetime.datetime(1998, 6, 1)
HI = datetime.datetime(1998, 7, 1)
PLO, PHI = 10_000.0, 20_000.0

WINDOWS = {
    "ship": (("ship", ">=", LO), ("ship", "<", HI)),
    "price": (("price", ">=", PLO), ("price", "<", PHI)),
    "both": (
        ("ship", ">=", LO),
        ("ship", "<", HI),
        ("price", ">=", PLO),
        ("price", "<", PHI),
    ),
}


def footprint(df) -> tuple[int, int]:
    files = [
        f[len("file:"):] if f.startswith("file:") else f
        for f in df.inputFiles()
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def build(spark, sf: str, work: str, **kw) -> ParquetMergeTarget:
    rows = (
        spark.read.parquet(f"/root/testdata/sf{sf}/lineitem.parquet")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_shipdate").cast("timestamp_ntz").alias("ship"),
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        .withColumn("createdon", F.lit(1).cast("long"))
    )
    t = ParquetMergeTarget(
        spark=spark,
        path=os.path.join(work, kw.pop("name")),
        **kw,
    )
    t.merge(rows)
    return t


def run_geometry(spark, sf: str, work: str, buckets: int, cap: int) -> None:
    lex = build(
        spark, sf, work, name=f"lex{buckets}x{cap}", sorted_by=("ship",),
        stats_cols=("ship", "price"), num_buckets=buckets,
        max_records_per_file=cap,
    )
    zed = build(
        spark, sf, work, name=f"zed{buckets}x{cap}",
        cluster_by=("ship", "price"), num_buckets=buckets,
        max_records_per_file=cap,
    )
    lex_files, lex_kb = footprint(lex.read())
    zed_files, zed_kb = footprint(zed.read())
    print(
        f"\nsf{sf} buckets={buckets} cap={cap}: "
        f"{lex_files} files (~{lex_files // buckets}/bucket)"
    )
    for wname, preds in WINDOWS.items():
        lf, lkb = footprint(lex.read_where(*preds))
        zf, zkb = footprint(zed.read_where(*preds))
        nl = lex.read_where(*preds).count()
        nz = zed.read_where(*preds).count()
        assert nl == nz, (wname, nl, nz)
        print(
            f"{wname:6s} rows={nz:7d}  lex: {lf:4d} files"
            f" {100 * lkb / lex_kb:5.1f}%   zed: {zf:4d} files"
            f" {100 * zkb / zed_kb:5.1f}%",
            flush=True,
        )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    spark = build_session(app_name="asp-zorder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="asp_zorder_probe_")
    # 8 files/bucket (coarse z-resolution) vs 150 files/bucket (the
    # shape of a real table, where each file pins ~log2(150)/2 bits
    # per dim) — z-order pruning sharpens as the file count grows
    run_geometry(spark, sf, work, buckets=16, cap=4000)
    run_geometry(spark, sf, work, buckets=4, cap=1000)
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
