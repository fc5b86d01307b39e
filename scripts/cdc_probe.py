"""CDC / replication / view-maintenance O(delta) probe (round 10).

Claim under test: a changelog tick's cost tracks the DELTA, not the
table.  ``read_changes`` reads MoR commits from their own data+delete
files, ``replicate_incremental`` applies net changes with
bucket+key-range-pruned commits, and ``maintain_aggregate`` folds the
delta against ``lookup_keys``-pruned view rows — so the same trickle
workload must cost ~the same on a 6 k-row table and a 600 k-row table
(100×).  A full ``read()`` runs alongside as the control.  At local[32]
sub-second scans are fixed-overhead-dominated, so walls are expected
~flat everywhere; the decisive signal is the SCAN FOOTPRINT
(``df.inputFiles()`` count + bytes): the changelog slice must stay
O(trickle commits) while the control's bytes grow with the table.

Method: for each scale factor, backfill lineitem into a source target,
run 5 single-key MoR commits, then time (3 runs each, best-of):
changelog read of the 5-commit slice (with pre-images), one
replication tick applying it, one aggregate-maintenance tick, and the
full-table read control.

Usage: python scripts/cdc_probe.py [sf ...]   (default: 0.001 0.01 0.1)
"""

from __future__ import annotations

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
from arcane_stream_parquet_spark.streaming.changelog import (  # noqa: E402
    APPLIED_VERSION_COLUMN,
    maintain_aggregate,
    replicate_incremental,
)

N_TRICKLE = 5
RUNS = 3


def best_of(fn) -> float:
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def probe(spark, sf: str, work: str) -> dict:
    rows = (
        spark.read.parquet(f"/root/testdata/sf{sf}/lineitem.parquet")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_returnflag").alias("grp"),
            F.col("l_quantity").cast("long").alias("amount"),
        )
        .withColumn("createdon", F.lit(1).cast("long"))
    )
    src = ParquetMergeTarget(
        spark=spark, path=os.path.join(work, f"src{sf}"), num_buckets=64
    )
    t0 = time.perf_counter()
    src.merge(rows)
    build_s = time.perf_counter() - t0
    n_rows = src.read().count()
    keys = [
        int(r[0])
        for r in rows.select("arcane_merge_key").distinct().head(N_TRICKLE)
    ]
    base_v = src._manifest()["version"]
    for i, k in enumerate(keys):
        src.merge(
            spark.createDataFrame(
                [(k, "upd", 99 + i, 2 + i)],
                "arcane_merge_key bigint, grp string, amount bigint, "
                "createdon bigint",
            ),
            mode="mor",
        )
    head = src._manifest()["version"]

    changes_s = best_of(
        lambda: src.read_changes(
            base_v, head, include_preimages=True
        ).count()
    )

    def replicate_once():
        sub = tempfile.mkdtemp(dir=work, prefix="rep")
        dst = ParquetMergeTarget(
            spark=spark, path=os.path.join(sub, "dst"), num_buckets=64
        )
        # pre-seed the replica so the tick applies ONLY the trickle
        # slice (an empty replica's first tick is a full backfill)
        cur = os.path.join(sub, "cur")
        replicate_incremental(src, dst, cur, max_versions_per_poll=1)
        t0 = time.perf_counter()
        replicate_incremental(src, dst, cur)
        return time.perf_counter() - t0

    replicate_s = min(replicate_once() for _ in range(RUNS))

    def aggregate_once():
        sub = tempfile.mkdtemp(dir=work, prefix="agg")
        agg = ParquetMergeTarget(
            spark=spark,
            path=os.path.join(sub, "agg"),
            num_buckets=4,
            key_col="grp",
            version_col=APPLIED_VERSION_COLUMN,
        )
        cur = os.path.join(sub, "cur")
        maintain_aggregate(
            src, agg, cur, "grp", {"amount": "amount"},
            max_versions_per_poll=1,
        )
        t0 = time.perf_counter()
        maintain_aggregate(src, agg, cur, "grp", {"amount": "amount"})
        return time.perf_counter() - t0

    aggregate_s = min(aggregate_once() for _ in range(RUNS))

    # control MUST be data-bound: count() over parquet is answered from
    # footer metadata and stays flat, so aggregate a real column
    full_read_s = best_of(
        lambda: src.read().agg(F.sum("amount")).collect()
    )

    # Wall at local[32] is fixed-overhead-dominated for ANY sub-second
    # scan, so the decisive scale signal is what the plans READ: the
    # changelog slice must enumerate only the trickle commits' files
    # while the full read enumerates the whole table.
    def scan_footprint(df) -> tuple[int, int]:
        files = [f[len("file:"):] if f.startswith("file:") else f
                 for f in df.inputFiles()]
        return len(files), sum(os.path.getsize(f) for f in files)

    ch_files, ch_bytes = scan_footprint(
        src.read_changes(base_v, head)
    )
    # pre-images additionally read the touched keys' PRIOR bucket files
    # (bucket-pruned: ~touched/num_buckets of the table, not all of it)
    pre_files, pre_bytes = scan_footprint(
        src.read_changes(base_v, head, include_preimages=True)
    )
    full_files, full_bytes = scan_footprint(src.read())
    return {
        "sf": sf,
        "rows": n_rows,
        "build_s": round(build_s, 2),
        "changes_slice_s": round(changes_s, 2),
        "replicate_tick_s": round(replicate_s, 2),
        "aggregate_tick_s": round(aggregate_s, 2),
        "full_read_s": round(full_read_s, 2),
        "changes_files": ch_files,
        "changes_kb": ch_bytes // 1024,
        "preimage_files": pre_files,
        "preimage_kb": pre_bytes // 1024,
        "full_files": full_files,
        "full_kb": full_bytes // 1024,
    }


def main() -> int:
    sfs = sys.argv[1:] or ["0.001", "0.01", "0.1"]
    spark = build_session(app_name="asp-cdc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="asp_cdc_probe_")
    # untimed warmup pass: the first probe otherwise absorbs all the
    # one-time JVM/JIT/Arrow init and poisons the cross-sf ratios
    probe(spark, sfs[0], tempfile.mkdtemp(dir=work, prefix="warmup"))
    print("(warmup pass done)", flush=True)
    out = []
    for sf in sfs:
        r = probe(spark, sf, work)
        out.append(r)
        print(r, flush=True)
    first, last = out[0], out[-1]
    growth = last["rows"] / first["rows"]

    def ratio(k):
        return last[k] / first[k] if first[k] else float("inf")

    print(
        f"\ntable grew {growth:.0f}x ({first['rows']} -> {last['rows']} "
        f"rows); same {N_TRICKLE}-commit trickle slice:\n"
        f"  changelog read   {ratio('changes_slice_s'):.2f}x wall, "
        f"{ratio('changes_kb'):.2f}x bytes scanned "
        f"(+preimages: {ratio('preimage_kb'):.2f}x, bucket-pruned)\n"
        f"  replication tick {ratio('replicate_tick_s'):.2f}x wall\n"
        f"  aggregate tick   {ratio('aggregate_tick_s'):.2f}x wall\n"
        f"  full read (control, bytes MUST grow) "
        f"{ratio('full_read_s'):.2f}x wall, "
        f"{ratio('full_kb'):.2f}x bytes scanned",
        flush=True,
    )
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
