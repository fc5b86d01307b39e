"""Merge-path scale probe (r6 — VERDICT r5 items 1 & 7): backfill +
narrow upserts at 1x and 4x sf0.1 lineitem, copy-on-write vs
merge-on-read, with per-commit bytes written.

Replicates lineitem with key offsets for the 4x geometry (~2.4M rows,
~1,000 data files at maxRecordsPerFile=2000 / 64 buckets), then for
each (scale, batch-size, mode) snapshot-copies the committed base table
and measures one upsert: wall time and bytes the commit wrote (new data
version dir + delete dir).  Done-criteria being checked:

- MoR: a 0.01%-key upsert commits in O(batch) — bytes written must be
  far below the CoW touched-file floor (8.0 MB at 1x, r5 table).
- 4x: rewrite bytes track the touched-file floor (not table size) and
  backfill/stats-readback stay ~linear in data size.

Usage: python scripts/merge_probe.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.operators.merge import (  # noqa: E402
    ParquetMergeTarget,
)
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource  # noqa: E402


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def commit_bytes(table_path: str, version: int) -> int:
    total = 0
    for sub in ("data", "deletes"):
        d = os.path.join(table_path, sub, f"v{version:05d}")
        if os.path.isdir(d):
            total += dir_bytes(d)
    return total


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="merge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="asp_merge_probe_")

    source = BlobParquetSource(
        path=os.path.join(sf_dir, "lineitem.parquet"),
        primary_keys=["l_orderkey", "l_linenumber"],
    )
    base_rows = source.read_batch(spark)
    max_ok = base_rows.agg(F.max("l_orderkey")).collect()[0][0]

    def replicated(times: int):
        parts = []
        for i in range(times):
            parts.append(
                base_rows.withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.lit(i * (max_ok + 1)),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # re-derive the merge key for the offset copies
        from arcane_stream_parquet_spark.functions.keys import (
            with_merge_key,
        )

        return with_merge_key(
            out.drop("arcane_merge_key"), ["l_orderkey", "l_linenumber"]
        )

    results = []
    for scale in (1, 4):
        rows = replicated(scale)
        n = rows.count()
        base_path = os.path.join(work, f"base{scale}x")
        target = ParquetMergeTarget(
            spark=spark,
            path=base_path,
            num_buckets=64,
            max_records_per_file=2000,
        )
        t0 = time.perf_counter()
        target.merge(rows)
        backfill = time.perf_counter() - t0
        manifest = target._manifest()
        n_files = len(target._files_of_manifest(manifest))
        table_mb = dir_bytes(base_path) / 1e6
        print(
            f"[{scale}x] backfill {n} rows in {backfill:.1f} s "
            f"({n / backfill:,.0f} rows/s), {n_files} files, "
            f"{table_mb:.1f} MB table", flush=True
        )

        for frac_label, modulus in (("0.01%", 10000), ("0.1%", 1000)):
            batch = rows.filter(
                F.xxhash64("arcane_merge_key") % modulus == 0
            ).withColumn("createdon", F.col("createdon") + F.lit(1))
            bn = batch.count()
            for mode in ("cow", "mor"):
                path = os.path.join(work, f"t{scale}x_{frac_label}_{mode}")
                shutil.copytree(base_path, path)
                t = ParquetMergeTarget(
                    spark=spark,
                    path=path,
                    num_buckets=64,
                    max_records_per_file=2000,
                )
                t0 = time.perf_counter()
                t.merge(batch, mode=mode)
                wall = time.perf_counter() - t0
                v = t._manifest()["version"]
                mb = commit_bytes(path, v) / 1e6
                results.append(
                    (scale, frac_label, bn, mode, mb, wall)
                )
                print(
                    f"[{scale}x] upsert {frac_label} ({bn} keys) "
                    f"{mode}: {mb:.2f} MB written, {wall:.2f} s", flush=True
                )
                shutil.rmtree(path)

    print("\n| scale | batch | mode | bytes written | wall |")
    print("|---|---|---|---|---|")
    for scale, frac, bn, mode, mb, wall in results:
        print(
            f"| {scale}x | {frac} ({bn} keys) | {mode} "
            f"| {mb:.2f} MB | {wall:.2f} s |"
        )

    # MoR accumulation: 10 sequential 0.01% upserts on the 1x table,
    # then the read-side anti-join cost and the compact() fold-in —
    # the bounded-deletes story the read path depends on
    rows = replicated(1)
    path = os.path.join(work, "t_chain")
    shutil.copytree(os.path.join(work, "base1x"), path)
    t = ParquetMergeTarget(
        spark=spark, path=path, num_buckets=64, max_records_per_file=2000
    )
    t0 = time.perf_counter()
    clean_read = t.read().count()
    clean_wall = time.perf_counter() - t0
    total_mb = 0.0
    t0 = time.perf_counter()
    for i in range(10):
        batch = rows.filter(
            F.xxhash64("arcane_merge_key", F.lit(i)) % 10000 == 0
        ).withColumn("createdon", F.col("createdon") + F.lit(1))
        t.merge(batch, mode="mor")
        total_mb += commit_bytes(path, t._manifest()["version"]) / 1e6
    chain_wall = time.perf_counter() - t0
    n_del = len(t._manifest().get("deletes", []))
    t0 = time.perf_counter()
    dirty_read = t.read().count()
    dirty_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    t.compact()
    compact_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    folded_read = t.read().count()
    folded_wall = time.perf_counter() - t0
    assert clean_read == dirty_read == folded_read
    print(
        f"\nMoR chain (1x): 10 commits {chain_wall:.1f} s, "
        f"{total_mb:.2f} MB total, {n_del} delete entries; read "
        f"clean {clean_wall:.2f} s -> with deletes {dirty_wall:.2f} s "
        f"-> compact {compact_wall:.1f} s -> folded read "
        f"{folded_wall:.2f} s ({folded_read} rows all along)",
        flush=True,
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
