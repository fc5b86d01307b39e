"""Online-rebucketing probe (r11): measures the three scale claims of
``ParquetMergeTarget.rebucket`` on real sf0.1 lineitem geometry.

1. **Unit-local staging IO**: each ``rebucket(max_units=1)`` pass
   scans and writes O(one unit)'s bytes — the per-pass data IO is
   ~1/units of the table, so a 100 TB migration runs in bounded slices.
2. **Interleaved-write invalidation is surgical**: a narrow merge
   landing mid-migration restages ONLY the unit whose source
   fingerprint changed; every other staged unit's files are reused
   verbatim in the flip.
3. **The split actually buys what it promises**: after refining the
   bucket count 8x, the largest single-bucket maintenance unit (what
   one compact task rewrites) shrinks ~8x, and contents are
   bit-identical (xor of full-row hashes).

Usage: python scripts/rebucket_probe.py [sf_dir] [factor]
(defaults: /root/testdata/sf0.1, 8)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget


def table_bytes(t):
    m = t._manifest()
    files = t._files_of_manifest(m)
    return sum(int(f["sz"]) for f in files), len(files)


def staged_bytes(t):
    """Bytes + file count currently sitting in marker-referenced
    staging dirs (walks the staging dirs only)."""
    import json

    from arcane_stream_parquet_spark.fsio import fs_join

    total, nf = 0, 0
    for name in t._rebucket_marker_names():
        mk = json.loads(t._fio.read_text(fs_join(t._meta_path, name)))
        for e in mk["files"]:
            total += int(e["sz"])
            nf += 1
    return total, nf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .appName("rebucket-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            F.concat_ws(
                "-", F.col("l_orderkey"), F.col("l_linenumber")
            ).alias("arcane_merge_key"),
            F.col("l_partkey").cast("long").alias("createdon"),
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
        )
    )
    n0 = 8
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetMergeTarget(
            spark=spark,
            path=os.path.join(tmp, "t"),
            num_buckets=n0,
            max_records_per_file=40_000,
        )
        t.merge(li)
        tb, nf = table_bytes(t)
        rows = t.read().count()
        print(
            f"table: {rows} rows, {nf} files, {tb/1e6:.1f} MB, "
            f"{n0} -> {n0*factor} buckets ({n0} units)"
        )
        probe_key = li.select("arcane_merge_key").first()[0]
        files_lookup_before = len(t.lookup([probe_key]).inputFiles())
        # the unit of single-task maintenance work (compact rewrites a
        # bucket at a time): its max size is what a refinement divides
        by_bucket: dict[int, int] = {}
        for f in t._files_of_manifest(t._manifest()):
            by_bucket[int(f["b"])] = by_bucket.get(int(f["b"]), 0) + int(f["sz"])
        max_bucket_before = max(by_bucket.values())
        # a key that lands in unit 0 — staged FIRST below, so the
        # interleaved merge provably invalidates an already-staged unit
        bump_key = (
            li.filter(
                F.pmod(F.xxhash64("arcane_merge_key"), F.lit(n0)) == 0
            )
            .select("arcane_merge_key")
            .first()[0]
        )

        # claim 1: per-pass staging IO is O(unit)
        nb = n0 * factor
        per_pass = []
        for i in range(n0 - 1):
            s0, _ = staged_bytes(t)
            w0 = time.monotonic()
            res = t.rebucket(nb, max_units=1)
            w1 = time.monotonic()
            s1, _ = staged_bytes(t)
            per_pass.append((s1 - s0, w1 - w0))
            assert not res["done"]
        for io, w in per_pass:
            print(
                f"  staging pass: {io/1e6:6.1f} MB written "
                f"({io/tb*100:4.1f}% of table) in {w:4.1f}s"
            )
        frac = max(io for io, _ in per_pass) / tb
        print(
            f"claim 1 (unit-local staging): max pass wrote "
            f"{frac*100:.1f}% of table bytes (ideal {100/n0:.1f}%) -> "
            f"{'OK' if frac < 2.5 / n0 else 'VIOLATED'}"
        )

        # claim 2: a narrow interleaved merge restages exactly one unit
        import json as _json

        from arcane_stream_parquet_spark.fsio import fs_join

        dirs_before = {
            _json.loads(t._fio.read_text(fs_join(t._meta_path, n)))["u"]:
            _json.loads(t._fio.read_text(fs_join(t._meta_path, n)))["d"]
            for n in t._rebucket_marker_names()
        }
        bump = (
            li.filter(F.col("arcane_merge_key") == bump_key)
            .limit(1)
            .withColumn("createdon", F.lit(10**12).cast("long"))
        )
        t.merge(bump, mode="mor")
        # expected contents = the post-merge pre-flip table (the flip
        # itself must not change a single visible row)
        pre = t.read()
        want_hash = pre.select(
            F.expr("bit_xor(xxhash64(struct(*)))").alias("h")
        ).collect()[0]["h"]
        w0 = time.monotonic()
        res = t.rebucket(nb)  # stages the last unit + any invalidated
        w1 = time.monotonic()
        assert res["done"]
        restaged = res["staged"]
        m = t._manifest()
        dirs_after = {f["d"] for f in t._files_of_manifest(m)}
        reused = sum(1 for d in dirs_before.values() if d in dirs_after)
        print(
            f"claim 2 (surgical invalidation): flip pass staged "
            f"{restaged} unit(s) (1 pending + 1 invalidated) in {w1-w0:.1f}s; "
            f"{reused}/{len(dirs_before)} previously staged units reused "
            f"verbatim -> {'OK' if restaged == 2 and reused == len(dirs_before) - 1 else 'VIOLATED'}"
        )

        # claim 3: identity + lookup pruning
        after = t.read()
        after_hash = after.select(
            F.expr("bit_xor(xxhash64(struct(*)))").alias("h")
        ).collect()[0]["h"]
        files_lookup_after = len(t.lookup([probe_key]).inputFiles())
        ident = want_hash == after_hash and after.count() == rows
        by_bucket_after: dict[int, int] = {}
        for f in t._files_of_manifest(t._manifest()):
            by_bucket_after[int(f["b"])] = by_bucket_after.get(
                int(f["b"]), 0
            ) + int(f["sz"])
        max_bucket_after = max(by_bucket_after.values())
        print(
            f"claim 3: contents identical={ident} "
            f"(xor row-hash over {rows} rows); max single-bucket "
            f"maintenance unit {max_bucket_before/1e6:.2f} MB -> "
            f"{max_bucket_after/1e6:.2f} MB "
            f"({max_bucket_before/max_bucket_after:.1f}x smaller, ideal "
            f"{factor}x); point-lookup candidate files "
            f"{files_lookup_before} -> {files_lookup_after} (already "
            f"1-file-tight via key-sorted stats at either count)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
