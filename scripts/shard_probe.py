"""Sharded-manifest metadata-IO probe (r9 — VERDICT r8 item 1).

Forces a bucket-ranged sharded manifest on real sf0.1 lineitem (lower
``manifest_shard_entries``), then measures the three claims of the r9
shard-reuse design against instrumented shard-file IO:

1. **Commit reuse**: a narrow MoR trickle commit reads/writes only the
   shards whose bucket range intersects the batch — metadata IO per
   commit is O(touched shards), not O(table).  The no-reuse baseline
   (pre-r9 behavior: every commit rewrote every shard) equals the
   total shard byte count by construction, so the ratio is exact.
2. **Root-only polling**: ``maintenance_metrics`` reads zero shard
   files and still reports the EXACT coalescable small-file count
   (cross-checked here against a full shard read).
3. **O(debris) minor pass**: when the adaptive gate fires on
   small-file pressure, ``compact_minor`` reads only candidate shards
   (descriptor ``coal`` > 0 at the threshold class).

Usage: python scripts/shard_probe.py [sf_dir] [shard_entries]
(defaults: sf0.1, 400 — lower shard_entries for a finer shard grid)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.fsio import HadoopFileIO  # noqa: E402
from arcane_stream_parquet_spark.operators.merge import (  # noqa: E402
    ParquetMergeTarget,
)


class ShardIO:
    """Counts shard-file reads/writes (calls + bytes) through fsio."""

    def __init__(self) -> None:
        self.reads = 0
        self.read_bytes = 0
        self.writes = 0
        self.write_bytes = 0

    def install(self):
        import contextlib
        import unittest.mock as mock

        real_read, real_create = HadoopFileIO.read_text, HadoopFileIO.create_text
        me = self

        def read(self, path):
            text = real_read(self, path)
            if "-shard-" in path:
                me.reads += 1
                me.read_bytes += len(text)
            return text

        def create(self, path, text):
            if "-shard-" in path:
                me.writes += 1
                me.write_bytes += len(text)
            return real_create(self, path, text)

        stack = contextlib.ExitStack()
        stack.enter_context(mock.patch.object(HadoopFileIO, "read_text", read))
        stack.enter_context(
            mock.patch.object(HadoopFileIO, "create_text", create)
        )
        return stack

    def snap(self) -> tuple[int, int, int, int]:
        return (self.reads, self.read_bytes, self.writes, self.write_bytes)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shard_entries = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="asp-shard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_partkey"),
            F.col("l_quantity"),
            F.col("l_extendedprice"),
            F.col("l_returnflag"),
        )
        .withColumn("createdon", F.lit(1))
    )
    # latest-wins collapses duplicate keys: parity target is the
    # DISTINCT key count (synthetic lineitem repeats line numbers)
    n_rows = rows.select("arcane_merge_key").distinct().count()
    work = tempfile.mkdtemp(prefix="asp_shard_probe_")
    t = ParquetMergeTarget(
        spark=spark,
        path=os.path.join(work, "t"),
        num_buckets=64,
        max_records_per_file=300,
        manifest_shard_entries=shard_entries,  # forces sharding at this geometry
    )
    io = ShardIO()
    with io.install():
        t0 = time.perf_counter()
        t.merge(rows)
        backfill_s = time.perf_counter() - t0
        m = t._manifest()
        shards = m["file_shards"]
        total_shard_bytes = io.write_bytes
        print(
            f"base: {n_rows} keys -> {m['n_files']} files, "
            f"{len(shards)} shards ({total_shard_bytes / 1e6:.2f} MB shard "
            f"JSON), backfill {backfill_s:.1f} s",
            flush=True,
        )

        # -- claim 1: narrow trickle commits reuse untouched shards ---
        keys = [r[0] for r in rows.select("arcane_merge_key").head(30)]
        per_commit = []
        for i, k in enumerate(keys[:20]):
            batch = spark.createDataFrame(
                [(int(k), "upd", 2 + i)],
                "arcane_merge_key bigint, l_returnflag string, createdon int",
            )
            r0, rb0, w0, wb0 = io.snap()
            t.merge(batch, mode="mor")
            r1, rb1, w1, wb1 = io.snap()
            per_commit.append((r1 - r0, rb1 - rb0, w1 - w0, wb1 - wb0))
        n_shards_now = len(t._manifest()["file_shards"])
        avg = [sum(x[i] for x in per_commit) / len(per_commit) for i in range(4)]
        print(
            f"trickle x{len(per_commit)}: avg {avg[0]:.1f} shards read "
            f"({avg[1] / 1e6:.3f} MB), {avg[2]:.1f} shards written "
            f"({avg[3] / 1e6:.3f} MB) per commit — no-reuse baseline is "
            f"ALL {n_shards_now} shards ({total_shard_bytes / 1e6:.2f} MB) "
            f"per commit: {total_shard_bytes / max(avg[3], 1):.0f}x less "
            f"metadata written",
            flush=True,
        )

        # -- claim 2: metrics are root-only and exact -----------------
        r0, _, _, _ = io.snap()
        t0 = time.perf_counter()
        metrics = t.maintenance_metrics(small_file_bytes=1 << 20)
        metrics_s = time.perf_counter() - t0
        root_only = io.snap()[0] == r0
        files = t._files_of_manifest(t._manifest())
        k_class = t._size_class_at(1 << 20)
        per_bucket: dict = {}
        for f in files:
            if int(f["sz"]).bit_length() <= k_class:
                per_bucket[f["b"]] = per_bucket.get(f["b"], 0) + 1
        exact = sum(n for n in per_bucket.values() if n >= 2)
        print(
            f"metrics: {metrics_s * 1e3:.1f} ms, root-only={root_only}, "
            f"coalescable={metrics['coalescable_small_files']} "
            f"(full-read cross-check: {exact}, "
            f"match={metrics['coalescable_small_files'] == exact})",
            flush=True,
        )

        # -- claim 3: minor pass reads only candidate shards ----------
        shards_now = t._manifest()["file_shards"]
        cand = [
            s["n"]
            for s in shards_now
            if t._step_at(s["coal"], k_class) > 0
        ]
        r0, rb0, _, _ = io.snap()
        t0 = time.perf_counter()
        ran = t.run_adaptive_maintenance(
            small_file_bytes=1 << 20,
            on_small_files=2,
            on_delete_files=None,
            on_delete_bytes=None,
        )
        minor_s = time.perf_counter() - t0
        r1, rb1, _, _ = io.snap()
        after = t.maintenance_metrics(small_file_bytes=1 << 20)
        print(
            f"adaptive fire: ran={ran['ran']} escalated={ran['escalated']} "
            f"in {minor_s:.1f} s; read {r1 - r0} shard files "
            f"({(rb1 - rb0) / 1e6:.3f} MB) of {len(shards_now)} total "
            f"({len(cand)} candidates); coalescable "
            f"{metrics['coalescable_small_files']} -> "
            f"{after['coalescable_small_files']}",
            flush=True,
        )
        n_after = t.read().count()
        ok = n_after == n_rows
        print(
            f"row-count parity after maintenance: {ok} "
            f"({n_after} vs {n_rows})",
            flush=True,
        )
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
